"""Differentiability tests: AD vs finite differences (the north-star gate),
inverse-rendering recovery, and distributed-grad equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpuspectral_tpu.diff.gradcheck import check_gradients, _loss_and_grad
from gpuspectral_tpu.utils import RenderConfig


def test_ad_matches_finite_differences(cornell_scene):
    cfg = RenderConfig(width=16, height=16, spp=8, max_depth=2, ray_batch=256)
    ok, report = check_gradients(cornell_scene, cfg, rtol=0.08, atol=1e-4)
    assert report["checked"] >= 4
    bad = [r for r in report["entries"] if not r["ok"]]
    assert ok, f"grad mismatches: {bad}"


def test_gradients_finite_all_depths(cornell_scene):
    for depth in (0, 3):
        cfg = RenderConfig(width=8, height=8, spp=2, max_depth=depth, ray_batch=64)
        target = jnp.zeros((64, 3))
        loss, g = _loss_and_grad(
            cornell_scene, cfg, cornell_scene.bsdf_params, target
        )
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(g)).all()


def test_inverse_rendering_recovers_albedo(cornell_scene):
    """Gradient descent on the white-wall albedo from a rendered target."""
    cfg = RenderConfig(width=16, height=16, spp=8, max_depth=2, ray_batch=256)
    true_params = cornell_scene.bsdf_params
    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)

    from gpuspectral_tpu.integrator.path_tracer import render_sample

    def render(p):
        sc = cornell_scene.replace(bsdf_params=p)

        def body(acc, s):
            rad, _ = render_sample(sc, cfg, pix, s, differentiable=False)
            return acc + rad, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((n_pixels, 3), jnp.float32), jnp.arange(cfg.spp, dtype=jnp.uint32)
        )
        return acc / cfg.spp

    target = render(true_params)

    # perturb the White material row (row 2: floor/ceiling/back/boxes share it
    # -> actually each shape added its own row; perturb them all)
    p0 = np.asarray(true_params).copy()
    diffuse_rows = np.asarray(cornell_scene.bsdf_kind) == 0
    p0[diffuse_rows, 0:3] = np.clip(p0[diffuse_rows, 0:3] + 0.2, 0.05, 0.95)
    params = jnp.asarray(p0)

    import optax

    opt = optax.adam(0.02)
    opt_state = opt.init(params)
    losses = []
    for step in range(40):
        loss, g = _loss_and_grad(cornell_scene, cfg, params, target)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.15, losses[::8]
    # recovered albedo close to truth for the dominant (white) materials
    rec = np.asarray(params)[2, 0:3]
    true = np.asarray(true_params)[2, 0:3]
    np.testing.assert_allclose(rec, true, atol=0.08)


def test_sharded_grad_matches_single_device(cornell_scene):
    """1-device vs 8-device grad_step_sharded must agree (determinism +
    correct psum accounting)."""
    from gpuspectral_tpu.parallel import grad_step_sharded, make_mesh

    cfg = RenderConfig(width=16, height=8, spp=4, max_depth=2, ray_batch=128)
    target = jnp.zeros((8, 16, 3))
    mesh1 = make_mesh(1, spp_shards=1)
    mesh8 = make_mesh(8, spp_shards=2)
    l1, g1 = grad_step_sharded(cornell_scene, cfg, mesh1, target)
    l8, g8 = grad_step_sharded(cornell_scene, cfg, mesh8, target)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g8), rtol=2e-3, atol=1e-6)
