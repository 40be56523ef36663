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

def test_emission_ad_matches_finite_differences(cornell_scene):
    """North star: gradients w.r.t. *emitter* parameters (light radiance)
    must allclose finite differences (VERDICT r1 item 5)."""
    from gpuspectral_tpu.diff.gradcheck import check_emission_gradients

    cfg = RenderConfig(width=16, height=16, spp=8, max_depth=2, ray_batch=256)
    ok, report = check_emission_gradients(cornell_scene, cfg, rtol=0.08)
    assert report["checked"] >= 3
    bad = [r for r in report["entries"] if not r["ok"]]
    assert ok, f"emission grad mismatches: {bad}"


def test_invert_stays_in_domain(cornell_scene):
    """The sigmoid reparameterization keeps colors in [0,1] and alphas in
    [1e-3, 1.5] at every step (docstring contract, VERDICT r1 item 8)."""
    from gpuspectral_tpu.diff.invert import invert, optimizable_mask, param_bounds

    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=2, ray_batch=64)
    # adversarial target (all black, huge lr): unconstrained steps would
    # overshoot far outside the physical domain
    target = np.zeros((8, 8, 3), np.float32)
    params, history = invert(cornell_scene, target, cfg, steps=6, lr=1.0)
    kinds = np.asarray(cornell_scene.bsdf_kind)
    mask = optimizable_mask(kinds)
    lo, hi = param_bounds(kinds)
    p = np.asarray(params)
    assert np.all(p[mask] >= lo[mask] - 1e-6)
    assert np.all(p[mask] <= hi[mask] + 1e-6)
    # non-optimizable entries (IORs etc.) must be untouched
    np.testing.assert_array_equal(
        p[~mask], np.asarray(cornell_scene.bsdf_params)[~mask]
    )


def test_invert_recovers_light_radiance(cornell_scene):
    """Optimizing emitter radiance from a rendered target recovers the true
    light brightness (VERDICT r1 item 5)."""
    from gpuspectral_tpu.diff.invert import invert

    cfg = RenderConfig(width=16, height=16, spp=8, max_depth=2, ray_batch=256)
    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)

    from gpuspectral_tpu.integrator.path_tracer import render_sample

    def render(sc):
        def body(acc, s):
            rad, _ = render_sample(sc, cfg, pix, s, differentiable=False)
            return acc + rad, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((n_pixels, 3), jnp.float32),
            jnp.arange(cfg.spp, dtype=jnp.uint32),
        )
        return (acc / cfg.spp).reshape(cfg.height, cfg.width, 3)

    target = render(cornell_scene)
    true_emit = np.asarray(cornell_scene.light_emission)
    # start at 40% brightness
    init = jnp.asarray(np.maximum(true_emit * 0.4, 1e-4))
    # common random numbers (timestamp0=0 matches the target's sample set,
    # resample=False): the loss is deterministic with an exact zero at truth
    (params, emit), history = invert(
        cornell_scene, target, cfg, steps=80, lr=0.3,
        optimize_emission=True, init_emission=init, optimize_bsdf=False,
        timestamp0=0, resample=False,
    )
    assert history[-1] < history[0] * 0.05, history[::8]
    emit = np.asarray(emit)
    lit = true_emit.sum(-1) > 0
    np.testing.assert_allclose(emit[lit], true_emit[lit], rtol=0.15)
