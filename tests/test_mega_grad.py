"""Path-replay backward kernel (integrator/mega_grad.py) vs XLA autodiff
and finite differences, interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpuspectral_tpu.integrator.mega_grad import (
    mega_grad_eligible,
    render_mega_diff,
)
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils import RenderConfig


@pytest.fixture(scope="module")
def cornell_scene():
    scene, _ = load_mitsuba_scene("scenes/cornell/scene.xml")
    return scene


def _cfg(**kw):
    kw.setdefault("width", 24)
    kw.setdefault("height", 24)
    kw.setdefault("spp", 2)
    kw.setdefault("max_depth", 3)
    kw.setdefault("ray_batch", 576)
    return RenderConfig(**kw)


def _loss_xla(scene, cfg, bp, te, le):
    from gpuspectral_tpu.integrator.path_tracer import render_sample

    sc = scene.replace(bsdf_params=bp, tri_emission=te, light_emission=le)
    n = cfg.width * cfg.height
    pix = jnp.arange(n, dtype=jnp.uint32)
    acc = jnp.zeros((n, 3), jnp.float32)
    for s in range(cfg.spp):
        rad, _ = render_sample(sc, cfg.replace(spp=1), pix,
                               jnp.uint32(s), differentiable=True)
        acc = acc + rad
    img = acc / cfg.spp
    return jnp.sum(img * jnp.arange(3.0))  # asymmetric channel weighting


def _loss_mega(scene, cfg, bp, te, le):
    sc = scene.replace(bsdf_params=bp, tri_emission=te, light_emission=le)
    img = render_mega_diff(sc, cfg, 0, interpret=True)
    return jnp.sum(img * jnp.arange(3.0))


def test_eligible(cornell_scene):
    assert mega_grad_eligible(cornell_scene, _cfg())
    assert not mega_grad_eligible(cornell_scene, _cfg(max_depth=20))


def test_forward_value_matches(cornell_scene):
    cfg = _cfg()
    bp, te, le = (cornell_scene.bsdf_params, cornell_scene.tri_emission,
                  cornell_scene.light_emission)
    a = float(_loss_mega(cornell_scene, cfg, bp, te, le))
    from gpuspectral_tpu.integrator.mega import render_mega

    b = float(jnp.sum(render_mega(cornell_scene, cfg, 0, interpret=True)[0]
                      * jnp.arange(3.0)))
    assert abs(a - b) < 1e-5 * max(1.0, abs(b))


def test_grads_match_xla_autodiff(cornell_scene):
    """The replay kernel's kd/emission gradients vs jax.grad through the
    wavefront.  Same estimator, same RNG draws -> near-identical grads (up
    to f32 accumulation order)."""
    cfg = _cfg()
    scene = cornell_scene
    bp, te, le = scene.bsdf_params, scene.tri_emission, scene.light_emission

    g_ref = jax.grad(lambda *p: _loss_xla(scene, cfg, *p), argnums=(0, 1, 2))(
        bp, te, le)
    g_got = jax.grad(lambda *p: _loss_mega(scene, cfg, *p), argnums=(0, 1, 2))(
        bp, te, le)

    # kd columns of bsdf_params.  Entries whose kd is EXACTLY 0 (the black
    # light-surface BSDF) are the replay estimator's removable singularity
    # (mega_grad.py docstring): it returns 0 there while full autodiff
    # recovers the one-factor-removed product.  Unreachable under the
    # sigmoid reparameterization used for inverse rendering; excluded.
    kd = np.asarray(cornell_scene.bsdf_params)[:, 0:3]
    live = kd > 0
    ref_kd = np.asarray(g_ref[0])[:, 0:3]
    got_kd = np.asarray(g_got[0])[:, 0:3]
    assert (got_kd[~live] == 0).all()
    scale = np.abs(ref_kd[live]).max()
    assert scale > 0
    np.testing.assert_allclose(got_kd[live], ref_kd[live],
                               atol=2e-3 * scale, rtol=2e-3)

    # light_emission
    ref_le = np.asarray(g_ref[2])
    got_le = np.asarray(g_got[2])
    ls = max(np.abs(ref_le).max(), 1e-12)
    np.testing.assert_allclose(got_le, ref_le, atol=2e-3 * ls, rtol=2e-3)

    # tri_emission restricted to emissive triangles (the parameters; the
    # XLA path also returns cotangents for non-emissive rows, which the
    # replay kernel does not track)
    emissive = np.asarray(scene.tri_light_idx) >= 0
    ref_te = np.asarray(g_ref[1])[emissive]
    got_te = np.asarray(g_got[1])[emissive]
    ts_ = max(np.abs(ref_te).max(), 1e-12)
    np.testing.assert_allclose(got_te, ref_te, atol=2e-3 * ts_, rtol=2e-3)


def test_grads_match_finite_differences(cornell_scene):
    """Direct FD check on one kd entry and one emission entry."""
    cfg = _cfg(spp=1, max_depth=2)
    scene = cornell_scene
    bp, te, le = scene.bsdf_params, scene.tri_emission, scene.light_emission

    g = jax.grad(lambda *p: _loss_mega(scene, cfg, *p), argnums=(0, 2))(
        bp, te, le)

    # pick the kd entry with the largest gradient magnitude
    gkd = np.asarray(g[0])[:, 0:3]
    b, c = np.unravel_index(np.abs(gkd).argmax(), gkd.shape)
    h = 1e-3
    bp_p = bp.at[b, c].add(h)
    bp_m = bp.at[b, c].add(-h)
    fd = (float(_loss_mega(scene, cfg, bp_p, te, le))
          - float(_loss_mega(scene, cfg, bp_m, te, le))) / (2 * h)
    assert abs(gkd[b, c] - fd) < 2e-2 * max(abs(fd), 1e-6), (gkd[b, c], fd)

    gle = np.asarray(g[1])
    l, c2 = np.unravel_index(np.abs(gle).argmax(), gle.shape)
    le_p = le.at[l, c2].add(h)
    le_m = le.at[l, c2].add(-h)
    fd2 = (float(_loss_mega(scene, cfg, bp, te, le_p))
           - float(_loss_mega(scene, cfg, bp, te, le_m))) / (2 * h)
    assert abs(gle[l, c2] - fd2) < 2e-2 * max(abs(fd2), 1e-6), (gle[l, c2], fd2)


def test_grads_match_xla_jitter_exact_mis(cornell_scene):
    """Jitter draws extra RNG channels and exact MIS reweights emitter hits
    (both kd-independent); grads must still match the XLA path."""
    cfg = _cfg(spp=2, max_depth=3, jitter=True, mis_mode="exact",
               light_sampling="uniform")
    scene = cornell_scene
    bp, te, le = scene.bsdf_params, scene.tri_emission, scene.light_emission
    g_ref = jax.grad(lambda *p: _loss_xla(scene, cfg, *p), argnums=(0, 2))(
        bp, te, le)
    g_got = jax.grad(lambda *p: _loss_mega(scene, cfg, *p), argnums=(0, 2))(
        bp, te, le)
    kd = np.asarray(scene.bsdf_params)[:, 0:3]
    live = kd > 0
    ref_kd = np.asarray(g_ref[0])[:, 0:3][live]
    got_kd = np.asarray(g_got[0])[:, 0:3][live]
    s = np.abs(ref_kd).max()
    np.testing.assert_allclose(got_kd, ref_kd, atol=2e-3 * s, rtol=2e-3)
    ref_le = np.asarray(g_ref[1])
    got_le = np.asarray(g_got[1])
    ls = max(np.abs(ref_le).max(), 1e-12)
    np.testing.assert_allclose(got_le, ref_le, atol=2e-3 * ls, rtol=2e-3)
