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


# ---------------------------------------------------------------------------
# fused-BVH replay backward (render_mega_bvh_diff)
# ---------------------------------------------------------------------------


def _slot_mode_cornell():
    """Cornell through the subtree-cut slot layout (a real multi-bin BVH
    build) by lowering the dense threshold."""
    from gpuspectral_tpu.bvh import build as bvh_build

    old = bvh_build.SLOT_DENSE_THRESHOLD
    bvh_build.SLOT_DENSE_THRESHOLD = 8
    try:
        scene, _ = load_mitsuba_scene("scenes/cornell/scene.xml")
    finally:
        bvh_build.SLOT_DENSE_THRESHOLD = old
    return scene


def test_bvh_grads_match_xla_autodiff():
    """The fused-BVH replay kernel vs jax.grad through the wavefront on a
    multi-bin slot-mode build: same estimator, same RNG draws."""
    from gpuspectral_tpu.integrator.mega_grad import (
        mega_bvh_grad_eligible, render_mega_bvh_diff)

    scene = _slot_mode_cornell()
    cfg = _cfg(use_bvh=True)
    assert mega_bvh_grad_eligible(scene, cfg)
    bp, te, le = scene.bsdf_params, scene.tri_emission, scene.light_emission

    # reference: brute-force differentiable wavefront (identical estimator
    # and RNG; only the intersector differs)
    cfg_ref = _cfg(use_bvh=False, intersector="woop")
    g_ref = jax.grad(
        lambda *p: _loss_xla(scene, cfg_ref, *p), argnums=(0, 1, 2))(
        bp, te, le)

    def loss_bvh(bp_, te_, le_):
        sc = scene.replace(bsdf_params=bp_, tri_emission=te_,
                           light_emission=le_)
        img = render_mega_bvh_diff(sc, cfg, 0, interpret=True)
        return jnp.sum(img * jnp.arange(3.0))

    g = jax.grad(loss_bvh, argnums=(0, 1, 2))(bp, te, le)
    # kd entries that are exactly 0 (the black light-surface BSDF) are the
    # replay estimator's removable singularity — excluded as in the brute
    # kernel's test above
    live = np.asarray(bp)[:, 0:3] > 0
    got_kd = np.asarray(g[0])[:, 0:3]
    ref_kd = np.asarray(g_ref[0])[:, 0:3]
    assert (got_kd[~live] == 0).all()
    scale = np.abs(ref_kd[live]).max()
    assert np.abs(got_kd[live] - ref_kd[live]).max() < 2e-3 * scale
    emissive = np.asarray(scene.tri_light_idx) >= 0
    for got, ref, tag in [
        (np.asarray(g[1])[emissive], np.asarray(g_ref[1])[emissive],
         "tri_emission"),
        (np.asarray(g[2]), np.asarray(g_ref[2]), "light_emission"),
    ]:
        scale = max(np.abs(ref).max(), 1e-6)
        assert np.abs(got - ref).max() < 2e-3 * scale, (
            tag, np.abs(got - ref).max(), scale)


def test_bvh_grads_mixed_scene_fd():
    """Mixed-BSDF BVH scene: kd gradients of the diffuse rows only, checked
    against central finite differences of the SAME fused forward (the
    counting identity must stay exact when specular bounces interleave)."""
    from gpuspectral_tpu.bsdf import table as bt
    from gpuspectral_tpu.bvh import build as bvh_build
    from gpuspectral_tpu.integrator.mega_grad import (
        mega_bvh_grad_eligible, mega_bvh_grad_rows, render_mega_bvh_diff)
    from gpuspectral_tpu.scene.data import SceneBuilder
    from gpuspectral_tpu.scene.obj import make_cube, make_rectangle

    old = bvh_build.SLOT_DENSE_THRESHOLD
    bvh_build.SLOT_DENSE_THRESHOLD = 8
    try:
        b = SceneBuilder()
        rpos, rnrm, ruv = make_rectangle()
        cpos, cnrm, cuv = make_cube()
        kd = b.add_bsdf(bt.diffuse((0.6, 0.4, 0.3)))
        mirror = b.add_bsdf(bt.smooth_conductor(0.0))  # perfect mirror (ior_in=0)
        floor = np.array([[2, 0, 0, 0], [0, 0, 2, 0], [0, -1, 0, 0],
                          [0, 0, 0, 1]], np.float32)
        b.add_object(rpos, rnrm, ruv, floor, kd, twofaced=True)
        boxxf = np.array([[0.5, 0, 0, -0.5], [0, 0.5, 0, -0.49],
                          [0, 0, 0.5, 0], [0, 0, 0, 1]], np.float32)
        b.add_object(cpos, cnrm, cuv, boxxf, mirror)
        light = b.add_bsdf(bt.diffuse((0.0, 0.0, 0.0)))
        lxf = np.array([[1, 0, 0, 0], [0, 0, -1, 2.5], [0, 1, 0, 0],
                        [0, 0, 0, 1]], np.float32)
        b.add_object(rpos, rnrm, ruv, lxf, light, emission=(8.0, 8.0, 8.0))
        b.set_camera(np.array([[-1, 0, 0, 0], [0, 1, 0, 0.6], [0, 0, -1, 3],
                               [0, 0, 0, 1]], np.float32), np.deg2rad(60))
        scene = b.build()
    finally:
        bvh_build.SLOT_DENSE_THRESHOLD = old

    cfg = _cfg(use_bvh=True, max_depth=4)
    assert mega_bvh_grad_eligible(scene, cfg)
    rows = mega_bvh_grad_rows(scene)
    assert kd in rows and light in rows and mirror not in rows

    def loss(bp):
        sc = scene.replace(bsdf_params=bp)
        img = render_mega_bvh_diff(sc, cfg, 0, interpret=True)
        return jnp.sum(img * jnp.arange(3.0))

    bp0 = scene.bsdf_params
    g = np.asarray(jax.grad(loss)(bp0))
    eps = 2e-3
    checked = 0
    for c in range(3):
        e = jnp.zeros_like(bp0).at[kd, c].set(1.0)
        fd = (float(loss(bp0 + eps * e)) - float(loss(bp0 - eps * e))) / (
            2 * eps)
        assert abs(g[kd, c] - fd) < 2e-2 * max(abs(fd), 1e-3), (
            c, g[kd, c], fd)
        checked += 1
    assert checked == 3


def test_bvh_grads_textured_fd():
    """Vertex-textured diffuse scene: kd gradients through the fused-BVH
    replay vs finite differences of the SAME forward.  Texture modulation
    is multiplicative in kd, so d f/d kd = f/kd keeps the estimator exact
    (mega_grad.make_diffuse_grad_hook)."""
    from gpuspectral_tpu.bsdf import table as bt
    from gpuspectral_tpu.bvh import build as bvh_build
    from gpuspectral_tpu.integrator.mega_grad import (
        mega_bvh_grad_eligible, render_mega_bvh_diff)
    from gpuspectral_tpu.scene.data import SceneBuilder, TEX_RES
    from gpuspectral_tpu.scene.obj import make_rectangle

    old = bvh_build.SLOT_DENSE_THRESHOLD
    bvh_build.SLOT_DENSE_THRESHOLD = 8
    try:
        b = SceneBuilder()
        pos, nrm, uv = make_rectangle()
        u = (np.arange(TEX_RES, dtype=np.float32) + 0.5) / TEX_RES
        grad_tex = np.broadcast_to(
            u[None, :, None], (TEX_RES, TEX_RES, 3)).copy()
        mat = b.add_bsdf(bt.diffuse((0.7, 0.5, 0.4)), texture=grad_tex)
        floor = np.array([[2, 0, 0, 0], [0, 0, 2, 0], [0, -1, 0, 0],
                          [0, 0, 0, 1]], np.float32)
        b.add_object(pos, nrm, uv, floor, mat, twofaced=True)
        light = b.add_bsdf(bt.diffuse((0.0, 0.0, 0.0)))
        lxf = np.array([[1, 0, 0, 0], [0, 0, -1, 3], [0, 1, 0, 0],
                        [0, 0, 0, 1]], np.float32)
        b.add_object(pos, nrm, uv, lxf, light, emission=(10.0, 10.0, 10.0))
        b.set_camera(np.array([[-1, 0, 0, 0], [0, 1, 0, 1.2], [0, 0, -1, 4],
                               [0, 0, 0, 1]], np.float32), np.deg2rad(60))
        scene = b.build()
    finally:
        bvh_build.SLOT_DENSE_THRESHOLD = old

    assert scene.has_textures
    cfg = _cfg(use_bvh=True, max_depth=3)
    assert mega_bvh_grad_eligible(scene, cfg)

    def loss(bp):
        sc = scene.replace(bsdf_params=bp)
        img = render_mega_bvh_diff(sc, cfg, 0, interpret=True)
        return jnp.sum(img * jnp.arange(3.0))

    bp0 = scene.bsdf_params
    g = np.asarray(jax.grad(loss)(bp0))
    # large eps: the loss is multilinear in kd (degree <= depth), so the
    # central difference is near-exact, while a tiny eps drowns in f32
    # quantization of the loss (measured: eps=2e-3 gives ~25% FD noise,
    # the white-texture control matches to 3e-4)
    eps = 0.05
    for c in range(1, 3):  # channel 0 has zero loss weight
        e = jnp.zeros_like(bp0).at[0, c].set(1.0)
        fd = (float(loss(bp0 + eps * e)) - float(loss(bp0 - eps * e))) / (
            2 * eps)
        # 5%: bounds the eps^2 curvature + f32 loss quantization (measured
        # ~3%); a missing/extra texture factor in the hook measures 25-100%
        assert abs(g[0, c] - fd) < 5e-2 * max(abs(fd), 1e-3), (c, g[0, c], fd)
