"""Binned-wavefront traversal (bvh/binned.py) vs brute force: closest and
any-hit agreement on random scenes and on the Cornell fixture, plus the
fused attribute rows and the custom_vjp gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuspectral_tpu.bvh.binned import (
    binned_any,
    binned_closest,
    binned_closest_diff,
)
from gpuspectral_tpu.ops.intersect import intersect_any, intersect_closest


def _random_scene(n_tris, seed=0, spread=2.0, size=0.4):
    """Random triangle soup packed through the real SceneBuilder (so the SAH
    build, slot permutation and bin tables are the production ones)."""
    from gpuspectral_tpu.bsdf.table import diffuse
    from gpuspectral_tpu.scene.data import SceneBuilder, build_scene

    rng = np.random.RandomState(seed)
    base = rng.uniform(-spread, spread, (n_tris, 1, 3))
    tris = (base + rng.uniform(-size, size, (n_tris, 3, 3))).astype(np.float32)
    nrm = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    nrm = np.repeat(nrm[:, None, :], 3, axis=1).astype(np.float32)

    b = SceneBuilder()
    bsdf = b.add_bsdf(diffuse((0.5, 0.5, 0.5)))
    b.add_object(tris, nrm, None, np.eye(4, dtype=np.float32), bsdf)
    b.set_camera(np.eye(4, dtype=np.float32), 0.7)
    return build_scene(b)


def _random_rays(n_rays, seed=1, spread=3.0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-spread, spread, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n_tris,n_rays", [(300, 257), (3000, 1000)])
def test_binned_closest_matches_brute(n_tris, n_rays):
    scene = _random_scene(n_tris)
    o, d = _random_rays(n_rays)
    t_b, prim_b, u_b, v_b = intersect_closest(o, d, scene.tri_pos,
                                              woop=scene.tri_woop)
    t, prim, u, v, attrs = binned_closest(scene, o, d, interpret=True)
    hit_b = np.asarray(prim_b >= 0)
    hit = np.asarray(prim >= 0)
    np.testing.assert_array_equal(hit, hit_b)
    # same triangle, or a coplanar duplicate at the same t
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(t_b)[hit],
                               rtol=1e-5, atol=1e-6)
    same = np.asarray(prim)[hit] == np.asarray(prim_b)[hit]
    assert same.mean() > 0.99, same.mean()
    np.testing.assert_allclose(np.asarray(u)[hit][same], np.asarray(u_b)[hit][same],
                               rtol=2e-4, atol=2e-5)


def test_binned_closest_respects_active():
    scene = _random_scene(500)
    o, d = _random_rays(400)
    active = jnp.arange(400) % 3 != 0
    t, prim, u, v, attrs = binned_closest(scene, o, d, active=active,
                                          interpret=True)
    assert np.all(np.asarray(prim)[~np.asarray(active)] == -1)


@pytest.mark.parametrize("n_tris", [300, 3000])
def test_binned_any_matches_brute(n_tris):
    scene = _random_scene(n_tris)
    o, d = _random_rays(800, seed=3)
    t_max = jnp.full((800,), 4.0)
    occ_b = intersect_any(o, d, scene.tri_pos, t_min=1e-3, t_max=t_max,
                          woop=scene.tri_woop)
    occ = binned_any(scene, o, d, t_min=1e-3, t_max=t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_b))


def test_binned_attrs_match_gather():
    """Fused attr rows == the same rows gathered from the attr table."""
    from gpuspectral_tpu.bvh.dfs_sweep import _attr_table

    scene = _random_scene(700, seed=5)
    o, d = _random_rays(300, seed=6)
    t, prim, u, v, attrs = binned_closest(scene, o, d, interpret=True)
    table = np.asarray(_attr_table(scene, scene.has_textures))
    hit = np.asarray(prim) >= 0
    want = table[:, np.maximum(np.asarray(prim), 0)].T
    np.testing.assert_allclose(np.asarray(attrs)[hit], want[hit], rtol=1e-6)


def test_binned_grad_matches_brute_path():
    """d(t)/d(origin) from the custom_vjp == the XLA intersector's grad."""
    from gpuspectral_tpu.ops.woop import _recover_uv  # noqa: F401

    scene = _random_scene(400, seed=8)
    o, d = _random_rays(64, seed=9)

    def loss_binned(oo):
        t, prim, u, v, attrs = binned_closest_diff(scene, oo, d)
        return jnp.sum(jnp.where(prim >= 0, t, 0.0) + jnp.where(prim >= 0, u * v, 0.0))

    def loss_ref(oo):
        t, prim, u, v = intersect_closest(oo, d, scene.tri_pos,
                                          woop=scene.tri_woop)
        return jnp.sum(jnp.where(prim >= 0, t, 0.0) + jnp.where(prim >= 0, u * v, 0.0))

    g = jax.grad(loss_binned)(o)
    g_ref = jax.grad(loss_ref)(o)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-5)
