"""Cluster-sweep intersector (bvh/cluster_sweep.py) vs brute force.

Runs in Pallas interpret mode on CPU; the TPU path was additionally verified
against brute force on real hardware (2048-ray fuzz on staircase2: t values
identical, 2 prim flips on exact t-ties)."""

import numpy as np
import jax.numpy as jnp

from gpuspectral_tpu.bvh.cluster_sweep import cluster_closest, cluster_any
from gpuspectral_tpu.ops import intersect as isect


def _fuzz_rays(scene, n, seed=0):
    rs = np.random.default_rng(seed)
    bb_min = np.asarray(scene.bvh_node_min[0])
    bb_max = np.asarray(scene.bvh_node_max[0])
    o = rs.uniform(bb_min - 0.2, bb_max + 0.2, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_cluster_closest_matches_brute_force(cornell_scene):
    o, d = _fuzz_rays(cornell_scene, 512)
    t_s, prim_s, u_s, v_s = cluster_closest(cornell_scene, o, d, interpret=True)
    t_r, prim_r, u_r, v_r = isect.intersect_closest(
        o, d, cornell_scene.tri_pos, woop=cornell_scene.tri_woop, tri_chunk=512
    )
    t_s, t_r = np.asarray(t_s), np.asarray(t_r)
    prim_s, prim_r = np.asarray(prim_s), np.asarray(prim_r)
    hit = prim_r >= 0
    # t must agree everywhere (up to exact ties the winner may differ)
    np.testing.assert_allclose(
        np.where(hit, t_s, 0.0), np.where(hit, t_r, 0.0), rtol=1e-5, atol=1e-5
    )
    assert np.mean(prim_s != prim_r) < 0.01  # only exact-tie flips
    same = prim_s == prim_r
    np.testing.assert_allclose(
        np.asarray(u_s)[same], np.asarray(u_r)[same], atol=1e-4
    )


def test_cluster_any_matches_brute_force(cornell_scene):
    o, d = _fuzz_rays(cornell_scene, 512, seed=1)
    t_max = jnp.full((512,), 1.5)
    occ_s = cluster_any(cornell_scene, o, d, 0.01, t_max, interpret=True)
    occ_r = isect.intersect_any(
        o, d, cornell_scene.tri_pos, t_min=0.01, t_max=t_max,
        woop=cornell_scene.tri_woop, tri_chunk=512,
    )
    np.testing.assert_array_equal(np.asarray(occ_s), np.asarray(occ_r))


def test_cluster_active_mask(cornell_scene):
    o, d = _fuzz_rays(cornell_scene, 512, seed=2)
    active = jnp.arange(512) % 2 == 0
    t_s, prim_s, _u, _v = cluster_closest(cornell_scene, o, d, active=active, interpret=True)
    assert np.all(np.asarray(prim_s)[~np.asarray(active)] == -1)


def _soup_scene(n=3000, seed=4):
    """A SceneData above SLOT_DENSE_THRESHOLD so the slot-padded real-leaf
    SAH build path (bvh/build.py sah slot mode) is exercised end to end."""
    from gpuspectral_tpu.bsdf.table import diffuse
    from gpuspectral_tpu.scene.data import SceneBuilder

    rs = np.random.default_rng(seed)
    centers = rs.uniform(-4, 4, size=(n, 1, 3))
    tris = (centers + rs.uniform(-0.3, 0.3, size=(n, 3, 3))).astype(np.float32)
    b = SceneBuilder()
    mat = b.add_bsdf(diffuse((0.5, 0.5, 0.5)))
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    b.add_object(tris, np.repeat(nrm[:, None, :], 3, 1), None, np.eye(4), mat)
    return b.build()


def test_cluster_closest_slot_mode_matches_brute_force():
    scene = _soup_scene()
    assert scene.num_tris == 3000
    # slot mode: padded woop rows are all-zero, real rows scattered
    woop = np.asarray(scene.tri_woop)
    n_empty = int(np.sum(~np.any(woop != 0.0, axis=1)))
    assert n_empty > 0, "expected -1 padding slots above the dense threshold"

    o, d = _fuzz_rays(scene, 512, seed=5)
    t_s, prim_s, u_s, v_s = cluster_closest(scene, o, d, interpret=True)
    t_r, prim_r, u_r, v_r = isect.intersect_closest(
        o, d, scene.tri_pos, woop=scene.tri_woop, tri_chunk=512
    )
    hit = np.asarray(prim_r) >= 0
    np.testing.assert_allclose(
        np.where(hit, np.asarray(t_s), 0.0), np.where(hit, np.asarray(t_r), 0.0),
        rtol=1e-5, atol=1e-5,
    )
    assert np.mean(np.asarray(prim_s) != np.asarray(prim_r)) < 0.01


def test_cluster_any_slot_mode_matches_brute_force():
    scene = _soup_scene(seed=6)
    o, d = _fuzz_rays(scene, 512, seed=7)
    t_max = jnp.full((512,), 2.5)
    occ_s = cluster_any(scene, o, d, 0.01, t_max, interpret=True)
    occ_r = isect.intersect_any(
        o, d, scene.tri_pos, t_min=0.01, t_max=t_max,
        woop=scene.tri_woop, tri_chunk=512,
    )
    np.testing.assert_array_equal(np.asarray(occ_s), np.asarray(occ_r))
