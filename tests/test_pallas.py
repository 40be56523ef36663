"""Pallas traversal kernel: interpret-mode equivalence with the XLA
traversal (logic check; the TPU lowering is exercised on hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpuspectral_tpu.bvh.build import build_bvh
from gpuspectral_tpu.bvh.kernels import traverse_pallas
from gpuspectral_tpu.ops.intersect import intersect_closest, intersect_any


@pytest.mark.parametrize("n_tris", [60, 500])
def test_pallas_interpret_matches_bruteforce(n_tris):
    rs = np.random.default_rng(11)
    centers = rs.uniform(-3, 3, size=(n_tris, 1, 3))
    tris = (centers + rs.uniform(-0.4, 0.4, size=(n_tris, 3, 3))).astype(np.float32)
    pad = -(-n_tris // 128) * 128 - n_tris
    padded = np.concatenate([tris, np.zeros((pad, 3, 3), np.float32)])
    bvh = build_bvh(padded, n_tris)
    sorted_tris = jnp.asarray(padded[bvh.perm])

    r = 64
    o = rs.uniform(-5, 5, size=(r, 3)).astype(np.float32)
    d = rs.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    t_b, prim_b, u_b, v_b = intersect_closest(o, d, sorted_tris, tri_chunk=128)
    t_p, prim_p, u_p, v_p = traverse_pallas(
        o, d, sorted_tris,
        jnp.asarray(bvh.node_min), jnp.asarray(bvh.node_max),
        bvh.n_clusters, bvh.leaf_size, bvh.n_levels,
        t_min=jnp.zeros(()), t_max=jnp.full((), 1e30),
        packet_size=32, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(prim_p), np.asarray(prim_b))
    hit = np.asarray(prim_b) >= 0
    np.testing.assert_allclose(np.asarray(t_p)[hit], np.asarray(t_b)[hit], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u_p)[hit], np.asarray(u_b)[hit], atol=1e-5)


def test_pallas_interpret_any_hit():
    rs = np.random.default_rng(5)
    tris = rs.uniform(-1, 1, size=(100, 3, 3)).astype(np.float32)
    pad = 28
    padded = np.concatenate([tris, np.zeros((pad, 3, 3), np.float32)])
    bvh = build_bvh(padded, 100)
    sorted_tris = jnp.asarray(padded[bvh.perm])
    r = 32
    o = rs.uniform(-2, -1.5, size=(r, 3)).astype(np.float32)
    d = rs.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    occ_b = intersect_any(o, d, sorted_tris, 0.0, 4.0, tri_chunk=128)
    _, prim_p, _, _ = traverse_pallas(
        o, d, sorted_tris,
        jnp.asarray(bvh.node_min), jnp.asarray(bvh.node_max),
        bvh.n_clusters, bvh.leaf_size, bvh.n_levels,
        t_min=jnp.zeros(()), t_max=jnp.full((), 4.0),
        packet_size=32, any_hit=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(prim_p) >= 0, np.asarray(occ_b))
