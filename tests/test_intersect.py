"""Intersection kernel tests against analytic cases and a numpy oracle."""

import numpy as np
import jax.numpy as jnp

from gpuspectral_tpu.ops.intersect import intersect_any, intersect_closest


def _single_tri():
    # unit triangle at z=1
    return jnp.asarray([[[0, 0, 1], [2, 0, 1], [0, 2, 1]]], jnp.float32)


def test_hit_and_miss():
    tri = _single_tri()
    o = jnp.asarray([[0.5, 0.5, 0.0], [5.0, 5.0, 0.0], [0.5, 0.5, 2.0]], jnp.float32)
    d = jnp.asarray([[0, 0, 1.0], [0, 0, 1.0], [0, 0, 1.0]], jnp.float32)
    t, prim, u, v = intersect_closest(o, d, tri)
    t, prim = np.asarray(t), np.asarray(prim)
    assert prim[0] == 0 and abs(t[0] - 1.0) < 1e-6
    assert prim[1] == -1  # outside
    assert prim[2] == -1  # behind (t<0)


def test_barycentrics():
    tri = _single_tri()
    o = jnp.asarray([[0.5, 0.25, 0.0]], jnp.float32)
    d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    t, prim, u, v = intersect_closest(o, d, tri)
    # u,v are weights of corners 1,2: p = (1-u-v)*c0 + u*c1 + v*c2
    np.testing.assert_allclose(np.asarray(u)[0], 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v)[0], 0.125, atol=1e-6)


def test_closest_of_many_chunked():
    """Closest hit across chunk boundaries with a tiny chunk size."""
    n = 37
    zs = np.linspace(1.0, 10.0, n)
    tris = np.zeros((n, 3, 3), np.float32)
    for i, z in enumerate(zs):
        tris[i] = [[-1, -1, z], [3, -1, z], [-1, 3, z]]
    rs = np.random.default_rng(1)
    perm = rs.permutation(n)
    tris = tris[perm]
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[0, 0, 1.0]])
    t, prim, _, _ = intersect_closest(o, d, jnp.asarray(tris), tri_chunk=8)
    assert abs(float(t[0]) - 1.0) < 1e-6
    assert int(prim[0]) == int(np.where(perm == 0)[0][0])


def test_tmin_tmax_window():
    tri = _single_tri()
    o = jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32)
    d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    t, prim, _, _ = intersect_closest(o, d, tri, t_min=jnp.asarray(1.5))
    assert int(prim[0]) == -1
    t, prim, _, _ = intersect_closest(o, d, tri, t_max=jnp.asarray(0.5))
    assert int(prim[0]) == -1
    occ = intersect_any(o, d, tri, t_min=0.0, t_max=2.0)
    assert bool(occ[0])
    occ = intersect_any(o, d, tri, t_min=1.5, t_max=2.0)
    assert not bool(occ[0])


def test_inactive_rays_never_hit():
    tri = _single_tri()
    o = jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32)
    d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    t, prim, _, _ = intersect_closest(o, d, tri, active=jnp.asarray([False]))
    assert int(prim[0]) == -1
    occ = intersect_any(o, d, tri, 0.0, 10.0, active=jnp.asarray([False]))
    assert not bool(occ[0])


def test_degenerate_padding_never_hits():
    tris = jnp.concatenate([_single_tri(), jnp.zeros((7, 3, 3), jnp.float32)])
    o = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)  # aims at origin
    d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    t, prim, _, _ = intersect_closest(o, d, tris)
    assert int(prim[0]) == 0  # the real triangle, not a degenerate pad


def test_random_oracle():
    """Fuzz against a direct numpy Moller-Trumbore oracle."""
    rs = np.random.default_rng(42)
    tris = rs.uniform(-1, 1, size=(64, 3, 3)).astype(np.float32)
    o = rs.uniform(-2, -1.5, size=(128, 3)).astype(np.float32)
    d = rs.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t, prim, _, _ = intersect_closest(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris), tri_chunk=16)
    t, prim = np.asarray(t), np.asarray(prim)

    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    e1, e2 = v1 - v0, v2 - v0
    best_t = np.full(128, 1e30)
    best_p = np.full(128, -1)
    for r in range(128):
        h = np.cross(d[r], e2)
        a = np.einsum("td,td->t", e1, h)
        mask = np.abs(a) > 1e-12
        f = np.where(mask, 1.0 / np.where(mask, a, 1), 0)
        s = o[r] - v0
        u = f * np.einsum("td,td->t", s, h)
        q = np.cross(s, e1)
        v = f * np.einsum("d,td->t", d[r], q)
        tt = f * np.einsum("td,td->t", e2, q)
        ok = mask & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (tt > 0) & (tt < 1e30)
        if ok.any():
            cand = np.where(ok, tt, 1e30)
            best_p[r] = cand.argmin()
            best_t[r] = cand.min()
    np.testing.assert_array_equal(prim, best_p)
    hit = best_p >= 0
    np.testing.assert_allclose(t[hit], best_t[hit], rtol=1e-4)
