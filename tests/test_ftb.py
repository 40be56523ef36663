"""Front-to-back binned traversal (bvh/ftb.py) vs brute force: closest and
any-hit agreement on random scenes, fused attribute rows, custom_vjp
gradients, and the early-exit invariants (t_max / active handling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuspectral_tpu.bvh.ftb import ftb_any, ftb_closest, ftb_closest_diff
from gpuspectral_tpu.ops.intersect import intersect_any, intersect_closest

from test_binned import _random_rays, _random_scene


@pytest.mark.parametrize("n_tris,n_rays", [(300, 257), (3000, 1000)])
def test_ftb_closest_matches_brute(n_tris, n_rays):
    scene = _random_scene(n_tris)
    o, d = _random_rays(n_rays)
    t_b, prim_b, u_b, v_b = intersect_closest(o, d, scene.tri_pos,
                                              woop=scene.tri_woop)
    t, prim, u, v, attrs = ftb_closest(scene, o, d, interpret=True)
    hit_b = np.asarray(prim_b >= 0)
    hit = np.asarray(prim >= 0)
    np.testing.assert_array_equal(hit, hit_b)
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(t_b)[hit],
                               rtol=1e-5, atol=1e-6)
    same = np.asarray(prim)[hit] == np.asarray(prim_b)[hit]
    assert same.mean() > 0.99, same.mean()
    np.testing.assert_allclose(np.asarray(u)[hit][same], np.asarray(u_b)[hit][same],
                               rtol=2e-4, atol=2e-5)


def test_ftb_closest_respects_active_and_tmax():
    scene = _random_scene(500)
    o, d = _random_rays(400)
    active = jnp.arange(400) % 3 != 0
    t, prim, u, v, attrs = ftb_closest(scene, o, d, active=active,
                                       interpret=True)
    assert np.all(np.asarray(prim)[~np.asarray(active)] == -1)
    # a tight t_max must cut off farther hits
    t2, prim2, _, _, _ = ftb_closest(scene, o, d, t_max=jnp.full((400,), 2.0),
                                     interpret=True)
    tn = np.asarray(t)
    hn = np.asarray(prim) >= 0
    h2 = np.asarray(prim2) >= 0
    assert np.all(np.asarray(t2)[h2] < 2.0 + 1e-5)
    keep = hn & (tn < 2.0 - 1e-5) & np.asarray(active)
    np.testing.assert_array_equal(h2[keep], True)


@pytest.mark.parametrize("n_tris", [300, 3000])
def test_ftb_any_matches_brute(n_tris):
    scene = _random_scene(n_tris)
    o, d = _random_rays(800, seed=3)
    t_max = jnp.full((800,), 4.0)
    occ_b = intersect_any(o, d, scene.tri_pos, t_min=1e-3, t_max=t_max,
                          woop=scene.tri_woop)
    occ = ftb_any(scene, o, d, t_min=1e-3, t_max=t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_b))


def test_ftb_attrs_match_gather():
    from gpuspectral_tpu.bvh.dfs_sweep import _attr_table

    scene = _random_scene(700, seed=5)
    o, d = _random_rays(300, seed=6)
    t, prim, u, v, attrs = ftb_closest(scene, o, d, interpret=True)
    table = np.asarray(_attr_table(scene, scene.has_textures))
    hit = np.asarray(prim) >= 0
    want = table[:, np.maximum(np.asarray(prim), 0)].T
    np.testing.assert_allclose(np.asarray(attrs)[hit], want[hit], rtol=1e-6)


def test_ftb_grad_matches_brute_path():
    scene = _random_scene(400, seed=8)
    o, d = _random_rays(64, seed=9)

    def loss_ftb(oo):
        t, prim, u, v, attrs = ftb_closest_diff(scene, oo, d)
        return jnp.sum(jnp.where(prim >= 0, t, 0.0) + jnp.where(prim >= 0, u * v, 0.0))

    def loss_ref(oo):
        t, prim, u, v = intersect_closest(oo, d, scene.tri_pos,
                                          woop=scene.tri_woop)
        return jnp.sum(jnp.where(prim >= 0, t, 0.0) + jnp.where(prim >= 0, u * v, 0.0))

    g = jax.grad(loss_ftb)(o)
    g_ref = jax.grad(loss_ref)(o)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-5)
