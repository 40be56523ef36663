#!/usr/bin/env python
"""Measure BVH cluster-vote selectivity on a real scene.

For the cluster-sweep intersector the work per traversal is
    sum over ray-blocks of  V(B) * B * LEAF_TEST
where V(B) is the number of clusters ANY ray in the block votes for.  The
per-ray vote count is the lower bound (perfect gating).  This tool reports
E[votes/ray] and E[V(B)] for a range of block sizes, for primary rays and
for 1st/2nd diffuse-bounce rays (sorted by the integrator's coherence key),
so kernel-shape decisions are data-driven rather than guessed.

Usage: python tools/measure_votes.py [scene.xml] [--res 256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REF = "/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml"


def slab_votes(o, d, tmin, tmax, lo, hi):
    """(R,3) rays x (C,3) boxes -> (R,C) bool."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    t0 = (lo[None] - o[:, None]) * inv[:, None]  # (R,C,3)
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    tn = jnp.maximum(jnp.minimum(t0, t1).max(-1), tmin[:, None])
    tf = jnp.minimum(jnp.maximum(t0, t1).min(-1), tmax[:, None])
    return tf >= tn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default=REF)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    from gpuspectral_tpu.bvh.cluster_sweep import cluster_closest
    from gpuspectral_tpu.integrator.path_tracer import _ray_sort_key, generate_rays
    from gpuspectral_tpu.ops import rng
    from gpuspectral_tpu.ops.math3d import normalize, onb_create, onb_local_to_world
    from gpuspectral_tpu.ops.sampling import sample_cosine_hemisphere
    from gpuspectral_tpu.scene import load_mitsuba_scene

    scene, _ = load_mitsuba_scene(args.scene)
    C = scene.bvh_clusters
    first_leaf = C - 1
    cl_lo = scene.bvh_node_min[first_leaf:]
    cl_hi = scene.bvh_node_max[first_leaf:]
    print(f"tris={scene.num_tris} clusters={C} leaf={scene.bvh_leaf_size}")
    # cluster AABB surface-area stats (quality signal)
    ext = np.asarray(jnp.maximum(cl_hi - cl_lo, 0.0))
    sa = 2 * (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 0] * ext[:, 2])
    real = np.isfinite(sa) & (sa > 0)
    print(f"cluster SA: mean={sa[real].mean():.4f} p90={np.quantile(sa[real], .9):.4f} "
          f"max={sa[real].max():.4f} (scene SA={2*np.prod(np.sort(np.asarray(jnp.max(scene.tri_pos.reshape(-1,3),0)-jnp.min(scene.tri_pos.reshape(-1,3),0)))[1:]) :.3f})")

    r = args.res * args.res
    pix = jnp.arange(r, dtype=jnp.uint32)
    o, d = generate_rays(scene.camera, args.res, args.res, pix, None)

    def sort(o, d, live):
        key = _ray_sort_key(scene, o, d, ~live)
        idx = jnp.argsort(key)
        return o[idx], d[idx], live[idx]

    def report(name, o, d, live):
        tmin = jnp.zeros((o.shape[0],))
        tmax = jnp.where(live, 1e30, -1e30)
        v = slab_votes(o, d, tmin, tmax, cl_lo, cl_hi)  # (R,C)
        per_ray = v.sum(1)
        live_n = int(live.sum())
        print(f"\n{name}: live={live_n}/{o.shape[0]}")
        print(f"  votes/ray (live): mean={float(per_ray[live].mean()):.1f} "
              f"p90={float(jnp.quantile(per_ray[live].astype(jnp.float32), 0.9)):.0f} "
              f"max={int(per_ray.max())}")
        for B in (8, 32, 64, 256, 1024):
            nb = v.shape[0] // B
            vb = v[: nb * B].reshape(nb, B, -1).any(1).sum(-1)  # V per block
            # work model: sum_b V(b) * B tests of LEAF tris
            tests_per_live_ray = float(vb.sum()) * B / max(live_n, 1)
            print(f"  B={B:5d}: V/block mean={float(vb.mean()):7.1f}  "
                  f"clusters tested per live ray={tests_per_live_ray:8.1f}")

    live0 = jnp.ones((r,), bool)
    o_s, d_s, l_s = sort(o, d, live0)
    report("primary (sorted)", o_s, d_s, l_s)

    # bounce 1: cosine hemisphere at primary hits (geometric normal)
    t, prim, u, vv = cluster_closest(scene, o, d)
    hit = prim >= 0
    p0 = scene.tri_pos[jnp.maximum(prim, 0)]
    n = normalize(jnp.cross(p0[:, 1] - p0[:, 0], p0[:, 2] - p0[:, 0]))
    n = jnp.where((jnp.sum(n * d, -1) > 0)[:, None], -n, n)
    hp = o + t[:, None] * d + 1e-4 * n
    seed = rng.pixel_seed(pix, jnp.uint32(7))
    u1 = rng.uniform(seed, jnp.uint32(1), jnp.uint32(11))
    u2 = rng.uniform(seed, jnp.uint32(1), jnp.uint32(12))
    local = sample_cosine_hemisphere(u1, u2)
    tb, bb, nn = onb_create(n)
    d1 = normalize(onb_local_to_world(tb, bb, nn, local))
    o_s, d_s, l_s = sort(hp, d1, hit)
    report("bounce1 diffuse (sorted)", o_s, d_s, l_s)

    # bounce 2
    t2, prim2, _, _ = cluster_closest(scene, hp, d1, active=hit)
    hit2 = hit & (prim2 >= 0)
    p2 = scene.tri_pos[jnp.maximum(prim2, 0)]
    n2 = normalize(jnp.cross(p2[:, 1] - p2[:, 0], p2[:, 2] - p2[:, 0]))
    n2 = jnp.where((jnp.sum(n2 * d1, -1) > 0)[:, None], -n2, n2)
    hp2 = hp + t2[:, None] * d1 + 1e-4 * n2
    u1 = rng.uniform(seed, jnp.uint32(2), jnp.uint32(11))
    u2 = rng.uniform(seed, jnp.uint32(2), jnp.uint32(12))
    local = sample_cosine_hemisphere(u1, u2)
    tb, bb, nn = onb_create(n2)
    d2 = normalize(onb_local_to_world(tb, bb, nn, local))
    o_s, d_s, l_s = sort(hp2, d2, hit2)
    report("bounce2 diffuse (sorted)", o_s, d_s, l_s)

    # shadow rays from bounce-1 hits toward a random light point
    li = jnp.minimum((rng.uniform(seed, jnp.uint32(3), jnp.uint32(13)) *
                      scene.num_lights).astype(jnp.int32), scene.num_lights - 1)
    lp = scene.light_pos[li].mean(1)
    sd = normalize(lp - hp)
    o_s, d_s, l_s = sort(hp, sd, hit)
    report("shadow from bounce1 (sorted)", o_s, d_s, l_s)


if __name__ == "__main__":
    main()
# (appended) oracle distance-culled votes: see main2
