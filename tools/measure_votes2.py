#!/usr/bin/env python
"""Corrected vote-selectivity measurement (the round-2 tool counted padding
clusters whose inverted +/-inf bounds pass a naive slab test).

Reports, for primary / bounce-1 / bounce-2 / shadow rays on a real scene and
for several bin granularities (bin = G consecutive SAH leaves):

  * votes/ray with infinite t_max (what a vote kernel sees before any hit)
  * votes/ray with oracle t_max (lower bound after perfect tightening)
  * rank of the WINNING bin in per-ray front-to-back entry order (how many
    rounds an iterative nearest-bin-first traversal needs), plus the CDF.

Usage: python tools/measure_votes2.py [scene.xml] [--res 128] [--groups 4 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REF = "/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default=REF)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--groups", type=int, nargs="*", default=[4, 8, 16, 32])
    args = ap.parse_args()

    from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    from gpuspectral_tpu.integrator.path_tracer import _ray_sort_key
    from gpuspectral_tpu.ops import rng
    from gpuspectral_tpu.ops.math3d import normalize, onb_create, onb_local_to_world
    from gpuspectral_tpu.ops.sampling import sample_cosine_hemisphere, sample_triangle_light
    from gpuspectral_tpu.ops.intersect import intersect_closest
    from gpuspectral_tpu.scene import load_mitsuba_scene
    from gpuspectral_tpu.scene.camera import generate_rays

    scene, _ = load_mitsuba_scene(args.scene)
    C = int(scene.bvh_clusters)
    leaf = int(scene.bvh_leaf_size)
    first_leaf = C - 1
    cl_lo = np.asarray(scene.bvh_node_min[first_leaf:])
    cl_hi = np.asarray(scene.bvh_node_max[first_leaf:])
    real = np.isfinite(cl_lo).all(1) & np.isfinite(cl_hi).all(1)
    n_real = int(real.sum())
    print(f"tris={scene.num_tris} clusters={C} real={n_real} leaf={leaf}")

    res = args.res
    n = res * res
    pix = jnp.arange(n, dtype=jnp.uint32)
    seed = rng.pixel_seed(pix, jnp.uint32(0))
    o, d = generate_rays(scene.camera, res, res, pix)

    def closest_t(o, d):
        t, prim, bu, bv = intersect_closest(
            np.asarray(o), np.asarray(d), scene.tri_pos, woop=scene.tri_woop
        )
        return np.asarray(t), np.asarray(prim)

    def bounce(o, d, t, prim, ch):
        hit = prim >= 0
        pos = np.asarray(o) + np.asarray(d) * np.where(hit, t, 1.0)[:, None]
        tri = np.asarray(scene.tri_pos)[np.maximum(prim, 0)]
        gn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-12)
        wo = -np.asarray(d)
        gn = np.where((gn * wo).sum(-1, keepdims=True) < 0, -gn, gn)
        u1 = np.asarray(rng.uniform(seed, jnp.uint32(ch), 1))
        u2 = np.asarray(rng.uniform(seed, jnp.uint32(ch), 2))
        local = np.asarray(sample_cosine_hemisphere(jnp.asarray(u1), jnp.asarray(u2)))
        tg, bn, nn = onb_create(jnp.asarray(gn))
        nd = np.asarray(onb_local_to_world(tg, bn, nn, jnp.asarray(local)))
        return pos + 1e-4 * gn, nd, hit

    # ray sets
    sets = {}
    t0, p0 = closest_t(o, d)
    sets["primary"] = (np.asarray(o), np.asarray(d), t0, p0, np.ones(n, bool))
    o1, d1, live1 = bounce(o, d, t0, p0, 1)
    t1, p1 = closest_t(o1, d1)
    sets["bounce1"] = (o1, d1, t1, p1, live1)
    o2, d2, live2 = bounce(o1, d1, t1, p1, 2)
    t2, p2 = closest_t(o2, d2)
    sets["bounce2"] = (o2, d2, t2, p2, live2 & (p1 >= 0))

    # shadow rays from bounce-1 hits toward a sampled light
    lbits = np.asarray(rng.random_bits(seed, jnp.uint32(1), 3))
    lidx = (lbits % np.uint32(scene.num_lights)).astype(np.int32)
    lv = np.asarray(scene.light_pos)[lidx]
    lu1 = jnp.asarray(np.asarray(rng.uniform(seed, jnp.uint32(1), 4)))
    lu2 = jnp.asarray(np.asarray(rng.uniform(seed, jnp.uint32(1), 5)))
    pos1 = np.asarray(o1)
    lp, _le, _lpdf = sample_triangle_light(
        jnp.asarray(lv[:, 0]), jnp.asarray(lv[:, 1]), jnp.asarray(lv[:, 2]),
        jnp.ones((n, 3)), jnp.asarray(pos1), lu1, lu2)
    lp = np.asarray(lp)
    sd = lp - pos1
    sdist = np.linalg.norm(sd, axis=-1)
    sdn = sd / np.maximum(sdist, 1e-12)[:, None]
    sets["shadow1"] = (pos1, sdn, sdist - 0.01, p1 * 0 + 1, live1)

    for G in args.groups:
        nb = -(-n_real // G)
        blo = np.full((nb, 3), np.inf, np.float32)
        bhi = np.full((nb, 3), -np.inf, np.float32)
        rl = cl_lo[real]
        rh = cl_hi[real]
        for b in range(nb):
            blo[b] = rl[b * G : (b + 1) * G].min(0)
            bhi[b] = rh[b * G : (b + 1) * G].max(0)
        print(f"\n== bins of {G} leaves ({G*leaf} tri slots): {nb} bins ==")

        jlo, jhi = jnp.asarray(blo), jnp.asarray(bhi)

        @jax.jit
        def entry(o, d, tmax):
            inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
            t0 = (jlo[None] - o[:, None]) * inv[:, None]
            t1 = (jhi[None] - o[:, None]) * inv[:, None]
            tn = jnp.maximum(jnp.minimum(t0, t1).max(-1), 0.0)
            tf = jnp.minimum(jnp.maximum(t0, t1).min(-1), tmax[:, None])
            return jnp.where(tf >= tn, tn, jnp.inf)

        for name, (oo, dd, tt, pp, live) in sets.items():
            big = np.full_like(tt, 1e30)
            e_inf = np.asarray(entry(jnp.asarray(oo), jnp.asarray(dd), jnp.asarray(big)))
            e_or = np.asarray(entry(jnp.asarray(oo), jnp.asarray(dd),
                                    jnp.asarray(np.where(pp >= 0, tt * 1.0001, big))))
            v_inf = np.isfinite(e_inf).sum(1)[live].mean()
            v_or = np.isfinite(e_or).sum(1)[live].mean()
            # block-UNION votes after the integrator's coherence sort: the
            # work a block-voted sweep at that granularity would do
            for kname, skey in (
                ("octant-morton",
                 np.asarray(_ray_sort_key(scene, jnp.asarray(oo), jnp.asarray(dd),
                                          jnp.asarray(~live)))),
                ("first-bin",
                 np.where(np.isfinite(e_inf).any(1),
                          np.argmax(np.isfinite(e_inf), 1), 1 << 20)),
            ):
                order = np.argsort(skey, kind="stable")
                vo = np.isfinite(e_or)[order]
                lv = live[order]
                unions = []
                for B in (64, 128, 256):
                    u = vo.reshape(-1, B, vo.shape[1]).any(1).sum(1)
                    nlive = lv.reshape(-1, B).sum(1)
                    per_ray = (u * B)[nlive > 0].sum() / max(lv.sum(), 1)
                    unions.append(f"U{B}={u[nlive>0].mean():.1f}({per_ray:.1f}/ray)")
                print(f"  {name:9s} union {kname:13s}: " + " ".join(unions))
            # rank of winning bin: for closest sets, the bin whose entry == min
            # entry among bins with entry <= oracle t; rank in sorted entry order
            hit = (pp >= 0) & live
            if name.startswith("shadow"):
                print(f"  {name:9s} votes/ray inf={v_inf:7.1f} oracle={v_or:7.1f}")
                continue
            finite = np.isfinite(e_or)
            # winning bin = the voted bin with the LARGEST entry among oracle
            # votes (hit is inside it); rank = its position in the ray's
            # front-to-back order among inf-tmax votes
            last_entry = np.where(finite, e_or, -np.inf).max(1)
            rank = (np.where(np.isfinite(e_inf), e_inf, np.inf)
                    <= last_entry[:, None] + 1e-6).sum(1)
            r = rank[hit]
            print(f"  {name:9s} votes/ray inf={v_inf:7.1f} oracle={v_or:7.1f} "
                  f"| rounds-to-hit mean={r.mean():5.2f} p50={np.percentile(r,50):.0f} "
                  f"p90={np.percentile(r,90):.0f} p99={np.percentile(r,99):.0f} max={r.max()}")


if __name__ == "__main__":
    main()
