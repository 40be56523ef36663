#!/usr/bin/env python
"""Numpy simulation of the front-to-back traversal's round counts.

For the bench_binned ray set on a real scene, reports per-ray voted bins,
per-block vote unions, and the exact number of front-to-back rounds the
ftb kernel executes per block (processing bins in global-nearest order
with per-lane t_best culling, using the true closest-hit distances)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/src/GPUSpectral/assets/scenes"


def slab(o, d, bounds, tmax):
    """tn (R, C) entry distances; BIG where missed."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)
    lo = bounds[0:3].T[None]  # (1, C, 3)
    hi = bounds[3:6].T[None]
    t0 = (lo - o[:, None]) * inv[:, None]
    t1 = (hi - o[:, None]) * inv[:, None]
    tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
    tf = np.minimum(np.maximum(t0, t1).min(-1), tmax[:, None])
    return np.where(tf >= tn, tn, 1e30)


def ftb_rounds(tn, t_final):
    """Exact per-block round count for the ftb closest loop, assuming a
    lane's t_best jumps to its final t the first time a bin containing its
    hit... conservatively: t_best stays at tmax until the lane's first
    PROCESSED bin with tn <= t_final, then becomes t_final."""
    r, c = tn.shape
    t_best = np.full(r, 1e30)
    vis = np.zeros(c, bool)
    t_fin = t_final.copy()
    rounds = 0
    while True:
        act = np.where(~vis[None, :], tn, 1e30)
        act = np.where(act < t_best[:, None], act, 1e30)
        mn = act.min()
        if mn >= 1e30:
            return rounds
        binv = np.unravel_index(np.argmin(act), act.shape)[1]
        # lanes whose hit lies in this bin commit (approx: hit bin = the bin
        # whose tn <= t_final and is processed; once processed, t_best=t_final)
        commit = (tn[:, binv] <= t_fin) & (t_fin < 1e29)
        t_best = np.where(commit, t_fin, t_best)
        vis[binv] = True
        rounds += 1


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else f"{REF}/staircase2/scene.xml"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp

    from gpuspectral_tpu.scene import load_mitsuba_scene

    scene, _ = load_mitsuba_scene(scene_path)
    print(f"tris={scene.num_tris} bins={scene.bvh_bins} slots={scene.bvh_bin_slots}")

    rs = np.random.default_rng(0)
    tp = np.asarray(scene.tri_pos[: scene.num_tris])
    ti = rs.integers(0, scene.num_tris, n)
    bc = rs.dirichlet((1, 1, 1), n).astype(np.float32)
    o = np.einsum("rk,rkc->rc", bc, tp[ti])
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nrm = np.cross(tp[ti, 1] - tp[ti, 0], tp[ti, 2] - tp[ti, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    d = np.where((d * nrm).sum(-1, keepdims=True) < 0, -d, d)
    o = (o + 1e-4 * nrm).astype(np.float32)

    from gpuspectral_tpu.integrator.path_tracer import _ray_sort_key

    key = np.asarray(_ray_sort_key(scene, jnp.asarray(o), jnp.asarray(d),
                                   jnp.zeros((n,), bool)))
    order = np.argsort(key)
    o, d = o[order], d[order]

    bounds = np.asarray(scene.bvh_bin_bounds)[:, : scene.bvh_bins]
    tmax = np.full(n, 1e30, np.float32)

    # true closest-hit t via the woop-free brute force (chunked)
    from gpuspectral_tpu.ops.intersect import intersect_closest

    ts = []
    for i in range(0, n, 8192):
        t, prim, _, _ = intersect_closest(jnp.asarray(o[i : i + 8192]),
                                          jnp.asarray(d[i : i + 8192]),
                                          scene.tri_pos)
        ts.append(np.where(np.asarray(prim) >= 0, np.asarray(t), 1e30))
    t_final = np.concatenate(ts)

    B = 128
    votes_per_ray = []
    unions = []
    rounds = []
    live_end = []
    nblocks = min(n // B, 64)  # sample blocks
    for b in range(nblocks):
        sl = slice(b * B, (b + 1) * B)
        tn = slab(o[sl], d[sl], bounds, tmax[sl])
        voted = tn < 1e29
        votes_per_ray.append(voted.sum(1).mean())
        unions.append(voted.any(0).sum())
        rounds.append(ftb_rounds(tn, t_final[sl]))
        # bins strictly nearer than the final hit (lower bound on rounds)
        live_end.append((tn < t_final[sl][:, None]).any(0).sum())
    print(f"votes/ray        mean {np.mean(votes_per_ray):6.1f}")
    print(f"union/block      mean {np.mean(unions):6.1f}  max {np.max(unions)}")
    print(f"ftb rounds/block mean {np.mean(rounds):6.1f}  max {np.max(rounds)}")
    print(f"lower bound      mean {np.mean(live_end):6.1f}")


if __name__ == "__main__":
    main()


def group_rounds(tn, t_final, g):
    """ftb rounds when the 128-ray block is split into groups of g rays,
    each picking its own bin per round (block time = max over groups)."""
    r, c = tn.shape
    per_group = []
    for s in range(0, r, g):
        per_group.append(ftb_rounds(tn[s:s+g], t_final[s:s+g]))
    return max(per_group), sum(per_group) / len(per_group)
