#!/usr/bin/env python
"""Offline study: tri-tests/ray vs leaf size for the cluster-sweep BVH.

Uses rays + oracle hit distances captured from a real staircase2 trace
(/tmp/stair_rays.npz, /tmp/stair_tris.npy) and evaluates, in numpy:

  for leaf_target in {8,16,32,64}:
    - REAL SAH leaves (variable size <= target, padded) vs FIXED-size cuts
      of the SAH DFS order (what scene/data.py does today)
    - votes/ray with oracle t_max (distance-culled lower bound)
    - per-(ray-block) union votes for block sizes of interest

The product (votes x leaf) is the tri-test work per ray; this decides the
sweep kernel's layout (leaf granularity / block size).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from gpuspectral_tpu.bvh.sah import sah_dfs_order  # noqa: E402


def leaves_from_sah(tri_pos, leaf_target):
    """Run the SAH builder but also return leaf boundaries."""
    # re-run ordering, then recover leaf extents by re-walking: simplest is
    # to instrument via a tweaked copy of the builder
    from gpuspectral_tpu.bvh import sah as sahmod

    pos = tri_pos.astype(np.float64)
    tlo = pos.min(axis=1)
    thi = pos.max(axis=1)
    cen = 0.5 * (tlo + thi)
    n_total = pos.shape[0]
    order_out = np.empty(n_total, np.int64)
    sizes = []
    out_at = 0
    stack = [np.arange(n_total)]
    BINS = sahmod.BINS
    _sa = sahmod._sa
    while stack:
        idx = stack.pop()
        n = idx.shape[0]
        if n <= leaf_target:
            order_out[out_at : out_at + n] = idx
            out_at += n
            sizes.append(n)
            continue
        c = cen[idx]
        cmin = c.min(axis=0); cmax = c.max(axis=0); ext = cmax - cmin
        best_cost = np.inf; best = None
        for axis in range(3):
            if ext[axis] <= 1e-12:
                continue
            b = ((c[:, axis] - cmin[axis]) * (BINS / ext[axis])).astype(np.int64)
            np.clip(b, 0, BINS - 1, out=b)
            counts = np.bincount(b, minlength=BINS)
            blo = np.full((BINS, 3), np.inf); bhi = np.full((BINS, 3), -np.inf)
            np.minimum.at(blo, b, tlo[idx]); np.maximum.at(bhi, b, thi[idx])
            llo = np.minimum.accumulate(blo, 0); lhi = np.maximum.accumulate(bhi, 0)
            rlo = np.minimum.accumulate(blo[::-1], 0)[::-1]
            rhi = np.maximum.accumulate(bhi[::-1], 0)[::-1]
            lcnt = np.cumsum(counts); rcnt = n - lcnt
            cost = np.where((lcnt[:-1] > 0) & (rcnt[:-1] > 0),
                            _sa(llo[:-1], lhi[:-1]) * lcnt[:-1] + _sa(rlo[1:], rhi[1:]) * rcnt[:-1],
                            np.inf)
            k = int(np.argmin(cost))
            if cost[k] < best_cost:
                best_cost = cost[k]; best = (axis, k, b)
        if best is None:
            mid = n // 2
            stack.append(idx[mid:]); stack.append(idx[:mid]); continue
        axis, k, b = best
        go = b <= k
        left, right = idx[go], idx[~go]
        if left.size == 0 or right.size == 0:
            mid = n // 2; left, right = idx[:mid], idx[mid:]
        stack.append(right); stack.append(left)
    return order_out, np.array(sizes)


def cluster_bounds(tri_pos, order, boundaries):
    """AABBs for clusters given [start, end) boundaries into `order`."""
    lo = np.empty((len(boundaries), 3), np.float32)
    hi = np.empty((len(boundaries), 3), np.float32)
    tlo = tri_pos.min(axis=1); thi = tri_pos.max(axis=1)
    for i, (s, e) in enumerate(boundaries):
        ids = order[s:e]
        lo[i] = tlo[ids].min(0); hi[i] = thi[ids].max(0)
    return lo, hi


import jax
import jax.numpy as jnp


@jax.jit
def _votes_chunk(o, d, tmax, lo, hi):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    t0 = (lo[None] - o[:, None]) * inv[:, None]
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    tn = jnp.maximum(jnp.minimum(t0, t1).max(-1), 0.0)
    tf = jnp.minimum(jnp.maximum(t0, t1).min(-1), tmax[:, None])
    return tf >= tn


def votes(o, d, tmax, lo, hi, chunk=16384):
    r = o.shape[0]
    out = []
    lo = jnp.asarray(lo, jnp.float32); hi = jnp.asarray(hi, jnp.float32)
    for s in range(0, r, chunk):
        e = min(s + chunk, r)
        out.append(np.asarray(_votes_chunk(
            jnp.asarray(o[s:e]), jnp.asarray(d[s:e]), jnp.asarray(tmax[s:e]), lo, hi)))
    return np.concatenate(out)


def main():
    tris = np.load("/tmp/stair_tris.npy")
    rays = np.load("/tmp/stair_rays.npz")
    sets = {
        "primary": (rays["o"], rays["d"], np.where(rays["hit"], rays["t"] * 1.0001, 1e30)),
        "bounce1": (rays["o1"], rays["d1"], np.where(rays["hit1"], rays["t1"] * 1.0001,
                                                     np.where(rays["hit"], 1e30, -1.0))),
        "shadow": (rays["os"], rays["ds"], np.where(rays["hits"], rays["ts"], -1.0)),
    }

    for leaf in (8, 16, 32, 64):
        order, sizes = leaves_from_sah(tris, leaf)
        # REAL leaves
        bnd = []
        at = 0
        for s in sizes:
            bnd.append((at, at + s)); at += s
        lo, hi = cluster_bounds(tris, order, bnd)
        # FIXED cuts of the same order
        n = order.shape[0]
        bnd_f = [(s, min(s + leaf, n)) for s in range(0, n, leaf)]
        lof, hif = cluster_bounds(tris, order, bnd_f)
        print(f"\nleaf={leaf}: real leaves={len(sizes)} (mean {sizes.mean():.1f}), fixed={len(bnd_f)}")
        for name, (o, d, tm) in sets.items():
            v_real = votes(o, d, tm, lo, hi)
            v_fix = votes(o, d, tm, lof, hif)
            live = tm[:, ] > 0
            pr_r = v_real.sum(1)[live].mean()
            pr_f = v_fix.sum(1)[live].mean()
            line = (f"  {name:8s} votes/ray real={pr_r:6.1f} fixed={pr_f:6.1f} "
                    f"tests/ray real={pr_r * sizes.mean():7.0f} fixed={pr_f * leaf:7.0f}")
            for B in (128, 512):
                nb = v_fix.shape[0] // B
                vb = v_fix[: nb * B].reshape(nb, B, -1).any(1).sum(-1).mean()
                line += f" | B{B}: {vb:6.1f} ({vb * leaf:7.0f}t)"
            print(line)


if __name__ == "__main__":
    main()
