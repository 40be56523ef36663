"""Flattened cluster-sweep intersection for BVH-scale scenes (TPU Pallas).

The reference gets hierarchy traversal for free from RT cores
(`VulkanRays.cpp`, `traceRayEXT`).  A per-ray divergent tree walk is the
wrong shape for a TPU, and even packet traversal (bvh/traverse.py) executes
as thousands of tiny scalar-voted node steps per packet — measured 0.13
Mrays/s on a 31k-triangle scene.  This module replaces the *walk* with a
*sweep* over the LBVH's Morton-ordered leaf clusters, reformulated as dense
vector work plus real branches at cluster granularity:

  kernel A (votes): for every (ray block, supernode) — a supernode is a
    contiguous run of K clusters, so a Morton/LBVH subtree range — one dense
    slab test with supernodes in lanes.  Emits an (n_blocks, S) int32 vote
    matrix.  O(R x S) elementwise work with S <= 1024.
  kernel B (sweep): per ray block, loop supernodes; `@pl.when(vote == 0)`
    skips unvoted ones entirely (votes arrive through SMEM — the only
    memory the scalar unit can read); voted supernodes Woop-test their
    clusters' 64-triangle leaves as dense (B, 64) tiles with triangles in
    lanes, folding min/argmin (+ u, v) into VMEM scratch.

Morton order makes supernodes spatially tight, so votes cull like a 2-level
BVH while every surviving test runs at full VPU width.  The integrator's
`sort_rays` tightens votes further for bounce rays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
# Raised scoped-VMEM budget: the default 16 MB limit is a compiler guardrail,
# not the physical VMEM size; the sweep wants the woop table + per-lane best
# planes + hoisted ray broadcasts resident.
_VMEM_LIMIT = 100 * 1024 * 1024
BLOCK = 256  # rays per grid step (sublane-major; intermediates are (B, 128)).
# Small blocks are the whole game: the vote union over B sorted rays grows
# ~logarithmically in B (measured staircase2: 27 leaf votes at B=128 vs 86 at
# B=1024 for bounce rays), so smaller blocks test far fewer slots per ray.
LANE = 128
MAX_SUPERNODES = 1024
SWEEP = 128  # triangle slots per gated test: dynamic lane slices must be 128
#              wide, so the sweep visits SWEEP/leaf_size adjacent clusters


# ---------------------------------------------------------------------------
# kernel A: votes
# ---------------------------------------------------------------------------


def _inv_dir(dx):
    mag = jnp.maximum(jnp.abs(dx), 1e-12)
    return 1.0 / jnp.where(dx < 0, -mag, mag)


def _slab_chunk(o, di, tmin, tmax, lo, hi):
    """(B,1) rays x ((1,C) per-axis bounds) -> (B,C) AABB overlap mask."""
    t0x = (lo[0] - o[0]) * di[0]
    t1x = (hi[0] - o[0]) * di[0]
    t0y = (lo[1] - o[1]) * di[1]
    t1y = (hi[1] - o[1]) * di[1]
    t0z = (lo[2] - o[2]) * di[2]
    t1z = (hi[2] - o[2]) * di[2]
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), tmin),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), tmax),
    )
    return t_far >= t_near


def _votes_kernel(o_ref, d_ref, tmin_ref, tmax_ref, blo_ref, bhi_ref, votes_ref,
                  *, n_chunks):
    o = (o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3])
    di = (_inv_dir(d_ref[:, 0:1]), _inv_dir(d_ref[:, 1:2]), _inv_dir(d_ref[:, 2:3]))
    tmin = tmin_ref[:, 0:1]
    tmax = tmax_ref[:, 0:1]
    for c in range(n_chunks):  # static: S/LANE <= 8
        sl = pl.ds(c * LANE, LANE)
        lo = (blo_ref[0, sl][None, :], blo_ref[1, sl][None, :], blo_ref[2, sl][None, :])
        hi = (bhi_ref[0, sl][None, :], bhi_ref[1, sl][None, :], bhi_ref[2, sl][None, :])
        hit = _slab_chunk(o, di, tmin, tmax, lo, hi)
        vote = jnp.any(hit, axis=0, keepdims=True).astype(jnp.int32)
        # (8, LANE) broadcast: VMEM output blocks need sublane dim % 8
        votes_ref[:, sl] = jnp.broadcast_to(vote, (8, LANE))


# ---------------------------------------------------------------------------
# kernel B: gated leaf sweep
# ---------------------------------------------------------------------------


def _broadcast_rays(o_ref, d_ref, rays_s):
    """Hoist the (B,1)->(B,SWEEP) lane broadcasts of the six ray components
    out of the per-leaf loop into VMEM scratch (done once per block; the
    sweep then reads full-width planes at vector rate instead of
    re-broadcasting columns for every leaf)."""
    shape = (rays_s.shape[1], rays_s.shape[2])
    for c in range(3):
        rays_s[c] = jnp.broadcast_to(o_ref[:, c : c + 1], shape)
        rays_s[3 + c] = jnp.broadcast_to(d_ref[:, c : c + 1], shape)


def _woop_sweep(woop_ref, off, ox, oy, oz, dx, dy, dz):
    """One 128-triangle (cluster pair) Woop sweep at triangle offset `off`.
    All operands are full-width (B,SWEEP) planes; returns (t, u, v, live)
    with NO reductions — best-tracking is elementwise in the caller
    (ops/woop.py unit-triangle test semantics)."""
    sl = pl.ds(pl.multiple_of(off, SWEEP), SWEEP)
    r = [woop_ref[i, sl][None, :] for i in range(12)]
    ax0, ax1, ax2, ay0, ay1, ay2, az0, az1, az2, bx, by, bz = r
    opz = ox * az0 + oy * az1 + oz * az2 + bz
    dpz = dx * az0 + dy * az1 + dz * az2
    live = jnp.abs(dpz) > 1e-12
    t = -opz / jnp.where(live, dpz, 1.0)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    u = px * ax0 + py * ax1 + pz * ax2 + bx
    v = px * ay0 + py * ay1 + pz * ay2 + by
    ok = live & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, ok


def _sweep_closest_kernel(votes_ref, o_ref, d_ref, tmin_ref, tmax_ref, woop_ref,
                          attr_ref,
                          t_out, prim_out, u_out, v_out, attr_out,
                          rays_s, bt_s, bp_s, bu_s, bv_s, attrp_s,
                          *, n_super, super_stride, n_sweeps, n_attr):
    """Per-lane best tracking: every (ray, lane) slot keeps the closest hit
    seen in that lane position across all swept leaves (elementwise min —
    no cross-lane work in the loop); ONE argmin per block at the end folds
    the 128 lane-candidates per ray.  Ties resolve to the lowest prim id
    (lanes are DFS==prim order), matching the brute-force first-wins.

    When n_attr > 0, the fused shading-attribute rows (dfs_sweep._attr_table)
    ride the sweep: per improving hit each attr plane selects its lane value,
    and the final fold emits (B, n_attr) — the whole-table XLA gather this
    replaces measured ~20 ms per 65536 rays on v5e, 4x the sweep itself."""
    _broadcast_rays(o_ref, d_ref, rays_s)
    # per-lane running state: t init at per-ray tmax (inactive rays carry
    # tmax=-BIG, so they can never record a hit)
    tmax = tmax_ref[:, 0:1]
    bt_s[:, :] = jnp.broadcast_to(tmax, bt_s.shape)
    bp_s[:, :] = jnp.full(bp_s.shape, -1, jnp.int32)
    tmin = tmin_ref[:, 0:1]
    rays_s[6] = jnp.broadcast_to(tmin, (rays_s.shape[1], rays_s.shape[2]))

    def supernode(s, carry):
        @pl.when(votes_ref[0, s] > 0)
        def _():
            ox, oy, oz = rays_s[0], rays_s[1], rays_s[2]
            dx, dy, dz = rays_s[3], rays_s[4], rays_s[5]
            tmin_b = rays_s[6]
            lane = jax.lax.broadcasted_iota(jnp.int32, (bt_s.shape[0], SWEEP), 1)

            def leaf(k, c2):
                off = s * super_stride + k * SWEEP
                t, u, v, ok = _woop_sweep(woop_ref, off, ox, oy, oz, dx, dy, dz)
                hit = ok & (t > tmin_b) & (t < bt_s[:, :])
                bt_s[:, :] = jnp.where(hit, t, bt_s[:, :])
                bu_s[:, :] = jnp.where(hit, u, bu_s[:, :])
                bv_s[:, :] = jnp.where(hit, v, bv_s[:, :])
                bp_s[:, :] = jnp.where(hit, off + lane, bp_s[:, :])
                for a in range(n_attr):
                    row = attr_ref[a, pl.ds(pl.multiple_of(off, SWEEP), SWEEP)][None, :]
                    attrp_s[a] = jnp.where(hit, row, attrp_s[a])
                return c2

            jax.lax.fori_loop(0, n_sweeps, leaf, 0)
        return carry

    jax.lax.fori_loop(0, n_super, supernode, 0)

    # single cross-lane fold per block
    bt = bt_s[:, :]
    arg = jnp.argmin(bt, axis=1).astype(jnp.int32)[:, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, bt.shape, 1)
    first = lane == arg
    t_best = jnp.min(bt, axis=1, keepdims=True)
    found = t_best < tmax_ref[:, 0:1]
    prim = jnp.sum(jnp.where(first, bp_s[:, :], 0), axis=1, keepdims=True)
    u_best = jnp.sum(jnp.where(first, bu_s[:, :], 0.0), axis=1, keepdims=True)
    v_best = jnp.sum(jnp.where(first, bv_s[:, :], 0.0), axis=1, keepdims=True)
    t_out[:, :] = jnp.where(found, t_best, _BIG)
    prim_out[:, :] = jnp.where(found, prim, -1)
    u_out[:, :] = jnp.where(found, u_best, 0.0)
    v_out[:, :] = jnp.where(found, v_best, 0.0)
    for a in range(n_attr):
        val = jnp.sum(jnp.where(first, attrp_s[a], 0.0), axis=1, keepdims=True)
        attr_out[:, a : a + 1] = jnp.where(found, val, 0.0)


def _sweep_any_kernel(votes_ref, o_ref, d_ref, tmin_ref, tmax_ref, woop_ref,
                      occ_out, rays_s, occ_s,
                      *, n_super, super_stride, n_sweeps):
    """Any-hit: per-lane occlusion mask accumulated elementwise; one
    cross-lane fold per block at the end."""
    _broadcast_rays(o_ref, d_ref, rays_s)
    shape = (occ_s.shape[0], occ_s.shape[1])
    rays_s[6] = jnp.broadcast_to(tmin_ref[:, 0:1], shape)
    rays_s[7] = jnp.broadcast_to(tmax_ref[:, 0:1], shape)
    occ_s[:, :] = jnp.zeros(occ_s.shape, jnp.int32)

    def supernode(s, carry):
        @pl.when(votes_ref[0, s] > 0)
        def _():
            ox, oy, oz = rays_s[0], rays_s[1], rays_s[2]
            dx, dy, dz = rays_s[3], rays_s[4], rays_s[5]
            tmin_b, tmax_b = rays_s[6], rays_s[7]

            def leaf(k, c2):
                off = s * super_stride + k * SWEEP
                t, _u, _v, ok = _woop_sweep(woop_ref, off, ox, oy, oz, dx, dy, dz)
                hit = ok & (t > tmin_b) & (t < tmax_b)
                occ_s[:, :] = jnp.where(hit, 1, occ_s[:, :])
                return c2

            jax.lax.fori_loop(0, n_sweeps, leaf, 0)
        return carry

    jax.lax.fori_loop(0, n_super, supernode, 0)
    occ_out[:, :] = jnp.max(occ_s[:, :], axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _supernode_tables(node_min, node_max, n_clusters: int, padded_tris: int,
                      leaf_size: int):
    """(blo (3,Sp), bhi (3,Sp), woop-pad count, S, K): group the BVH's leaf
    clusters (DFS-contiguous) into S <= MAX_SUPERNODES supernodes of K
    clusters and reduce their AABBs.  K*leaf_size is kept a multiple of SWEEP
    so every supernode is a whole number of 128-slot sweeps.

    Padding supernodes must NEVER vote.  Inverted bounds (+BIG lo / -BIG hi)
    do NOT work for that: the slab test's per-axis min/max turns them into
    [tmin, +huge] windows that pass for every ray — with the slot-padded SAH
    build up to a third of all supernodes are padding, and each false vote
    costs a full 128-slot sweep per block (measured 186 of 512 supernodes
    voting on staircase2 bounce rays where the true union is ~30).  Padding
    boxes are therefore distant POINT boxes with distinct per-axis
    coordinates: t_near = max(axis t's) > t_far = min(axis t's) for every
    ray that does not pass exactly through the point."""
    # a non-divisor leaf_size would silently skip triangle slots at the end
    # of every supernode (align floors, n_sweeps truncates)
    assert SWEEP % leaf_size == 0, (SWEEP, leaf_size)
    first_leaf = n_clusters - 1
    cl_min = node_min[first_leaf : first_leaf + n_clusters]
    cl_max = node_max[first_leaf : first_leaf + n_clusters]
    align = max(1, SWEEP // leaf_size)
    k = -(-n_clusters // MAX_SUPERNODES)
    k = -(-k // align) * align
    s = -(-n_clusters // k)
    pad_cl = s * k - n_clusters
    if pad_cl:
        cl_min = jnp.concatenate([cl_min, jnp.full((pad_cl, 3), jnp.inf)], axis=0)
        cl_max = jnp.concatenate([cl_max, jnp.full((pad_cl, 3), -jnp.inf)], axis=0)
    sn_min = cl_min.reshape(s, k, 3).min(axis=1)
    sn_max = cl_max.reshape(s, k, 3).max(axis=1)
    sp = -(-s // LANE) * LANE
    if sp != s:
        sn_min = jnp.concatenate([sn_min, jnp.full((sp - s, 3), jnp.inf)], axis=0)
        sn_max = jnp.concatenate([sn_max, jnp.full((sp - s, 3), -jnp.inf)], axis=0)
    # all-padding supernodes (non-finite after the reduction) -> far point box
    far = jnp.asarray([2e8, 3e8, 4e8], jnp.float32)
    invalid = ~jnp.isfinite(sn_min[:, 0:1]) | (sn_min[:, 0:1] > sn_max[:, 0:1])
    sn_min = jnp.where(invalid, far, sn_min)
    sn_max = jnp.where(invalid, far, sn_max)
    tri_needed = s * k * leaf_size
    return sn_min.T, sn_max.T, max(0, tri_needed - padded_tris), s, k


def _pad_rays(origin, direction, t_min, t_max):
    r = origin.shape[0]
    nb = -(-r // BLOCK)
    pad = nb * BLOCK - r

    def padv(x, v):
        return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], v, x.dtype)]) if pad else x

    return (
        padv(origin, 0.0),
        padv(direction, 1.0),
        padv(t_min, 0.0),
        padv(t_max, -_BIG),
        nb,
        r,
    )


def _prepare(scene, origin, direction, t_min, t_max, interpret=False):
    blo, bhi, woop_pad, s, k = _supernode_tables(
        scene.bvh_node_min, scene.bvh_node_max, scene.bvh_clusters,
        scene.tri_woop_t.shape[1], scene.bvh_leaf_size,
    )
    woop_t = scene.tri_woop_t
    if woop_pad:
        woop_t = jnp.concatenate(
            [woop_t, jnp.zeros((12, woop_pad), woop_t.dtype)], axis=1
        )
    origin, direction, t_min, t_max, nb, r = _pad_rays(origin, direction, t_min, t_max)
    sp = blo.shape[1]

    spec_r3 = pl.BlockSpec((BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_r1 = pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    votes = pl.pallas_call(
        partial(_votes_kernel, n_chunks=sp // LANE),
        grid=(nb,),
        in_specs=[
            spec_r3,
            spec_r3,
            spec_r1,
            spec_r1,
            pl.BlockSpec(blo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bhi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, sp), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(origin, direction, t_min[:, None], t_max[:, None], blo, bhi)
    return woop_t, votes, origin, direction, t_min, t_max, nb, r, s, k, sp


def cluster_closest(scene, origin, direction, active=None, interpret=False):
    """Closest hit via the cluster sweep.  Same contract as
    bvh.traverse.intersect_closest_bvh: (t, prim, u, v), prim == -1 on miss,
    indices into the DFS-sorted triangle slot arrays."""
    r = origin.shape[0]
    t_max = jnp.full((r,), _BIG, jnp.float32)
    if active is not None:
        t_max = jnp.where(active, t_max, -_BIG)
    return cluster_closest_tmax(scene, origin, direction, t_max, interpret)


def cluster_closest_tmax(scene, origin, direction, t_max, interpret=False,
                         attr=None):
    """cluster_closest with an explicit per-ray t_max (inactive = -BIG).

    attr: optional (A, S) fused attribute table (dfs_sweep._attr_table) to
    gather in-kernel; when given, returns (t, prim, u, v, attrs (R, A))."""
    r = origin.shape[0]
    t_min = jnp.zeros((r,), jnp.float32)
    woop_t, votes, origin, direction, t_min, t_max, nb, r0, s, k, sp = _prepare(
        scene, origin, direction, t_min, t_max, interpret
    )
    n_attr = 0 if attr is None else int(attr.shape[0])
    attr_t = jnp.zeros((1, woop_t.shape[1]), jnp.float32) if attr is None else attr
    if attr_t.shape[1] != woop_t.shape[1]:  # match woop alignment padding
        attr_t = jnp.concatenate(
            [attr_t, jnp.zeros((attr_t.shape[0], woop_t.shape[1] - attr_t.shape[1]),
                               attr_t.dtype)], axis=1)
    a_pad = max(8, -(-n_attr // 8) * 8)

    spec_r3 = pl.BlockSpec((BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_r1 = pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out1 = lambda dt: jax.ShapeDtypeStruct((nb * BLOCK, 1), dt)
    leaf = scene.bvh_leaf_size
    t, prim, u, v, attrs = pl.pallas_call(
        partial(_sweep_closest_kernel, n_super=s, super_stride=k * leaf,
                n_sweeps=k * leaf // SWEEP, n_attr=n_attr),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, sp), lambda i: (i, 0), memory_space=pltpu.SMEM),
            spec_r3,
            spec_r3,
            spec_r1,
            spec_r1,
            pl.BlockSpec(woop_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(attr_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[spec_r1, spec_r1, spec_r1, spec_r1,
                   pl.BlockSpec((BLOCK, a_pad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[out1(jnp.float32), out1(jnp.int32), out1(jnp.float32),
                   out1(jnp.float32),
                   jax.ShapeDtypeStruct((nb * BLOCK, a_pad), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((7, BLOCK, SWEEP), jnp.float32),  # o,d,tmin broadcasts
            pltpu.VMEM((BLOCK, SWEEP), jnp.float32),  # per-lane best t
            pltpu.VMEM((BLOCK, SWEEP), jnp.int32),  # per-lane best prim
            pltpu.VMEM((BLOCK, SWEEP), jnp.float32),  # per-lane best u
            pltpu.VMEM((BLOCK, SWEEP), jnp.float32),  # per-lane best v
            pltpu.VMEM((max(1, n_attr), BLOCK, SWEEP), jnp.float32),  # attrs
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(votes, origin, direction, t_min[:, None], t_max[:, None], woop_t, attr_t)
    flat = lambda x: x.reshape(-1)[:r0]
    if attr is None:
        return flat(t), flat(prim), flat(u), flat(v)
    return flat(t), flat(prim), flat(u), flat(v), attrs[:r0, :n_attr]


def cluster_any(scene, origin, direction, t_min, t_max, active=None, interpret=False):
    """Any-hit (shadow) via the cluster sweep."""
    r = origin.shape[0]
    t_min = jnp.broadcast_to(t_min, (r,)).astype(jnp.float32)
    t_max = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    if active is not None:
        t_max = jnp.where(active, t_max, -_BIG)
    woop_t, votes, origin, direction, t_min, t_max, nb, r0, s, k, sp = _prepare(
        scene, origin, direction, t_min, t_max, interpret
    )
    spec_r3 = pl.BlockSpec((BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_r1 = pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    leaf = scene.bvh_leaf_size
    occ = pl.pallas_call(
        partial(_sweep_any_kernel, n_super=s, super_stride=k * leaf,
                n_sweeps=k * leaf // SWEEP),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, sp), lambda i: (i, 0), memory_space=pltpu.SMEM),
            spec_r3,
            spec_r3,
            spec_r1,
            spec_r1,
            pl.BlockSpec(woop_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec_r1,
        out_shape=jax.ShapeDtypeStruct((nb * BLOCK, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, BLOCK, SWEEP), jnp.float32),  # o,d,tmin,tmax broadcasts
            pltpu.VMEM((BLOCK, SWEEP), jnp.int32),  # per-lane occlusion
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(votes, origin, direction, t_min[:, None], t_max[:, None], woop_t)
    return occ.reshape(-1)[:r0] != 0
