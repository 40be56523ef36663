"""Binned-wavefront BVH traversal: per-ray votes, fused multi-round sweeps.

This is the round-3 replacement for the block-voted kernels
(bvh/cluster_sweep.py, bvh/dfs_sweep.py) — the RT-core role of the
reference's `traceRayEXT` (assets/shaders/raygen.rgen:58,
backend/vulkan/VulkanRays.cpp:6-86), reformulated around what a TPU is
actually good at: dense lockstep sweeps over VMEM-resident tables, instead
of per-lane tree walks it cannot do.

Why the round-2 kernels plateaued at ~1.3 Mrays/s on 31k tris: a vote shared
by a whole ray block does the work of the UNION of its rays' votes.
Measured on staircase2 (tools/measure_votes2.py, SAH bins of 128 triangle
slots): one ray's segment pierces ~7-8 bins (closest) / ~12 (shadow), but
the union over even 128 coherence-sorted rays is 17-28 / 66 — and at the old
kernels' 1024-ray blocks the union was effectively the whole scene.

Design (everything happens inside ONE `pallas_call` per query — a first
attempt that orchestrated per-bin rounds from XLA measured a 15-30 ms/round
floor in sorts/scatters/dispatch, 100x the kernel work itself):

  1. VOTE: each 128-ray block slab-tests all C bin AABBs with bins riding
     the LANE dimension — ~20 fully-vectorized ops on (16, C) tiles per 16
     rays.  (A scalar-driven per-bin loop measured 46 ms / 65k rays; this
     form is ~0.5 ms.)  Votes pack into 24-bit words on the MXU: vote
     (16, C) @ pack24 (C, W) with 2^(c%24) weights gives exact f32 word
     values < 2^24.
  2. TRAVERSE: while any lane has votes, the block takes the MINIMUM voted
     bin across lanes (every lane holding that bit is at its own minimum,
     so clearing it from all lanes loses nothing), sweeps that bin's
     triangle slots from the VMEM-resident Woop table with a dynamic lane
     slice, folds per-lane best (t, u, v, prim), and clears the bit.  The
     iteration count per block is exactly the block's vote UNION — but with
     per-lane acceptance masks, each lane only ever commits hits from bins
     it voted for, and per-lane t_best tightens monotonically.
  3. Shadow rays early-out: a lane's words clear on first occlusion, and
     the block exits when all words drain.

Shading attributes are NOT gathered in-kernel (a per-lane best-attr fold
costs as much as the sweep itself); the caller gathers rows for the winning
prim ids once per query (bvh/dfs_sweep._attr_table layout).

Gradients: `binned_closest_diff` wraps the forward in the same custom_vjp
scheme as bvh/dfs_sweep.closest_diff — backward re-evaluates each ray's hit
triangle's Woop test differentiably (exact t/u/v derivatives w.r.t. the
ray; static scene geometry carries no gradient, as the reference's BLAS
cache assumes).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dfs_sweep import _attr_table, _woop_eval_rows, unpack_meta  # noqa: F401

_BIG = 1e30
_BIGI = 1 << 30  # python int: a module-level jnp scalar would be captured
# as a pallas kernel constant (unsupported)
_VMEM_LIMIT = 110 * 1024 * 1024

MAX_BINS = 512  # vote width budget (lanes)
WORD_BITS = 24  # bits per packed vote word (f32-exact MXU packing)
BLOCK_R = 128  # rays per kernel block
LANE = 128  # triangle slots per sweep chunk
# Largest Woop table the fused kernel keeps VMEM-resident (12 rows * 4 B per
# slot).  Above this, callers fall back to the block-voted kernels.
MAX_VMEM_SLOTS = 208 * 1024  # 12*4*208k ~= 10 MB


def build_bins(node_min, node_max, n_clusters: int, n_clusters_real: int,
               leaf_size: int, max_bins: int = MAX_BINS,
               slots_per_bin: int = 0):
    """Group consecutive SAH leaves into sweep bins.

    Returns (bounds (6, ceil(C/WORD_BITS)*WORD_BITS) float32, n_bins,
    slots_per_bin).  Bin b covers triangle slots [b*slots, (b+1)*slots) of
    the slot-ordered triangle arrays; slots is the smallest multiple of LANE
    with ceil(real_leaves / (slots/leaf_size)) <= max_bins.  Scenes too big
    for VMEM-resident tables use a larger cap: the streaming megakernel
    DMAs one bin per traversal round, and finer bins mean one 128-slot
    sweep per round plus tighter front-to-back culling.

    Padding bins are distant POINT boxes with distinct per-axis coordinates
    (t_near > t_far for every ray under finite f32 slab math) — +/-1e30
    sentinels overflow to inf when multiplied by a 1e12 inverse direction
    and voted TRUE for every ray (a measured 38-votes/ray phantom).
    """
    assert LANE % leaf_size == 0, (LANE, leaf_size)
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    first_leaf = n_clusters - 1
    lo = node_min[first_leaf : first_leaf + n_clusters_real]
    hi = node_max[first_leaf : first_leaf + n_clusters_real]

    # leaves per bin: start at slots_per_bin (the slot layout's bin stride,
    # bvh/build.BIN_TARGET, so bin bounds land exactly on subtree-cut
    # boundaries), or one 128-slot chunk when unspecified; double until the
    # bin count fits the vote/entry-matrix width budget
    g = (slots_per_bin or LANE) // leaf_size
    while -(-n_clusters_real // g) > max_bins:
        g *= 2
    n_bins = -(-n_clusters_real // g)
    slots = g * leaf_size

    # far point boxes: lo == hi == (1e17, 2e17, 3e17); products with inverse
    # directions (|inv| <= 1e12) stay finite, and distinct per-axis t values
    # make t_near > t_far for every ray not passing exactly through the point
    far = np.array([1e17, 2e17, 3e17], np.float32)
    blo = np.tile(far, (n_bins, 1))
    bhi = np.tile(far, (n_bins, 1))
    for b in range(n_bins):
        chunk_lo = lo[b * g : (b + 1) * g]
        chunk_hi = hi[b * g : (b + 1) * g]
        # empty (padding) leaves inside the group carry +/-inf bounds; they
        # must not poison the group box
        ok = np.isfinite(chunk_lo).all(1) & np.isfinite(chunk_hi).all(1)
        if ok.any():
            blo[b] = chunk_lo[ok].min(0)
            bhi[b] = chunk_hi[ok].max(0)
    padded = -(-n_bins // WORD_BITS) * WORD_BITS
    bounds = np.tile(far, (2, padded, 1)).transpose(0, 2, 1).reshape(6, padded)
    bounds[0:3, :n_bins] = blo.T
    bounds[3:6, :n_bins] = bhi.T
    return np.ascontiguousarray(bounds), int(n_bins), int(slots)


def fused_eligible(scene) -> bool:
    """Whether the fused kernel can keep this scene's Woop table in VMEM."""
    return scene.tri_woop_t.shape[1] <= MAX_VMEM_SLOTS


# ---------------------------------------------------------------------------
# the fused kernel
# ---------------------------------------------------------------------------


def _inv_dir1(dx):
    mag = jnp.maximum(jnp.abs(dx), 1e-12)
    return 1.0 / jnp.where(dx < 0, -mag, mag)


_VCHUNK = 16  # rays per vectorized vote chunk (sublane dimension)


def _pack_matrix(c_pad: int):
    """(C, C/WORD_BITS) f32: pack[c, c//24] = 2^(c%24).  All values are
    powers of two (bf16-exact), row sums < 2^24 (f32-exact accumulation)."""
    c = np.arange(c_pad)
    m = np.zeros((c_pad, c_pad // WORD_BITS), np.float32)
    m[c, c // WORD_BITS] = (1 << (c % WORD_BITS)).astype(np.float32)
    return jnp.asarray(m)


def _vote_words(bounds_ref, pack_ref, o_ref, d_ref, tmax_ref, words_ref):
    """Fill words_ref (BLOCK_R, W) int32 with 24-bit packed slab votes."""
    lox = bounds_ref[0:1, :]
    loy = bounds_ref[1:2, :]
    loz = bounds_ref[2:3, :]
    hix = bounds_ref[3:4, :]
    hiy = bounds_ref[4:5, :]
    hiz = bounds_ref[5:6, :]

    def do(i, _):
        sl = pl.ds(i * _VCHUNK, _VCHUNK)
        ox = o_ref[sl, 0:1]
        oy = o_ref[sl, 1:2]
        oz = o_ref[sl, 2:3]
        ix = _inv_dir1(d_ref[sl, 0:1])
        iy = _inv_dir1(d_ref[sl, 1:2])
        iz = _inv_dir1(d_ref[sl, 2:3])
        tmax = tmax_ref[sl, 0:1]
        t0x = (lox - ox) * ix
        t1x = (hix - ox) * ix
        t0y = (loy - oy) * iy
        t1y = (hiy - oy) * iy
        t0z = (loz - oz) * iz
        t1z = (hiz - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), tmax),
        )
        vote = (tf >= tn).astype(jnp.float32)
        packed = jnp.dot(vote, pack_ref[:, :], preferred_element_type=jnp.float32)
        words_ref[sl, :] = packed.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, BLOCK_R // _VCHUNK, do, 0)


def _ffs24(words):
    """Per-lane index of the lowest set bit across (B, W) 24-bit words;
    _BIGI where empty.  The bit index of an isolated low bit comes from its
    f32 exponent (exact for powers of two < 2^24) — Mosaic-safe, no
    population_count."""
    b, w = words.shape
    nxt = jnp.full((b,), _BIGI, jnp.int32)
    for wi in reversed(range(w)):
        word = words[:, wi]
        has = word != 0
        low = (word & -word).astype(jnp.float32)  # power of two, exact
        bit = (jax.lax.bitcast_convert_type(low, jnp.int32) >> 23) - 127
        nxt = jnp.where(has, wi * WORD_BITS + bit, nxt)
    return nxt


def _woop_chunk_at(woop_ref, off, ox, oy, oz, dx, dy, dz):
    """One LANE-wide Woop sweep at dynamic slot offset `off` (ops/woop.py
    unit-triangle test; operands (BLOCK_R, LANE))."""
    sl = pl.ds(pl.multiple_of(off, LANE), LANE)
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


def _clear_bit(words, binv):
    """Clear bit `binv` (scalar) from every lane's words."""
    w = words.shape[1]
    w_idx = binv // WORD_BITS
    mask = ~(jnp.int32(1) << (binv % WORD_BITS))
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    return jnp.where(iw == w_idx, words & mask, words)


def _make_fused_closest_kernel(c_pad: int, slots: int):
    n_words = c_pad // WORD_BITS
    chunks = slots // LANE
    shape = (BLOCK_R, LANE)

    def kernel(bounds_ref, pack_ref, o_ref, d_ref, tmax_ref, woop_ref,
               t_out, prim_out, u_out, v_out, words_s):
        _vote_words(bounds_ref, pack_ref, o_ref, d_ref, tmax_ref, words_s)
        ox = jnp.broadcast_to(o_ref[:, 0:1], shape)
        oy = jnp.broadcast_to(o_ref[:, 1:2], shape)
        oz = jnp.broadcast_to(o_ref[:, 2:3], shape)
        dx = jnp.broadcast_to(d_ref[:, 0:1], shape)
        dy = jnp.broadcast_to(d_ref[:, 1:2], shape)
        dz = jnp.broadcast_to(d_ref[:, 2:3], shape)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

        def cond(st):
            return jnp.any(st[0] != 0)

        def body(st):
            words, bt, bu, bv, bp = st
            nxt = _ffs24(words)
            binv = jnp.min(nxt)  # scalar; every lane holding it is at its min
            accept = (nxt == binv)[:, None]
            base = binv * slots
            for c in range(chunks):
                t, u, v, ok = _woop_chunk_at(
                    woop_ref, base + c * LANE, ox, oy, oz, dx, dy, dz)
                hit = ok & accept & (t > 0.0) & (t < bt[:, 0:1])
                tm = jnp.where(hit, t, _BIG)
                t_it = jnp.min(tm, axis=1, keepdims=True)
                improved = t_it < bt
                arg = jnp.argmin(tm, axis=1).astype(jnp.int32)[:, None]
                first = (lane == arg) & hit
                u_it = jnp.sum(jnp.where(first, u, 0.0), axis=1, keepdims=True)
                v_it = jnp.sum(jnp.where(first, v, 0.0), axis=1, keepdims=True)
                s_it = jnp.sum(jnp.where(first, base + c * LANE + lane, 0),
                               axis=1, keepdims=True)
                bt = jnp.where(improved, t_it, bt)
                bu = jnp.where(improved, u_it, bu)
                bv = jnp.where(improved, v_it, bv)
                bp = jnp.where(improved, s_it, bp)
            words = _clear_bit(words, binv)
            return words, bt, bu, bv, bp

        init = (
            words_s[:, :],
            jnp.minimum(tmax_ref[:, 0:1], _BIG),
            jnp.zeros((BLOCK_R, 1), jnp.float32),
            jnp.zeros((BLOCK_R, 1), jnp.float32),
            jnp.full((BLOCK_R, 1), -1, jnp.int32),
        )
        _, bt, bu, bv, bp = jax.lax.while_loop(cond, body, init)
        found = bp >= 0
        t_out[:, :] = jnp.where(found, bt, _BIG)
        prim_out[:, :] = bp
        u_out[:, :] = bu
        v_out[:, :] = bv

    return kernel


def _make_fused_any_kernel(c_pad: int, slots: int):
    n_words = c_pad // WORD_BITS
    chunks = slots // LANE
    shape = (BLOCK_R, LANE)

    def kernel(bounds_ref, pack_ref, o_ref, d_ref, tmin_ref, tmax_ref,
               woop_ref, occ_out, words_s):
        _vote_words(bounds_ref, pack_ref, o_ref, d_ref, tmax_ref, words_s)
        ox = jnp.broadcast_to(o_ref[:, 0:1], shape)
        oy = jnp.broadcast_to(o_ref[:, 1:2], shape)
        oz = jnp.broadcast_to(o_ref[:, 2:3], shape)
        dx = jnp.broadcast_to(d_ref[:, 0:1], shape)
        dy = jnp.broadcast_to(d_ref[:, 1:2], shape)
        dz = jnp.broadcast_to(d_ref[:, 2:3], shape)
        tmin = tmin_ref[:, 0:1]
        tmax = tmax_ref[:, 0:1]

        def cond(st):
            return jnp.any(st[0] != 0)

        def body(st):
            words, occ = st  # occ: int32 0/1 (i1 loop carries trip Mosaic)
            nxt = _ffs24(words)
            binv = jnp.min(nxt)
            accept = (nxt == binv)[:, None]
            base = binv * slots
            hit_any = jnp.zeros((BLOCK_R, 1), jnp.int32)
            for c in range(chunks):
                t, _u, _v, ok = _woop_chunk_at(
                    woop_ref, base + c * LANE, ox, oy, oz, dx, dy, dz)
                h = ok & (t > tmin) & (t < tmax)
                hit_any = jnp.maximum(hit_any,
                                      jnp.max(h.astype(jnp.int32), axis=1,
                                              keepdims=True))
            occ = jnp.where((hit_any != 0) & accept, 1, occ)
            words = _clear_bit(words, binv)
            words = jnp.where(occ != 0, 0, words)  # early-out: occluded lanes drain
            return words, occ

        init = (words_s[:, :], jnp.zeros((BLOCK_R, 1), jnp.int32))
        _, occ = jax.lax.while_loop(cond, body, init)
        occ_out[:, :] = occ

    return kernel


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


def _pad_rays(origin, direction, t_aux, t_max):
    r = origin.shape[0]
    nb = -(-r // BLOCK_R)
    pad = nb * BLOCK_R - r
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), origin.dtype)])
        direction = jnp.concatenate([direction, jnp.ones((pad, 3), direction.dtype)])
        t_aux = jnp.concatenate([t_aux, jnp.zeros((pad,), t_aux.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -_BIG, t_max.dtype)])
    return origin, direction, t_aux, t_max, nb, r


def _pad_woop(woop_t, n_bins, slots):
    need = n_bins * slots
    if woop_t.shape[1] < need:
        woop_t = jnp.pad(woop_t, ((0, 0), (0, need - woop_t.shape[1])))
    return woop_t


def binned_closest(scene, origin, direction, active=None, t_max=None,
                   interpret=None):
    """Closest hit.  Returns (t, prim, u, v, attrs) — attrs (R, A) fused
    shading rows (bvh/dfs_sweep._attr_table layout), prim == -1 on miss."""
    r = origin.shape[0]
    if t_max is None:
        t_max = jnp.full((r,), _BIG, jnp.float32)
    if active is not None:
        t_max = jnp.where(active, t_max, -_BIG)
    t, prim, u, v = _binned_closest_arrays(
        scene.bvh_bin_bounds, scene.tri_woop_t, origin, direction, t_max,
        scene.bvh_bins, scene.bvh_bin_slots, interpret)
    attr = _attr_table(scene, scene.has_textures)
    attrs = jax.lax.stop_gradient(attr.T[jnp.maximum(prim, 0)])
    attrs = jnp.where((prim >= 0)[:, None], attrs, 0.0)
    return t, prim, u, v, attrs


def _binned_closest_arrays(bounds, woop_t, origin, direction, t_max,
                           n_bins, slots, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c_pad = bounds.shape[1]
    woop_t = _pad_woop(woop_t, n_bins, slots)
    origin, direction, _, t_max, nb, r = _pad_rays(
        origin, direction, jnp.zeros_like(t_max), t_max)

    spec3 = pl.BlockSpec((BLOCK_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda x: pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out1 = lambda dt: jax.ShapeDtypeStruct((nb * BLOCK_R, 1), dt)
    o1 = pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pack = _pack_matrix(c_pad)

    t, prim, u, v = pl.pallas_call(
        _make_fused_closest_kernel(c_pad, slots),
        grid=(nb,),
        in_specs=[full(bounds), full(pack), spec3, spec3, spec1, full(woop_t)],
        out_specs=[o1, o1, o1, o1],
        out_shape=[out1(jnp.float32), out1(jnp.int32), out1(jnp.float32),
                   out1(jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_R, c_pad // WORD_BITS), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bounds, pack, origin, direction, t_max[:, None], woop_t)
    flat = lambda x: x.reshape(-1)[:r]
    return flat(t), flat(prim), flat(u), flat(v)


def binned_any(scene, origin, direction, t_min, t_max, active=None,
               interpret=None):
    """Any-hit (shadow) with first-occlusion early-out."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_bins, slots = scene.bvh_bins, scene.bvh_bin_slots
    bounds = scene.bvh_bin_bounds
    c_pad = bounds.shape[1]
    woop_t = _pad_woop(scene.tri_woop_t, n_bins, slots)

    r = origin.shape[0]
    t_min = jnp.broadcast_to(t_min, (r,)).astype(jnp.float32)
    t_max = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    if active is not None:
        t_max = jnp.where(active, t_max, -_BIG)
    origin, direction, t_min, t_max, nb, r = _pad_rays(
        origin, direction, t_min, t_max)

    spec3 = pl.BlockSpec((BLOCK_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda x: pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    pack = _pack_matrix(c_pad)

    occ = pl.pallas_call(
        _make_fused_any_kernel(c_pad, slots),
        grid=(nb,),
        in_specs=[full(bounds), full(pack), spec3, spec3, spec1, spec1,
                  full(woop_t)],
        out_specs=pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BLOCK_R, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_R, c_pad // WORD_BITS), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bounds, pack, origin, direction, t_min[:, None], t_max[:, None], woop_t)
    return occ.reshape(-1)[:r] != 0


# ---------------------------------------------------------------------------
# differentiable wrapper (same scheme as dfs_sweep.closest_diff)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _make_binned_vjp(n_bins: int, slots: int):
    @jax.custom_vjp
    def f(o, d, tm, bounds, woop_t, woop_rows):
        return _binned_closest_arrays(bounds, woop_t, o, d, tm, n_bins, slots)

    def f_fwd(o, d, tm, bounds, woop_t, woop_rows):
        out = f(o, d, tm, bounds, woop_t, woop_rows)
        return out, (o, d, out[1], woop_rows)

    def f_bwd(res, ct):
        o, d, prim, woop_rows = res
        ct_t, ct_u, ct_v = ct[0], ct[2], ct[3]
        hit = prim >= 0
        rows = woop_rows[jnp.maximum(prim, 0)]
        _, vjp = jax.vjp(lambda oo, dd: _woop_eval_rows(rows, oo, dd), o, d)
        zero = jnp.zeros_like(ct_t)
        m = lambda c: jnp.where(hit, c, zero)
        do, dd = vjp((m(ct_t), m(ct_u), m(ct_v)))
        return do, dd, None, None, None, None

    f.defvjp(f_fwd, f_bwd)
    return f


def binned_closest_diff(scene, origin, direction, active=None):
    """Closest hit with exact (t, u, v) gradients w.r.t. (origin, direction);
    see dfs_sweep.closest_diff for the backward scheme.  Returns
    (t, prim, u, v, attrs)."""
    r = origin.shape[0]
    t_max = jnp.full((r,), _BIG, jnp.float32)
    if active is not None:
        t_max = jnp.where(active, t_max, -_BIG)
    sg = jax.lax.stop_gradient
    f = _make_binned_vjp(int(scene.bvh_bins), int(scene.bvh_bin_slots))
    t, prim, u, v = f(origin, direction, t_max, sg(scene.bvh_bin_bounds),
                      sg(scene.tri_woop_t), sg(scene.tri_woop))
    attr = _attr_table(scene, scene.has_textures)
    attrs = sg(attr.T[jnp.maximum(prim, 0)])
    attrs = jnp.where((prim >= 0)[:, None], attrs, 0.0)
    return t, prim, u, v, attrs
