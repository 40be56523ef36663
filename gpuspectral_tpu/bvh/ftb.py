"""Front-to-back binned BVH traversal (round 3).

The RT-core role of the reference's `traceRayEXT`
(assets/shaders/raygen.rgen:58, backend/vulkan/VulkanRays.cpp:6-86),
reformulated a second time.  bvh/binned.py proved per-ray votes beat
block-union votes, but its in-kernel control — 24-bit word packing, an
ffs via f32 exponents, per-round bit clears on (B, W) column vectors —
costs ~2.8 us/round against ~0.35 us of actual triangle sweeping, and its
bin iteration order is INDEX order, so bins behind a lane's committed hit
are still swept.

This kernel keeps the per-(ray, bin) information as what it actually is —
the slab entry distance — and drives traversal off it directly:

  1. ENTRY MATRIX: tn[r, c] = segment entry distance of ray r into bin c's
     AABB (BIG where the slab test misses).  One vectorized pass over
     (16, C) tiles per 16 rays, stored to a (BLOCK_R, C) f32 VMEM scratch.
  2. FRONT-TO-BACK ROUNDS: the block repeatedly takes the globally nearest
     (ray, bin) entry among candidates that could still beat that ray's
     committed hit:  act = tn + visited;  m = min_rays(where(act < t_best,
     act, BIG));  bin = argmin(m).  It sweeps that bin's triangle slots
     from the VMEM-resident Woop table (dynamic lane slice) and folds
     per-lane (t, u, v, prim) bests.
  3. CULLING FOR FREE: committing a hit tightens t_best, which removes all
     of that lane's strictly-farther bins from `act` with no bookkeeping;
     the loop exits when no lane has a candidate bin nearer than its best
     hit.  Coherent 128-ray blocks converge in a handful of rounds instead
     of sweeping their full vote union (bvh/binned.py's fixed cost).

Correctness of the early exit: if bin b could contain a hit closer than
t_best[r], then tn[r, b] < t_best[r] (every hit in b lies at or beyond the
entry distance), so (r, b) keeps the loop alive until either b is swept or
t_best[r] drops below tn[r, b] — in which case b cannot contain a closer
hit.  Hits found in bins a lane never "voted" for are geometrically real
and are committed too (votes are culling, not correctness).

Shadow (any-hit) rays use the same structure with an occlusion flag per
lane instead of t_best; occluded lanes leave `act` immediately, so the
block drains as soon as every lane is either occluded or out of candidate
bins.

Shading attributes and gradients follow bvh/binned.py: attrs are gathered
once per query from the fused attr table, and `ftb_closest_diff` wraps the
forward in the dfs_sweep.closest_diff custom_vjp scheme (backward
re-evaluates the hit triangle's Woop test differentiably).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dfs_sweep import _attr_table, _woop_eval_rows

_BIG = 1e30
_BIGI = 1 << 30
_VMEM_LIMIT = 110 * 1024 * 1024

BLOCK_R = 128  # rays per kernel block
LANE = 128  # triangle slots per sweep chunk
_VCHUNK = 16  # rays per vectorized entry-matrix chunk (sublane dim)

# far-point padding pattern (see bvh/binned.build_bins): lo == hi at a
# distant point with distinct per-axis values makes t_near > t_far for
# every ray under finite f32 slab math, so padded bins never enter `act`
_FAR = (1e17, 2e17, 3e17)


def _pad_bounds_to_lane(bounds):
    """Pad the (6, C24) bin-bounds table to a 128-multiple lane width with
    far-point boxes (the build pads to 24-wide words for binned.py)."""
    c = bounds.shape[1]
    cp = -(-c // LANE) * LANE
    if cp == c:
        return bounds, c
    pad = jnp.tile(jnp.asarray(_FAR, bounds.dtype), 2)[:, None]
    return (
        jnp.concatenate(
            [bounds, jnp.broadcast_to(pad, (6, cp - c))], axis=1
        ),
        cp,
    )


def _inv_dir1(dx):
    mag = jnp.maximum(jnp.abs(dx), 1e-12)
    return 1.0 / jnp.where(dx < 0, -mag, mag)


def _fill_entry(bounds_ref, o_ref, d_ref, tmax_ref, tn_ref):
    """tn_ref[r, c] = clamped slab entry distance of ray r into bin c
    (BIG where the segment [0, tmax] misses the box)."""
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
        tn_ref[sl, :] = jnp.where(tf >= tn, tn, _BIG)
        return 0

    jax.lax.fori_loop(0, BLOCK_R // _VCHUNK, do, 0)


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


def _next_bin(act):
    """Globally nearest candidate: (min value, its bin index) over (B, C)."""
    m = jnp.min(act, axis=0, keepdims=True)  # (1, C)
    mn = jnp.min(m)
    iw = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    binv = jnp.min(jnp.where(m == mn, iw, _BIGI))
    return mn, binv


def _make_ftb_closest_kernel(c_pad: int, slots: int):
    chunks = slots // LANE
    shape = (BLOCK_R, LANE)

    def kernel(bounds_ref, o_ref, d_ref, tmax_ref, woop_ref,
               t_out, prim_out, u_out, v_out, tn_s):
        _fill_entry(bounds_ref, o_ref, d_ref, tmax_ref, tn_s)
        ox = jnp.broadcast_to(o_ref[:, 0:1], shape)
        oy = jnp.broadcast_to(o_ref[:, 1:2], shape)
        oz = jnp.broadcast_to(o_ref[:, 2:3], shape)
        dx = jnp.broadcast_to(d_ref[:, 0:1], shape)
        dy = jnp.broadcast_to(d_ref[:, 1:2], shape)
        dz = jnp.broadcast_to(d_ref[:, 2:3], shape)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)

        def candidates(vis, bt):
            act = tn_s[:, :] + vis
            return jnp.where(act < bt, act, _BIG)

        def cond(st):
            return st[0] < _BIG

        def body(st):
            mn, binv, vis, bt, bu, bv, bp = st
            base = binv * slots
            for c in range(chunks):
                t, u, v, ok = _woop_chunk_at(
                    woop_ref, base + c * LANE, ox, oy, oz, dx, dy, dz)
                hit = ok & (t > 0.0) & (t < bt)
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
            vis = jnp.where(col == binv, _BIG, vis)
            mn, binv = _next_bin(candidates(vis, bt))
            return mn, binv, vis, bt, bu, bv, bp

        vis0 = jnp.zeros((1, c_pad), jnp.float32)
        bt0 = jnp.minimum(tmax_ref[:, 0:1], _BIG)
        mn0, binv0 = _next_bin(candidates(vis0, bt0))
        init = (
            mn0, binv0, vis0, bt0,
            jnp.zeros((BLOCK_R, 1), jnp.float32),
            jnp.zeros((BLOCK_R, 1), jnp.float32),
            jnp.full((BLOCK_R, 1), -1, jnp.int32),
        )
        _, _, _, bt, bu, bv, bp = jax.lax.while_loop(cond, body, init)
        found = bp >= 0
        t_out[:, :] = jnp.where(found, bt, _BIG)
        prim_out[:, :] = bp
        u_out[:, :] = bu
        v_out[:, :] = bv

    return kernel


def _make_ftb_any_kernel(c_pad: int, slots: int):
    chunks = slots // LANE
    shape = (BLOCK_R, LANE)

    def kernel(bounds_ref, o_ref, d_ref, tmin_ref, tmax_ref, woop_ref,
               occ_out, tn_s):
        _fill_entry(bounds_ref, o_ref, d_ref, tmax_ref, tn_s)
        ox = jnp.broadcast_to(o_ref[:, 0:1], shape)
        oy = jnp.broadcast_to(o_ref[:, 1:2], shape)
        oz = jnp.broadcast_to(o_ref[:, 2:3], shape)
        dx = jnp.broadcast_to(d_ref[:, 0:1], shape)
        dy = jnp.broadcast_to(d_ref[:, 1:2], shape)
        dz = jnp.broadcast_to(d_ref[:, 2:3], shape)
        tmin = tmin_ref[:, 0:1]
        tmax = tmax_ref[:, 0:1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)

        def candidates(vis, occ):
            act = tn_s[:, :] + vis + occ
            return jnp.where(act < _BIG, act, _BIG)

        def cond(st):
            return st[0] < _BIG

        def body(st):
            mn, binv, vis, occ = st
            base = binv * slots
            hit_any = jnp.zeros((BLOCK_R, 1), jnp.float32)
            for c in range(chunks):
                t, _u, _v, ok = _woop_chunk_at(
                    woop_ref, base + c * LANE, ox, oy, oz, dx, dy, dz)
                h = ok & (t > tmin) & (t < tmax)
                hit_any = jnp.maximum(
                    hit_any, jnp.max(h.astype(jnp.float32), axis=1,
                                     keepdims=True))
            occ = jnp.maximum(occ, hit_any * _BIG)
            vis = jnp.where(col == binv, _BIG, vis)
            mn, binv = _next_bin(candidates(vis, occ))
            return mn, binv, vis, occ

        vis0 = jnp.zeros((1, c_pad), jnp.float32)
        occ0 = jnp.zeros((BLOCK_R, 1), jnp.float32)
        mn0, binv0 = _next_bin(candidates(vis0, occ0))
        _, _, _, occ = jax.lax.while_loop(
            cond, body, (mn0, binv0, vis0, occ0))
        occ_out[:, :] = (occ > 0.0).astype(jnp.int32)

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


def ftb_closest(scene, origin, direction, active=None, t_max=None,
                interpret=None):
    """Closest hit.  Returns (t, prim, u, v, attrs) — attrs (R, A) fused
    shading rows (bvh/dfs_sweep._attr_table layout), prim == -1 on miss."""
    r = origin.shape[0]
    if t_max is None:
        t_max = jnp.full((r,), _BIG, jnp.float32)
    if active is not None:
        t_max = jnp.where(active, t_max, -_BIG)
    t, prim, u, v = _ftb_closest_arrays(
        scene.bvh_bin_bounds, scene.tri_woop_t, origin, direction, t_max,
        scene.bvh_bins, scene.bvh_bin_slots, interpret)
    attr = _attr_table(scene, scene.has_textures)
    attrs = jax.lax.stop_gradient(attr.T[jnp.maximum(prim, 0)])
    attrs = jnp.where((prim >= 0)[:, None], attrs, 0.0)
    return t, prim, u, v, attrs


def _ftb_closest_arrays(bounds, woop_t, origin, direction, t_max,
                        n_bins, slots, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bounds, c_pad = _pad_bounds_to_lane(bounds)
    woop_t = _pad_woop(woop_t, n_bins, slots)
    origin, direction, _, t_max, nb, r = _pad_rays(
        origin, direction, jnp.zeros_like(t_max), t_max)

    spec3 = pl.BlockSpec((BLOCK_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda x: pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out1 = lambda dt: jax.ShapeDtypeStruct((nb * BLOCK_R, 1), dt)
    o1 = pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    t, prim, u, v = pl.pallas_call(
        _make_ftb_closest_kernel(c_pad, slots),
        grid=(nb,),
        in_specs=[full(bounds), spec3, spec3, spec1, full(woop_t)],
        out_specs=[o1, o1, o1, o1],
        out_shape=[out1(jnp.float32), out1(jnp.int32), out1(jnp.float32),
                   out1(jnp.float32)],
        scratch_shapes=[pltpu.VMEM((BLOCK_R, c_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bounds, origin, direction, t_max[:, None], woop_t)
    flat = lambda x: x.reshape(-1)[:r]
    return flat(t), flat(prim), flat(u), flat(v)


def ftb_any(scene, origin, direction, t_min, t_max, active=None,
            interpret=None):
    """Any-hit (shadow) with per-lane occlusion early-out."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_bins, slots = scene.bvh_bins, scene.bvh_bin_slots
    bounds, c_pad = _pad_bounds_to_lane(scene.bvh_bin_bounds)
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

    occ = pl.pallas_call(
        _make_ftb_any_kernel(c_pad, slots),
        grid=(nb,),
        in_specs=[full(bounds), spec3, spec3, spec1, spec1, full(woop_t)],
        out_specs=pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BLOCK_R, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BLOCK_R, c_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bounds, origin, direction, t_min[:, None], t_max[:, None], woop_t)
    return occ.reshape(-1)[:r] != 0


# ---------------------------------------------------------------------------
# differentiable wrapper (same scheme as dfs_sweep.closest_diff)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _make_ftb_vjp(n_bins: int, slots: int):
    @jax.custom_vjp
    def f(o, d, tm, bounds, woop_t, woop_rows):
        return _ftb_closest_arrays(bounds, woop_t, o, d, tm, n_bins, slots)

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


def ftb_closest_diff(scene, origin, direction, active=None):
    """Closest hit with exact (t, u, v) gradients w.r.t. (origin, direction);
    see dfs_sweep.closest_diff for the backward scheme.  Returns
    (t, prim, u, v, attrs)."""
    r = origin.shape[0]
    t_max = jnp.full((r,), _BIG, jnp.float32)
    if active is not None:
        t_max = jnp.where(active, t_max, -_BIG)
    sg = jax.lax.stop_gradient
    f = _make_ftb_vjp(int(scene.bvh_bins), int(scene.bvh_bin_slots))
    t, prim, u, v = f(origin, direction, t_max, sg(scene.bvh_bin_bounds),
                      sg(scene.tri_woop_t), sg(scene.tri_woop))
    attr = _attr_table(scene, scene.has_textures)
    attrs = sg(attr.T[jnp.maximum(prim, 0)])
    attrs = jnp.where((prim >= 0)[:, None], attrs, 0.0)
    return t, prim, u, v, attrs
