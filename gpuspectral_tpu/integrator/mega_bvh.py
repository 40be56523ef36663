"""Persistent Pallas megakernel with fused front-to-back BVH traversal.

This closes the reference's biggest performance asymmetry: its BVH scenes
traverse in RT-core silicon (`traceRayEXT`, assets/shaders/raygen.rgen:58;
BLAS/TLAS built by backend/vulkan/VulkanRays.cpp:6-86) while the shading
loop stays on the SIMT cores.  Here both halves fuse into ONE `pallas_call`
per ray block: camera gen, front-to-back binned BVH traversal, shading, NEE
shadow traversal, RR and sample regeneration — per-path state never touches
HBM between bounces.

Round-4 execution shape (the round-3 kernel ran shading at 1/8 VPU width
with ~20 tiny relayouts per bounce and scalar-serialized bin picks):

  * A block is 1024 rays = n_groups coherent pixel tiles.  All shading
    state is (8, 128) planes — one f32 vreg per state variable, so the
    bounce body (RNG, BSDF, MIS, RR) runs at full VPU width.
  * Traversal runs per GROUP (one tile) in the sweep orientation (rays on
    sublanes, slots on lanes) inside a fori_loop over groups — one
    compiled body, sequential executions, so a converged tile never
    sweeps another tile's bins.  Groups are 32 rays (4x8-pixel tiles) for
    VMEM-resident scenes and 128 rays (8x16 tiles) for streaming ones —
    see _subgroups for the measured rationale.  The plane <-> group-matrix
    relayouts happen once per bounce for the whole block (batched).
  * Bin picks stay in the vector domain: the K nearest candidate bins are
    selected with (1,1)-shaped vector mins (no vector->scalar->vector
    round-trip between picks); the K scalar extractions for the sweep
    offsets happen in one batch, so their latency overlaps the sweeps.
  * Bin size runs in three bands (bvh/build.BIN_TARGET*): 128-slot for
    small resident scenes (fine front-to-back culling), 256-slot for
    large resident scenes (50-100 MB tables, where 1-2k bins make the
    c_pad-wide candidate scans real money), 512-slot for HBM-streaming
    scenes (each per-round DMA moves ~128 KB instead of ~32 KB).
    Tables stay fully VMEM-resident up to MEGA_BVH_RESIDENT_BYTES
    (~100 MB of the measured ~120 MB v5e budget, tools/probe_vmem.py).

Traversal per group is the ftb scheme (bvh/ftb.py): an entry matrix
tn[r, c] = slab entry distance of ray r into bin c, rounds that sweep the
K globally-nearest candidate bins with per-lane t-culling, exit when no
lane has a candidate nearer than its committed hit.

Shading attributes are gathered DURING the sweep by an MXU one-hot matmul:
`first` (the per-ray argmin slot mask, (128 rays, 128 slots)) contracted
against the chunk's attribute rows (A, 128 slots).  On TPU the f32 matmul
runs as bf16x3 passes (~2^-22 relative error on normals/params — far below
MC noise); interpret mode is exact.

Light selection supports BOTH the reference's uniform pick and power
sampling: the pick is a (L, 128) one-hot built from two CDF compares, and
the light's 13 scalars arrive through one MXU contraction per group — no
per-lane gathers.

Semantics: the bounce body is integrator/mega.make_bounce_body — the same
MIS/delta/RR state machine as the XLA wavefront (rayhit.rchit:666-797).
Per-pixel estimates are invariant to the block regrouping: RNG streams are
keyed by (pixel, sample) and traversal decisions depend only on the 128-ray
tile, which is unchanged from round 3.
"""

from __future__ import annotations

from functools import partial

import numpy as _np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import rng
from ..scene.data import SceneData
from ..utils.config import RenderConfig
from .mega import (
    _CH_BSDF_SELECT,  # noqa: F401  (channel layout shared with mega)
    _CH_JITTER_X,
    _CH_JITTER_Y,
    _CH_LIGHT_INDEX,
    _fdivmod_exact,
    _pack_tables,
    _u2f,
    _uniform,
    _uniform_mod,
    make_bounce_body,
)

_BIG = 1e30
_BIGI = 1 << 30
LANES = 128
ROWS = 8  # sublane rows of shading state (one f32 vreg per state plane)
BLOCK_R = ROWS * LANES  # rays per pallas block
# triangle slots swept per front-to-back round (per group): bins swept
# per round = max(1, ROUND_SLOTS // bin_slots).  Amortizes the fixed
# per-round cost (candidate scan + picks + fold reduces + while_loop
# control + streaming DMA latency); measured round 5 (slope-timed,
# tools/bench_kernel_true.py): 1024 slots/round over 128-slot bins is the
# staircase2 optimum (66.1 ms vs 74.8 at 512/256 and 99.6 at 256/256).
ROUND_SLOTS = 1024


def _subgroups(stream: bool) -> int:
    """Traversal subgroups per 128-ray group (each = one coherent pixel
    tile with its OWN per-round bin pick and sub-sweep).

    Measured (tools/microbench_sweep.py): the Woop chunk sweep is
    COMPUTE-bound at ~5-6 G triangle-tests/s and a 32-row sub-sweep costs
    ~0.88x proportional — so finer pick granularity is nearly free
    per-ray, while each tile's front-to-back bin union (the masked-sweep
    waste for incoherent deep bounces) shrinks 2.6x from 128-ray to
    32-ray tiles (tools/sim_bins.py at B=32: staircase2 incoh rounds
    53 -> 20).  Streaming scenes keep one subgroup: every picked bin costs
    an HBM DMA round-trip, which the whole 128-ray group amortizes.
    (Fat-bin resident scenes measure the same at 1 or 4 subgroups —
    coffee A/B round 5: 0.61 vs 0.62 Mrays/s — so one rule serves.)"""
    return 1 if stream else 4

# attr rows: 0-30 as mega._pack_tables, 31 = light-selection pdf of this
# triangle's emitter (0 for non-emissive; used by exact-MIS BSDF-hit weights);
# textured scenes append rows 32-40 = per-CORNER texture color (rgb x 3
# corners), barycentrically blended in-kernel and multiplied into the
# reflectance params — vertex-sampled texturing.  (The reference never
# samples textures at all, rayhit.rchit; the wavefront does per-hit nearest
# lookups — tests compare the two paths with tolerance on textured scenes.)
_NA = 32
_NA_TEX = 41

# Build-time FAT-BIN threshold: scenes whose raw tables exceed this build
# 512-slot bins (fewer, bigger front-to-back rounds) instead of the
# 128-slot resident optimum (bvh/build.BIN_TARGET*).  Historically this
# was also the residency cap under the assumption of ~16 MB usable VMEM;
# round 5 measured the real limit on hardware (tools/probe_vmem.py: a
# 120 MB VMEM scratch compiles AND runs on v5e — the 16 MB figure was a
# compiler-guardrail default, not the hardware), so residency is now
# governed by MEGA_BVH_RESIDENT_BYTES below.
MEGA_BVH_TABLE_BYTES = 11 * 1024 * 1024

# Render-time residency cap: keep the merged gather table VMEM-resident up
# to this size, leaving ~20 MB of the measured ~120 MB budget for the
# per-group entry matrices, shading planes and compiler temporaries.
# coffee (51 MB) and living-room (99 MB) fit — removing the per-round
# HBM DMA round-trips that bound them at ~1.5 Mrays/s through round 5's
# streaming path (BASELINE.md).
MEGA_BVH_RESIDENT_BYTES = 100 * 1024 * 1024

_HI = jax.lax.Precision.HIGHEST


def _dotg(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               precision=_HI,
                               preferred_element_type=jnp.float32)


def _t(x):
    """2-D transpose (Mosaic relayout); batched (8,128)<->(128,8) here."""
    return jnp.transpose(x)


def _inv_dir1(dx):
    mag = jnp.maximum(jnp.abs(dx), 1e-12)
    return 1.0 / jnp.where(dx < 0, -mag, mag)


def _make_kernel(cfg: RenderConfig, n_bins: int, slots: int, c_pad: int,
                 n_lights: int, present: tuple, light_mode: str,
                 n_attr: int = _NA, stream: bool = False, grad_cfg=None,
                 has_env: bool = False, has_area: bool = True,
                 env_hw=None):
    """grad_cfg (path-replay backward mode): dict(rows=<static tuple of
    diffuse bsdf rows>, n_lights=<emission-grad light count, 0 to
    disable>).  The kernel then takes per-lane cotangent planes + the grad
    rows' kd table and emits one (1,128) gradient lane-vector per block
    instead of radiance (see integrator/mega_grad.py for the estimator)."""
    width, height = cfg.width, cfg.height
    spp = cfg.spp
    max_iters = spp * (cfg.max_depth + 1)
    # gather-table rows: [0..n_attr) shading attrs, [n_attr..n_attr+12) the
    # hit triangle's own Woop rows (so u/v are recomputed exactly at plane
    # level instead of reduce-summed per sweep), zero-padded to 8 rows
    n_rows = -(-(n_attr + 12) // 8) * 8

    subgroups = _subgroups(stream)
    seg = 128 // subgroups  # rays per traversal tile (sub-sweep rows)
    # bins swept per subgroup per round: the fold (2 lane-reduces + the
    # one-hot gather) is paid once per ROUND, so sweeping K>1 bins per
    # round amortizes it; streaming keeps K=2 — K=4 measured 12% SLOWER
    # (over-sweeps the last bins of nearly-converged groups at 512-slot
    # granularity) — with both DMAs started before the first wait so bin
    # 1 streams fully under bin 0's sweep.  Resident: fine 128-slot bins
    # take ROUND_SLOTS/round (the staircase2 optimum); fatter bins take
    # 512 slots/round — K=2 at 256 beats K=4/K=1 and K=1 at 512 beats
    # K=2 (round-5 coffee A/B: 3.82 / 3.70 / 3.64 Mrays/s at 256-slot
    # K=2/4/1; 3.12 / 2.93 at 512-slot K=1/2) — fat rounds over-sweep
    # nearly-converged tiles faster than the fold amortization pays.
    if stream:
        k = 2
    elif slots <= 128:
        k = ROUND_SLOTS // slots
    else:
        k = max(1, 512 // slots)
    k_bins = max(1, min(k, n_bins))

    def kernel(pix_ref, bounds_ref, gat_ref, light_ref, cam_ref,
               ts_ref, *rest):
        rest = list(rest)
        kd_ref = rest.pop(0) if grad_cfg else None
        env_ref = rest.pop(0) if env_hw else None
        if grad_cfg:
            (rad_r_ref, rad_g_ref, rad_b_ref, rays_ref,
             part_ref), scratch = (rest[:5], rest[5:])
        else:
            (rad_r_ref, rad_g_ref, rad_b_ref, rays_ref), scratch = (
                rest[:4], rest[4:])
        if stream:
            # streaming mode: gat_ref (bins, n_rows, slots) lives in HBM;
            # each traversal round DMAs the visited bins' rows into these
            # VMEM buffers (one merged attr+woop copy per bin — round 4
            # paid two), with a depth-2 prefetch window so bins 1..k-1
            # stream under the preceding sweeps
            nbuf = 2
            gat_bufs, gat_sems = scratch[0:nbuf], scratch[nbuf:2 * nbuf]
        t0 = ts_ref[0, 0]
        pix = jax.lax.bitcast_convert_type(pix_ref[0], jnp.uint32)  # (8,128)

        r00, r01, r02 = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        r10, r11, r12 = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        r20, r21, r22 = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        cox, coy, coz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        fov = cam_ref[0, 12]
        zplane = (max(width, height) / 2.0) / jnp.tan(fov / 2.0)

        def fresh(sample):
            # identical to mega.py's raygen (scene/camera.py semantics)
            seed = rng.pixel_seed(pix, t0 + sample)
            py, px = _fdivmod_exact(_u2f(pix), width)
            if cfg.jitter:
                px = px + _uniform(seed, jnp.uint32(0xFFFF), _CH_JITTER_X)
                py = py + _uniform(seed, jnp.uint32(0xFFFF), _CH_JITTER_Y)
            xx = px - width / 2.0
            yy = py - height / 2.0
            inv = jax.lax.rsqrt(xx * xx + yy * yy + zplane * zplane)
            dcx, dcy, dcz = -xx * inv, -yy * inv, zplane * inv
            dwx = r00 * dcx + r01 * dcy + r02 * dcz
            dwy = r10 * dcx + r11 * dcy + r12 * dcz
            dwz = r20 * dcx + r21 * dcy + r22 * dcz
            o = (jnp.zeros_like(dwx) + cox, jnp.zeros_like(dwy) + coy,
                 jnp.zeros_like(dwz) + coz)
            return o, (dwx, dwy, dwz), seed

        def fill_tn(oT, dT, tmaxT):
            """(group_r, c_pad) slab entry distances (bvh/ftb.py:_fill_entry,
            value form).  oT/dT: 3-tuples of (group_r,1); tmaxT (group_r,1)."""
            lox, loy, loz = (bounds_ref[i:i + 1, :] for i in range(3))
            hix, hiy, hiz = (bounds_ref[i:i + 1, :] for i in range(3, 6))
            ix = _inv_dir1(dT[0])
            iy = _inv_dir1(dT[1])
            iz = _inv_dir1(dT[2])
            t0x = (lox - oT[0]) * ix
            t1x = (hix - oT[0]) * ix
            t0y = (loy - oT[1]) * iy
            t1y = (hiy - oT[1]) * iy
            t0z = (loz - oT[2]) * iz
            t1z = (hiz - oT[2]) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), tmaxT),
            )
            return jnp.where(tf >= tn, tn, _BIG)

        # pick-matrix rows: one per subgroup, padded to 8 sublanes (Mosaic
        # crashes extracting scalars from 4-sublane vectors); pad rows are
        # all-BIG and pick the benign degenerate bin 0
        prows = 8 if subgroups > 1 else 1
        colp = jax.lax.broadcasted_iota(jnp.int32, (prows, c_pad), 1)
        cap = cfg.debug_rounds_cap
        wb = n_attr  # first Woop row of the gather table
        # per-(bin k, slot) identity for the round fold: unique, ordered by
        # (k, slot) so the min-id tie-break reproduces the sequential
        # "first chunk that improves wins" commit order of the brute kernel
        ids_k = [jax.lax.broadcasted_iota(jnp.int32, (128, slots), 1)
                 + k * slots for k in range(k_bins)]
        _KEYBIG = int(_np.asarray(9e28, _np.float32).view(_np.int32))

        def _i32(x):
            return jax.lax.bitcast_convert_type(x, jnp.int32)

        def _sub(x, j):
            return x[j * seg:(j + 1) * seg, :]

        col1 = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)

        def _mask_bins(vrow, bs):
            for b in bs:
                vrow = jnp.where(col1 == b, _BIG, vrow)
            return vrow

        def pick_batched(tn, vis, lim):
            """One round's bin picks for ALL subgroups at once.

            lim (128,1): per-ray candidate limit (bt for closest; a 0/BIG
            occlusion mask folded into tmax for any-hit).  Selection is a
            packed-key argmin: bin index in the low 12 bits of the f32
            entry distance's int image (positive floats order as ints), so
            each pick is ONE lane-reduce instead of round 4's three —
            front-to-back order degrades by at most 2^-11 relative, which
            only affects culling efficiency, never correctness.  Returns
            (bins [subgroup][k] scalars, vis', key_rest int32 scalar)."""
            ms = []
            for j in range(subgroups):
                act = _sub(tn, j) + vis[j]
                cand = jnp.where(act < _sub(lim, j), act, _BIG)
                ms.append(jnp.min(cand, axis=0, keepdims=True))
            ms += [jnp.full((1, c_pad), _BIG)] * (prows - subgroups)
            m = jnp.concatenate(ms, axis=0) if prows > 1 else ms[0]
            bvs = []
            key_pre = None
            for _ in range(k_bins):
                km = (_i32(m) & ~jnp.int32(0xFFF)) | colp
                if key_pre is None:
                    # validity of THIS pick (any candidate at all) — the
                    # pipelined loop guards on it one round later
                    key_pre = jnp.min(km)
                kmin = jnp.min(km, axis=1, keepdims=True)  # (prows,1)
                bv = kmin & jnp.int32(0xFFF)
                bvs.append(bv)
                m = jnp.where(colp == bv, _BIG, m)
            # post-pick candidate min: the NON-pipelined (streaming) loop
            # guards on it within the same round
            key_rest = jnp.min((_i32(m) & ~jnp.int32(0xFFF)) | colp)
            # scalar extraction via masked full-reduce (slicing row j of an
            # (8,1) vector — or single rows of the vis matrix — at non-8-
            # multiple sublane offsets does not lower in Mosaic)
            riota = jax.lax.broadcasted_iota(jnp.int32, (prows, 1), 0)
            bins = [[jnp.min(jnp.where(riota == j, bvs[k], _BIGI))
                     for k in range(k_bins)] for j in range(subgroups)]
            # visited-bin updates per tile row, keyed by the extracted
            # scalars (vis stays a tuple of (1, c_pad) rows)
            vis = tuple(
                _mask_bins(vis[j], [bins[j][k] for k in range(k_bins)])
                for j in range(subgroups))
            return bins, vis, key_pre, key_rest

        def sweep_tm(od, gsrc, goff, lo, hi):
            """Woop-test one bin's `slots` for one subgroup: t masked to
            (lo, hi) per ray, BIG elsewhere.  gsrc/goff locate the bin's
            rows inside the gather table (VMEM-resident or DMA buffer)."""
            ox, oy, oz, dx, dy, dz = od
            sl = pl.ds(pl.multiple_of(goff, LANES), slots)
            r = [gsrc[wb + i, sl][None, :] for i in range(12)]
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
            hit = ok & (t > lo) & (t < hi)
            return jnp.where(hit, t, _BIG)

        def _stream_rt(b, k):
            return pltpu.make_async_copy(
                gat_ref.at[b], gat_bufs[k % nbuf], gat_sems[k % nbuf])

        def closest_group(oT, dT, tmaxT):
            """Front-to-back traversal of one 128-ray group as `subgroups`
            independent tiles, each picking its own nearest candidate bins
            per round.  Per round the commit fold costs TWO lane-reduces
            total (exact t min + id tie-break) plus one one-hot gather
            matmul per (tile, bin) — round 4 paid ~4 reduces per swept
            128-slot chunk.  oT/dT/tmaxT in sweep orientation ((128,1)
            columns); returns bt (128,1) and battr (128, n_rows) whose
            tail rows are the hit triangle's own Woop rows (u/v are
            recomputed from them at plane level — exact, same op order as
            the sweep)."""
            tn = fill_tn(oT, dT, tmaxT)  # (128, c_pad)
            od = [tuple(_sub(x, j) for x in oT + dT)
                  for j in range(subgroups)]
            z1 = jnp.zeros((seg, 1), jnp.float32)

            def cond(st):
                ok = st[0] < _KEYBIG
                return ok if not cap else ok & (st[5] < cap)

            def body(st):
                # RESIDENT: software-pipelined rounds — sweep the bins
                # PICKED LAST ROUND (carried as scalars, extraction
                # latency hidden under last round's sweeps) and pick next
                # round's bins from the PRE-commit bt: stale-by-one
                # culling is conservative (never skips a closer hit), vis
                # still grows every round (terminates), and the pick is
                # independent of this round's fold, so it overlaps the
                # sweeps.  STREAMING: pick in-round — the pipeline's ~1
                # extra round per traversal costs a full HBM DMA
                # round-trip there (measured: coffee 1.75 -> 1.51
                # Mrays/s), while the extraction latency it would hide is
                # already buried under the DMA wait.
                _, bins, vis, bt, battr, it = st
                if stream:
                    # in-round pick: these ARE this round's bins
                    bins, vis, _kp, key_next = pick_batched(tn, vis, bt)
                    nbins, nvis = bins, vis
                tms = []
                if stream:
                    for k in range(min(2, k_bins)):
                        _stream_rt(bins[0][k], k).start()
                    for k in range(k_bins):
                        _stream_rt(bins[0][k], k).wait()
                        if k + 2 < k_bins:
                            _stream_rt(bins[0][k + 2], k + 2).start()
                        tms.append([sweep_tm(od[0], gat_bufs[k % nbuf], 0,
                                             z1, _sub(bt, 0))])
                else:
                    for k in range(k_bins):
                        tms.append([
                            sweep_tm(od[j], gat_ref, bins[j][k] * slots,
                                     z1, _sub(bt, j))
                            for j in range(subgroups)])
                    # NEXT round's bins — the fold below still gathers
                    # from THIS round's `bins`
                    nbins, nvis, key_next, _kr = pick_batched(tn, vis, bt)
                # fold: ONE exact t reduce + ONE id reduce for the round
                cat = (lambda xs: jnp.concatenate(xs, axis=0)
                       if subgroups > 1 else xs[0])
                tm_cat = [cat(tms[k]) for k in range(k_bins)]  # (128, slots)
                tmm = tm_cat[0]
                for k in range(1, k_bins):
                    tmm = jnp.minimum(tmm, tm_cat[k])
                t_it = jnp.min(tmm, axis=1, keepdims=True)  # (128,1) exact
                fsp = jnp.where(tm_cat[0] == t_it, ids_k[0], _BIGI)
                for k in range(1, k_bins):
                    fsp = jnp.minimum(
                        fsp, jnp.where(tm_cat[k] == t_it,
                                       ids_k[k], _BIGI))
                fs = jnp.min(fsp, axis=1, keepdims=True)  # (128,1) id
                improved = t_it < bt
                # one-hot gather of the winning slot's attr+woop rows.
                # The id compare runs at full group height BEFORE tile
                # slicing: sub-slicing the (128,1) lane-reduce result `fs`
                # itself does not lower (Mosaic layout pass crash)
                firsts = [(ids_k[k] == fs).astype(jnp.float32)
                          for k in range(k_bins)]
                parts = []
                for j in range(subgroups):
                    acc = None
                    for k in range(k_bins):
                        first = _sub(firsts[k], j)
                        if stream:
                            gs = gat_bufs[k % nbuf][:, :]
                        else:
                            gs = gat_ref[:, pl.ds(pl.multiple_of(
                                bins[j][k] * slots, LANES), slots)]
                        g = _dotg(first, gs, ((1,), (1,)))  # (seg, n_rows)
                        acc = g if acc is None else acc + g
                    parts.append(acc)
                battr_new = cat(parts)
                bt = jnp.where(improved, t_it, bt)
                battr = jnp.where(improved, battr_new, battr)
                return (key_next, nbins, nvis, bt, battr, it + 1)

            vis0 = tuple(jnp.zeros((1, c_pad), jnp.float32)
                         for _ in range(subgroups))
            bt0 = jnp.minimum(tmaxT, _BIG)
            if stream:
                # in-round picks: init key = pre-pick candidate min
                # (dead/converged-group skip); bins0 never swept
                bins0 = [[jnp.int32(0)] * k_bins for _ in range(subgroups)]
                kp0 = jnp.min(jnp.where(tn < bt0, _i32(tn),
                                        jnp.int32(2**31 - 1)))
            else:
                # round-0 pick outside the loop (pipeline prologue); its
                # validity key doubles as the dead/converged-group skip
                bins0, vis0, kp0, _kr0 = pick_batched(tn, vis0, bt0)
            init = (kp0, bins0, vis0, bt0,
                    jnp.zeros((128, n_rows), jnp.float32), jnp.int32(0))
            _, _, _, bt, battr, _ = jax.lax.while_loop(cond, body, init)
            return bt, battr

        def any_group(oT, dT, tminT, tmaxT):
            """Occlusion traversal of one 128-ray group (same pick
            structure as closest_group, no commit fold at all — occlusion
            accumulates elementwise and reduces ONCE per round); returns
            occ (128,1) f32 (0 free / BIG occluded)."""
            tn = fill_tn(oT, dT, tmaxT)
            od = [tuple(_sub(x, j) for x in oT + dT)
                  for j in range(subgroups)]

            def cond(st):
                ok = st[0] < _KEYBIG
                return ok if not cap else ok & (st[4] < cap)

            def body(st):
                _, bins, vis, occ, it = st
                if stream:
                    bins, vis, _kp, key_next = pick_batched(
                        tn, vis, jnp.where(occ > 0.0, -_BIG, tmaxT))
                    nbins, nvis = bins, vis
                hs = []
                if stream:
                    for k in range(min(2, k_bins)):
                        _stream_rt(bins[0][k], k).start()
                    for k in range(k_bins):
                        _stream_rt(bins[0][k], k).wait()
                        if k + 2 < k_bins:
                            _stream_rt(bins[0][k + 2], k + 2).start()
                        hs.append([sweep_tm(od[0], gat_bufs[k % nbuf], 0,
                                            _sub(tminT, 0), _sub(tmaxT, 0))])
                else:
                    for k in range(k_bins):
                        hs.append([
                            sweep_tm(od[j], gat_ref, bins[j][k] * slots,
                                     _sub(tminT, j), _sub(tmaxT, j))
                            for j in range(subgroups)])
                    nbins, nvis, key_next, _kr = pick_batched(
                        tn, vis, jnp.where(occ > 0.0, -_BIG, tmaxT))
                cat = (lambda xs: jnp.concatenate(xs, axis=0)
                       if subgroups > 1 else xs[0])
                hp = cat(hs[0])
                for k in range(1, k_bins):
                    hp = jnp.minimum(hp, cat(hs[k]))
                # ONE reduce: any slot with masked t < BIG occludes
                hit_any = jnp.min(hp, axis=1, keepdims=True) < _BIG
                occ = jnp.maximum(occ, hit_any.astype(jnp.float32) * _BIG)
                return (key_next, nbins, nvis, occ, it + 1)

            vis0 = tuple(jnp.zeros((1, c_pad), jnp.float32)
                         for _ in range(subgroups))
            occ0 = jnp.zeros((128, 1), jnp.float32)
            if stream:
                bins0 = [[jnp.int32(0)] * k_bins for _ in range(subgroups)]
                kp0 = jnp.min(jnp.where(tn < _BIG, _i32(tn),
                                        jnp.int32(2**31 - 1)))
            else:
                bins0, vis0, kp0, _kr0 = pick_batched(tn, vis0, tmaxT)
            _, _, _, occ, _ = jax.lax.while_loop(
                cond, body, (kp0, bins0, vis0, occ0, jnp.int32(0)))
            return occ

        # group-column gather/scatter on (128, ROWS) values: Mosaic has no
        # dynamic slicing of vector values, so column g is extracted with a
        # masked lane reduction and written back with a masked select —
        # both plain VPU ops with a traced g
        gcol = jax.lax.broadcasted_iota(jnp.int32, (128, ROWS), 1)

        def _colg(M, g):
            return jnp.sum(jnp.where(gcol == g, M, 0.0), axis=1,
                           keepdims=True)

        def _putg(M, col_v, g):
            return jnp.where(gcol == g, col_v, M)

        giota3 = jax.lax.broadcasted_iota(
            jnp.int32, (n_rows, ROWS, LANES), 1)

        def closest(o, d, alive):
            """All-group closest hit.  o/d/alive are (ROWS, LANES) shading
            planes; returns lane-oriented planes + n_attr attr planes.  The
            (ROWS,LANES)<->(128,ROWS) relayouts happen once per bounce for
            the whole block.  u/v are recomputed at plane level from the
            gathered Woop rows (exact — the same expressions, in the same
            order, the sweep evaluated; the sweep no longer reduce-sums
            them per chunk)."""
            oT = tuple(_t(x) for x in o)  # (128, ROWS) each
            dT = tuple(_t(x) for x in d)
            tmaxT = _t(jnp.where(alive, _BIG, -_BIG))

            def gbody(g, carry):
                tC, aC = carry
                bt, battr = closest_group(
                    tuple(_colg(x, g) for x in oT),
                    tuple(_colg(x, g) for x in dT),
                    _colg(tmaxT, g))
                # assembled directly in plane orientation (attr-major) so
                # no (ROWS, n_rows, LANES) permute is needed afterwards
                battrT = jnp.transpose(battr)[:, None, :]  # (n_rows,1,128)
                aC = jnp.where(giota3 == g, battrT, aC)
                return (_putg(tC, bt, g), aC)

            zc = jnp.zeros((128, ROWS), jnp.float32)
            aC0 = jnp.zeros((n_rows, ROWS, LANES), jnp.float32)
            tC, battrA = jax.lax.fori_loop(0, ROWS, gbody, (zc + _BIG, aC0))

            tL = _t(tC)  # (ROWS, LANES)
            tmax_l = jnp.where(alive, _BIG, -_BIG)
            hit = tL < jnp.minimum(tmax_l, _BIG)
            attrs = tuple(battrA[i] for i in range(n_attr))
            w = tuple(battrA[n_attr + i] for i in range(11))  # woop rows
            ts = jnp.where(hit, tL, 0.0)
            px = o[0] + ts * d[0]
            py = o[1] + ts * d[1]
            pz = o[2] + ts * d[2]
            bu = px * w[0] + py * w[1] + pz * w[2] + w[9]
            bv = px * w[3] + py * w[4] + pz * w[5] + w[10]
            zf_ = jnp.zeros_like(tL)
            bu = jnp.where(hit, bu, zf_)
            bv = jnp.where(hit, bv, zf_)
            return (jnp.where(hit, tL, _BIG), hit, bu, bv, attrs)

        def any_hit(o, d, t_min, t_max, active):
            oT = tuple(_t(x) for x in o)
            dT = tuple(_t(x) for x in d)
            tminT = _t(t_min)
            tmaxT = _t(jnp.where(active, t_max, -_BIG))

            def gbody(g, occC):
                occ = any_group(
                    tuple(_colg(x, g) for x in oT),
                    tuple(_colg(x, g) for x in dT),
                    _colg(tminT, g), _colg(tmaxT, g))
                return _putg(occC, occ, g)

            occC = jax.lax.fori_loop(
                0, ROWS, gbody, jnp.zeros((128, ROWS), jnp.float32))
            return _t(occC) > 0.0

        lrow = jax.lax.broadcasted_iota(
            jnp.int32, (light_ref.shape[0], LANES), 0)

        def pick_light(seed, bounce):
            if light_mode == "power":
                u = _uniform(seed, bounce, _CH_LIGHT_INDEX)  # (8,128)
                cdf_hi = light_ref[:, 13:14]  # (L8,1); last real row = 2.0
                cdf_lo = light_ref[:, 14:15]  # shifted; first row = -1.0
                sel_rows = None
            else:
                lbits = rng.random_bits(seed, bounce, _CH_LIGHT_INDEX)
                sel_rows = _uniform_mod(lbits, n_lights)  # (8,128) int32
            # per group: (L8,13) x (L8,128) -> (13,128) MXU contraction;
            # rows 0-8 verts, 9-11 emission, 12 select pdf
            lrs = []
            ncols = 16 if grad_cfg else 13  # col 15 = light row id (lidx)
            for g in range(ROWS):
                if light_mode == "power":
                    ug = u[g:g + 1, :]
                    onehot = ((ug >= cdf_lo) & (ug < cdf_hi)).astype(
                        jnp.float32)
                else:
                    onehot = (lrow == sel_rows[g:g + 1, :]).astype(
                        jnp.float32)
                lrs.append(_dotg(light_ref[:, 0:ncols], onehot, ((0,), (0,))))
            lr = jnp.stack(lrs, axis=1)  # (ncols, ROWS, LANES)
            out = ((lr[0], lr[1], lr[2]), (lr[3], lr[4], lr[5]),
                   (lr[6], lr[7], lr[8]), (lr[9], lr[10], lr[11]),
                   lr[12])
            return out + (lr[15],) if grad_cfg else out

        if light_mode == "power":
            sel_pdf_of_hit = lambda a: a[31]  # noqa: E731
        else:
            sel_pdf_of_hit = lambda a: 1.0 / n_lights  # noqa: E731

        if n_attr in (_NA_TEX, _NA_TEX + 1):  # +1: grad scatter-key row
            def modulate(p, a, bu, bv):
                # barycentric blend of baked per-corner texture colors into
                # the reflectance params (path_tracer._texture_modulation's
                # role, vertex-sampled)
                bw = 1.0 - bu - bv
                tr = bw * a[32] + bu * a[35] + bv * a[38]
                tg = bw * a[33] + bu * a[36] + bv * a[39]
                tb = bw * a[34] + bu * a[37] + bv * a[40]
                return (p[0] * tr, p[1] * tg, p[2] * tb) + tuple(p[3:])
        else:
            modulate = None

        if grad_cfg:
            from .mega_grad import make_diffuse_grad_hook

            # the hook accumulates un-contracted gradient partials — the
            # cotangent contraction happens outside the kernel, so this
            # single pass IS the whole gradient computation (round 5)
            grad_hook = make_diffuse_grad_hook(
                list(grad_cfg["rows"]), grad_cfg["n_lights"], kd_ref,
                bidx_row=n_attr - 1)
        else:
            grad_hook = None

        env = None
        if has_env:
            env = dict(
                const=(cam_ref[0, 13], cam_ref[0, 14], cam_ref[0, 15]),
                rot=tuple(cam_ref[0, 16 + i] for i in range(9)),
                pdf=cam_ref[0, 25],
                p_env=(0.5 if has_area else 1.0),
                has_area=has_area,
            )
            if env_hw:
                from .mega import make_env_tab_fns

                env["tab"] = make_env_tab_fns(env_ref, *env_hw)
        body = make_bounce_body(
            cfg, present,
            closest=closest,
            any_hit=any_hit,
            pick_light=pick_light,
            sel_pdf_of_hit=sel_pdf_of_hit,
            fresh=fresh,
            pix=pix, spp=spp,
            modulate=modulate,
            sync_regen=cfg.mega_sync_regen,
            grad_hook=grad_hook,
            env=env,
        )

        o0, d0, seed0 = fresh(jnp.uint32(0))
        zf = jnp.zeros((ROWS, LANES), jnp.float32)
        zi = jnp.zeros((ROWS, LANES), jnp.int32)
        oi = jnp.ones((ROWS, LANES), jnp.int32)
        state = dict(
            ox=o0[0], oy=o0[1], oz=o0[2],
            dx=d0[0], dy=d0[1], dz=d0[2],
            wr=jnp.ones((ROWS, LANES), jnp.float32),
            wg=jnp.ones((ROWS, LANES), jnp.float32),
            wb=jnp.ones((ROWS, LANES), jnp.float32),
            direct_weight=jnp.ones((ROWS, LANES), jnp.float32),
            prev_pdf=jnp.ones((ROWS, LANES), jnp.float32),
            prev_nee=zi,
            was_delta=zi,
            count_emitted=oi,
            done=zi,
            rad_r=zf, rad_g=zf, rad_b=zf,
            rays=zi,
            seed=seed0,
            depth=jnp.zeros((ROWS, LANES), jnp.uint32),
            sample=jnp.zeros((ROWS, LANES), jnp.uint32),
            it=jnp.int32(0),
        )
        if has_env:
            state["prev_nee_any"] = zi
        if grad_cfg:
            from .mega_grad import init_grad_state

            init_grad_state(state, zf, zi, len(grad_cfg["rows"]),
                            grad_cfg["n_lights"])

        def cond(st):
            exhausted = (st["done"] != 0) & (st["sample"] + 1 >= spp)
            return (st["it"] < max_iters) & (~jnp.all(exhausted))

        state = jax.lax.while_loop(cond, body, state)
        rad_r_ref[0] = state["rad_r"]
        rad_g_ref[0] = state["rad_g"]
        rad_b_ref[0] = state["rad_b"]
        rays_ref[0] = state["rays"]
        if grad_cfg:
            from .mega_grad import grad_plane_keys

            for p, k in enumerate(grad_plane_keys(
                    len(grad_cfg["rows"]), grad_cfg["n_lights"])):
                part_ref[0, p] = state[k]

    return kernel


def _pack_tables_bvh(scene: SceneData, light_mode: str, stream: bool = False,
                     grad: bool = False):
    """Device tables for the fused kernel (all jit-traceable).

    Returns (bounds (6, c_pad), gat, light (L8, 16), cam (1,13)).  `gat` is
    the merged gather table: rows [0..n_attr) shading attrs, rows
    [n_attr..n_attr+12) the triangles' Woop rows, zero-padded to a multiple
    of 8 rows — resident layout (n_rows, bins*slots); with stream=True laid
    out per-bin (bins, n_rows, slots) for one merged HBM->VMEM DMA per
    visited bin per traversal round."""
    n_bins, slots = scene.bvh_bins, scene.bvh_bin_slots
    need = n_bins * slots
    # bin bounds, lane-padded with ftb's far-point pattern
    from ..bvh.ftb import _pad_bounds_to_lane, _pad_woop

    bounds, c_pad = _pad_bounds_to_lane(scene.bvh_bin_bounds)
    woop_t = _pad_woop(scene.tri_woop_t, n_bins, slots)

    # attr rows 0-30 exactly as the brute megakernel, + row 31: the
    # light-selection pdf of this triangle's emitter
    _, attr, _light, camv = _pack_tables(scene)
    if light_mode == "power":
        lp = scene.light_prob[jnp.maximum(scene.tri_light_idx, 0)]
        lp = jnp.where(scene.tri_light_idx >= 0, lp, 0.0)
    else:
        lp = jnp.where(scene.tri_light_idx >= 0, 1.0 / scene.num_lights, 0.0)
    attr = jnp.concatenate([attr, lp[None, :]], axis=0)  # (_NA, T)
    if scene.has_textures:
        # rows 32-40: per-corner texture colors (vertex-sampled texturing)
        from .path_tracer import _texture_lookup

        tex_id = scene.bsdf_tex[scene.tri_bsdf]
        zeros = jnp.zeros((scene.tri_uv.shape[0],), jnp.float32)
        corners = []
        for bu_, bv_ in ((0.0, 0.0), (1.0, 0.0), (0.0, 1.0)):
            c = _texture_lookup(scene, scene.tri_uv, tex_id,
                                zeros + bu_, zeros + bv_)
            corners.append(c.T)  # (3, T)
        attr = jnp.concatenate([attr] + corners, axis=0)
    if grad:
        # replay-backward scatter key: the hit's bsdf-table row.  LAST row
        # (after the texture block) so the kernel's fixed texture-row
        # indices (32-40) stay valid; the kernel reads it as a[n_attr-1].
        attr = jnp.concatenate(
            [attr, scene.tri_bsdf[None, :].astype(jnp.float32)], axis=0)
    n_attr = attr.shape[0]
    t = attr.shape[1]
    if t < need:
        attr = jnp.pad(attr, ((0, 0), (0, need - t)))
    # merged gather table: attr rows + the 12 Woop rows (the sweep reads
    # rows n_attr..n_attr+11; the commit gathers ALL rows in one one-hot
    # matmul), zero-padded to 8-row alignment (Mosaic DMA/load shapes)
    n_rows = -(-(n_attr + 12) // 8) * 8
    gat = jnp.concatenate([attr[:, :need], woop_t[:, :need]], axis=0)
    gat = jnp.pad(gat, ((0, n_rows - n_attr - 12), (0, 0)))
    if stream:
        # per-bin blocks: one contiguous (n_rows, slots) DMA per visit.
        # The slot table may be larger than bins*slots (padded
        # independently for other kernels); bins only address the first
        # bins*slots.
        gat = gat.reshape(n_rows, n_bins, slots).transpose(1, 0, 2)

    # light table (L8, 16): 0-8 verts, 9-11 emission, 12 select pdf,
    # 13 cdf_hi (last real row 2.0), 14 cdf_lo (first row -1.0)
    L = scene.num_lights
    L8 = -(-L // 8) * 8
    if light_mode == "power":
        prob = scene.light_prob
        cdf = scene.light_cdf
    else:
        prob = jnp.full((L,), 1.0 / L, jnp.float32)
        cdf = (jnp.arange(L, dtype=jnp.float32) + 1.0) / L
    cdf_hi = jnp.concatenate([cdf[:-1], jnp.asarray([2.0], jnp.float32)])
    cdf_lo = jnp.concatenate([jnp.asarray([-1.0], jnp.float32), cdf[:-1]])
    light = jnp.concatenate(
        [scene.light_pos.reshape(L, 9), scene.light_emission,
         prob[:, None], cdf_hi[:, None], cdf_lo[:, None],
         # col 15: light row id, contracted out as `lidx` in grad mode
         jnp.arange(L, dtype=jnp.float32)[:, None]],
        axis=1,
    )
    if L8 > L:
        pad = jnp.zeros((L8 - L, 16), jnp.float32)
        pad = pad.at[:, 13:15].set(_BIG)  # cdf rows that never select
        light = jnp.concatenate([light, pad], axis=0)
    return bounds, c_pad, gat, light, camv


def table_bytes_for(n_bins: int, slots: int, na: int, n_lights: int) -> int:
    """Fused-kernel VMEM table bytes for a prospective bin layout — shared
    with the build-time residency estimate (scene/data.py) so bin sizing
    and the render-time streaming decision can't disagree (ADVICE r4).
    Row count matches the merged 8-row-padded gather table exactly."""
    n_rows = -(-(na + 12) // 8) * 8
    return 4 * (n_bins * slots * n_rows + n_bins * 128 * 2
                + n_lights * 128)


def mega_bvh_table_bytes(scene: SceneData) -> int:
    na = _NA_TEX if scene.has_textures else _NA
    return table_bytes_for(scene.bvh_bins, scene.bvh_bin_slots, na,
                           scene.num_lights)


def mega_bvh_stream(scene: SceneData) -> bool:
    """Whether the kernel must stream its tables from HBM (huge scenes):
    the whole woop+attr table no longer fits the measured VMEM budget, but
    one bin's rows do — the per-round DMA working set."""
    return mega_bvh_table_bytes(scene) > MEGA_BVH_RESIDENT_BYTES


# Mid-band bin-count cap: bounds the entry-matrix width (c_pad lanes) and
# the per-round candidate-scan cost for large resident scenes.  2048 bins
# of 256 slots cover ~520k triangle slots — past the residency budget for
# any attr layout, so the cap never binds before the byte budget does.
MEGA_BVH_MID_MAX_BINS = 2048

# streaming-mode caps: one bin's double-buffered, 8-row-padded VMEM scratch
# (the ACTUAL allocation: 2 buffers x pad8(na + 12 woop rows) x slots x 4 B)
# must fit the scratch budget, and the (group_r, c_pad) entry matrix must
# stay small
MEGA_BVH_STREAM_BIN_BYTES = 2 * 1024 * 1024
MEGA_BVH_STREAM_MAX_BINS = 4096


def _stream_bin_scratch_bytes(scene: SceneData) -> int:
    na = _NA_TEX if scene.has_textures else _NA
    n_rows = -(-(na + 12) // 8) * 8
    return 2 * n_rows * scene.bvh_bin_slots * 4


def mega_bvh_eligible(scene: SceneData, cfg: RenderConfig) -> bool:
    """Whether the fused BVH megakernel covers this (scene, config)."""
    from .mega import _env_fused_ok

    base = (
        cfg.use_bvh
        and _env_fused_ok(scene)  # constant emitters + small lat-long
        # maps fused (one-hot texel contractions); big maps -> wavefront
        and cfg.light_sampling in ("uniform", "power")
        and scene.num_tris > 0
        and scene.num_lights < (1 << 16)
    )
    if not base:
        return False
    if mega_bvh_table_bytes(scene) <= MEGA_BVH_RESIDENT_BYTES:
        return True
    return (
        _stream_bin_scratch_bytes(scene) <= MEGA_BVH_STREAM_BIN_BYTES
        and scene.bvh_bins <= MEGA_BVH_STREAM_MAX_BINS
    )


def _pix_blocks(cfg: RenderConfig, stream: bool):
    """Host-side block layout.  A block is ROWS*subgroups coherent pixel
    TILES (4x8 pixels for the 32-ray subgroup tiles of resident scenes,
    8x16 for streaming's 128-ray groups): each traversal tile picks and
    sweeps its own bins (a tile's bounce rays share far less AABB
    perimeter than a raster strip, keeping its front-to-back bin union
    small — tools/sim_bins.py), while shading spans the whole 1024-ray
    block at full VPU width.  Out-of-image lanes of edge tiles re-render
    pixel 0 (identical work, identical value — scatter-safe); whole pad
    tiles (when the tile count is not a multiple of tiles-per-block)
    re-render tile 0.

    Returns (pix (n_blocks, ROWS, LANES) int32, valid (n_blocks, BLOCK_R)
    bool) numpy arrays."""
    import numpy as np

    subgroups = _subgroups(stream)
    seg = 128 // subgroups
    TH, TW = (8, 16) if seg == 128 else (4, 8)
    nty, ntx = -(-cfg.height // TH), -(-cfg.width // TW)
    Y = (np.arange(nty)[:, None, None, None] * TH
         + np.arange(TH)[None, None, :, None])
    X = (np.arange(ntx)[None, :, None, None] * TW
         + np.arange(TW)[None, None, None, :])
    Y = np.broadcast_to(Y, (nty, ntx, TH, TW))
    X = np.broadcast_to(X, (nty, ntx, TH, TW))
    valid = (Y < cfg.height) & (X < cfg.width)
    pix_np = np.where(valid, Y * cfg.width + X, 0).astype(np.int32)
    pix_np = pix_np.reshape(nty * ntx, seg)
    valid = valid.reshape(nty * ntx, seg)
    n_tiles = nty * ntx
    tpb = ROWS * subgroups  # tiles per block
    n_blocks = -(-n_tiles // tpb)
    if n_blocks * tpb > n_tiles:
        pad_tiles = n_blocks * tpb - n_tiles
        pix_np = np.concatenate(
            [pix_np, np.broadcast_to(pix_np[0], (pad_tiles, seg))])
        valid = np.concatenate(
            [valid, np.zeros((pad_tiles, seg), bool)])
    # member i of block-local tile L = (row g = L // subgroups, lane
    # segment j = L % subgroups) sits at state plane position
    # (g, j*seg + i) — the coordinates closest_group's _sub slicing reads
    flat_idx = np.concatenate([
        (L // subgroups) * LANES + (L % subgroups) * seg + np.arange(seg)
        for L in range(tpb)
    ])
    pix_blocks = np.zeros((n_blocks, BLOCK_R), np.int32)
    valid_blocks = np.zeros((n_blocks, BLOCK_R), bool)
    pix_blocks[:, flat_idx] = pix_np.reshape(n_blocks, BLOCK_R)
    valid_blocks[:, flat_idx] = valid.reshape(n_blocks, BLOCK_R)
    return pix_blocks.reshape(n_blocks, ROWS, LANES), valid_blocks


def render_mega_bvh_blocks(scene: SceneData, cfg: RenderConfig, pix,
                           timestamp0=0, interpret: bool = False):
    """Run the fused kernel over explicit pixel blocks (from _pix_blocks,
    possibly a shard of them — parallel/dist.py shards the leading block
    axis over the device mesh).  Returns per-lane radiance sums over
    cfg.spp samples + per-lane ray counts, each (n_blocks, ROWS, LANES)."""
    light_mode = cfg.light_sampling
    stream = mega_bvh_stream(scene)
    bounds, c_pad, gat, light, camv = _pack_tables_bvh(
        scene, light_mode, stream=stream)
    n_blocks = pix.shape[0]
    ts = jnp.asarray(timestamp0, jnp.uint32).reshape(1, 1)

    n_attr = _NA_TEX if scene.has_textures else _NA  # logical row count
    n_rows = -(-(n_attr + 12) // 8) * 8
    assert gat.shape[1 if stream else 0] == n_rows
    from .mega import _env_image_hw, _pack_env_table

    env_hw = _env_image_hw(scene)
    kernel = _make_kernel(cfg, scene.bvh_bins, scene.bvh_bin_slots, c_pad,
                          scene.num_lights, scene.kinds_present, light_mode,
                          n_attr=n_attr, stream=stream,
                          has_env=scene.has_envmap,
                          has_area=scene.has_area_lights,
                          env_hw=env_hw)

    blk = pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda x: pl.BlockSpec(  # noqa: E731
        x.shape, lambda i: tuple(0 for _ in x.shape), memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((n_blocks, ROWS, LANES), jnp.float32)
    slots = scene.bvh_bin_slots
    scratch = []
    if stream:
        nbuf = 2
        scratch = ([pltpu.VMEM((n_rows, slots), jnp.float32)] * nbuf
                   + [pltpu.SemaphoreType.DMA] * nbuf)
    extra_in, extra_specs = [], []
    if env_hw:
        etab = _pack_env_table(scene)
        extra_in, extra_specs = [etab], [full(etab)]
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[blk, full(bounds),
                  hbm if stream else full(gat),
                  full(light), smem, smem] + extra_specs,
        out_specs=[blk, blk, blk, blk],
        out_shape=[out_shape, out_shape, out_shape,
                   jax.ShapeDtypeStruct((n_blocks, ROWS, LANES),
                                        jnp.int32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024),
        interpret=interpret,
    )(pix, bounds, gat, light, camv, ts, *extra_in)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_mega_bvh(scene: SceneData, cfg: RenderConfig, timestamp0=0,
                    interpret: bool = False):
    """Render (H, W, 3) radiance (mean over cfg.spp) + total rays traced,
    as one fused persistent kernel per 1024-pixel block."""
    n_pixels = cfg.width * cfg.height
    pix_np, valid = _pix_blocks(cfg, mega_bvh_stream(scene))
    pix = jnp.asarray(pix_np)
    rad_r, rad_g, rad_b, rays = render_mega_bvh_blocks(
        scene, cfg, pix, timestamp0, interpret=interpret)

    pix_flat = pix.reshape(-1)
    valid_flat = jnp.asarray(valid.reshape(-1))
    scatter = lambda x: (  # noqa: E731
        jnp.zeros((n_pixels,), x.dtype).at[pix_flat].set(x.reshape(-1)))
    rad = jnp.stack([scatter(rad_r), scatter(rad_g), scatter(rad_b)], axis=-1)
    nrays = jnp.sum(jnp.where(valid_flat, rays.reshape(-1), 0)
                    .astype(jnp.float32))
    img = (rad / cfg.spp).reshape(cfg.height, cfg.width, 3)
    return img, nrays
