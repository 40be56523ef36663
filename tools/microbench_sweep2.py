#!/usr/bin/env python
"""SUPERSEDED (round 5): this harness times per-call through the axon
tunnel, whose ~28 ms sync RTT dominates the measurement — its absolute
numbers (and the round-4 conclusions drawn from them) are artifacts.
Use tools/mbench.py's call-count-slope protocol (microbench_round5.py,
bench_kernel_true.py) instead.  Kept for the record.

"""
"""Round-5 traversal-design microbench: WHY is the fused-BVH sweep ~3x
slower per vreg-op than the brute kernel, and what form fixes it?

Variants (all: 128 rays x 128-slot chunk, N_ROUNDS sweeps, min-fold to bt):

  vpu_dyn    current mega_bvh form: 12 dynamic-lane-offset row loads per
             chunk, (128,1)x(1,128) broadcast operands   [round-4 baseline]
  vpu_unr    same ops, compile-time-constant offsets (isolates the
             dynamic-slice cost)
  vpu_pre    rows loaded ONCE before the loop (isolates load cost wholly)
  mxu_hi     the affine reformulation: the Woop test's 6 ray-linear fields
             (ou,ov,opz,du,dv,dpz) as ONE (128,8)@(8,6*128) MXU matmul
             (HIGHEST precision) + ~15 elementwise ops
  mxu_df     same with DEFAULT matmul precision
  mxu_fold   mxu_hi + the full commit fold (first-slot mask, u/v extract,
             attr one-hot gather, bt/bu/bv/battr update) — the complete
             closest-hit round body in MXU form

Each prints us/round and the Gtest/s equivalent; compare vpu_dyn against
tools/microbench_sweep.py's `static` (~2.8 us => 5.8 Gtest/s on v5e).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuspectral_tpu.utils.jaxcache import enable

enable()

R = 128
LANE = 128
N_ROUNDS = 512
N_ATTR = 32
_HI = jax.lax.Precision.HIGHEST


def _woop_math(rows, ox, oy, oz, dx, dy, dz, bt):
    ax0, ax1, ax2, ay0, ay1, ay2, az0, az1, az2, bx, by, bz = rows
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
    hit = ok & (t > 0.0) & (t < bt)
    tm = jnp.where(hit, t, 1e30)
    return jnp.minimum(bt, jnp.min(tm, axis=1, keepdims=True))


def make_vpu(mode):
    def kernel(woop_ref, rays_ref, out_ref):
        ox = rays_ref[0:1, :].T
        oy = rays_ref[1:2, :].T
        oz = rays_ref[2:3, :].T
        dx = rays_ref[3:4, :].T
        dy = rays_ref[4:5, :].T
        dz = rays_ref[5:6, :].T
        if mode == "vpu_pre":
            pre = [[woop_ref[i, c * LANE:(c + 1) * LANE][None, :]
                    for i in range(12)] for c in range(4)]

        def body(i, bt):
            if mode == "vpu_dyn":
                off = (i % 4) * LANE
                sl = pl.ds(pl.multiple_of(off, LANE), LANE)
                rows = [woop_ref[k, sl][None, :] for k in range(12)]
                return _woop_math(rows, ox, oy, oz, dx, dy, dz, bt)
            for c in range(4):
                rows = (pre[c] if mode == "vpu_pre" else
                        [woop_ref[k, c * LANE:(c + 1) * LANE][None, :]
                         for k in range(12)])
                bt = _woop_math(rows, ox, oy, oz, dx, dy, dz, bt)
            return bt

        n = N_ROUNDS if mode == "vpu_dyn" else N_ROUNDS // 4
        out_ref[:, :] = jax.lax.fori_loop(
            0, n, body, jnp.full((R, 1), 1e30))

    return kernel


def make_mxu(mode):
    prec = _HI if mode != "mxu_df" else jax.lax.Precision.DEFAULT
    fold = mode == "mxu_fold"

    def kernel(w6_ref, rays8_ref, attr_ref, out_ref):
        r8 = rays8_ref[:, 0:8]  # (128, 8) [ox oy oz 1 dx dy dz 0]
        slot_i = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)

        def body(i, carry):
            bt, bu, bv, battr = carry
            off = (i % 4) * (6 * LANE)
            w6 = w6_ref[0:8, pl.ds(pl.multiple_of(off, 6 * LANE), 6 * LANE)]
            f = jax.lax.dot_general(
                r8, w6, dimension_numbers=(((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            ou = f[:, 0 * LANE:1 * LANE]
            ov = f[:, 1 * LANE:2 * LANE]
            opz = f[:, 2 * LANE:3 * LANE]
            du = f[:, 3 * LANE:4 * LANE]
            dv = f[:, 4 * LANE:5 * LANE]
            dpz = f[:, 5 * LANE:6 * LANE]
            live = jnp.abs(dpz) > 1e-12
            t = -opz / jnp.where(live, dpz, 1.0)
            u = ou + t * du
            v = ov + t * dv
            ok = live & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            hit = ok & (t > 0.0) & (t < bt)
            tm = jnp.where(hit, t, 1e30)
            t_it = jnp.min(tm, axis=1, keepdims=True)
            if fold:
                improved = t_it < bt
                fs = jnp.min(jnp.where(tm == t_it, slot_i, 1 << 30),
                             axis=1, keepdims=True)
                first = ((slot_i == fs) & hit).astype(jnp.float32)
                u_it = jnp.sum(jnp.where(first > 0, u, 0.0), axis=1,
                               keepdims=True)
                v_it = jnp.sum(jnp.where(first > 0, v, 0.0), axis=1,
                               keepdims=True)
                attr_new = jax.lax.dot_general(
                    first, attr_ref[0:N_ATTR, 0:LANE],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=_HI, preferred_element_type=jnp.float32)
                bt = jnp.where(improved, t_it, bt)
                bu = jnp.where(improved, u_it, bu)
                bv = jnp.where(improved, v_it, bv)
                battr = jnp.where(improved, attr_new, battr)
                return bt, bu, bv, battr
            return jnp.minimum(bt, t_it), bu, bv, battr

        z = jnp.zeros((R, 1), jnp.float32)
        bt, bu, bv, battr = jax.lax.fori_loop(
            0, N_ROUNDS, body,
            (jnp.full((R, 1), 1e30), z, z,
             jnp.zeros((R, N_ATTR), jnp.float32)))
        out_ref[:, :] = bt + bu + bv + jnp.sum(battr, axis=1, keepdims=True)

    return kernel


def run(mode):
    rs = np.random.default_rng(0)
    woop = jnp.asarray(rs.normal(size=(12, 4 * LANE)).astype(np.float32))
    rays = jnp.asarray(rs.normal(size=(8, R)).astype(np.float32))
    attr = jnp.asarray(rs.normal(size=(N_ATTR, LANE)).astype(np.float32))

    if mode.startswith("vpu"):
        f = jax.jit(lambda w, r: pl.pallas_call(
            make_vpu(mode),
            out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, r))
        args = (woop, rays)
    else:
        # w6 layout: 4 chunks x (8, 6*LANE): per chunk the six (8, LANE)
        # column blocks [ou ov opz du dv dpz] of the affine map
        wz = np.zeros((4, 8, 6 * LANE), np.float32)
        wnp = np.asarray(woop).reshape(12, 4, LANE).transpose(1, 0, 2)
        for c in range(4):
            ax = wnp[c, 0:3]
            ay = wnp[c, 3:6]
            az = wnp[c, 6:9]
            b = wnp[c, 9:12]
            wz[c, 0:3, 0 * LANE:1 * LANE] = ax
            wz[c, 3, 0 * LANE:1 * LANE] = b[0]
            wz[c, 0:3, 1 * LANE:2 * LANE] = ay
            wz[c, 3, 1 * LANE:2 * LANE] = b[1]
            wz[c, 0:3, 2 * LANE:3 * LANE] = az
            wz[c, 3, 2 * LANE:3 * LANE] = b[2]
            wz[c, 4:7, 3 * LANE:4 * LANE] = ax
            wz[c, 4:7, 4 * LANE:5 * LANE] = ay
            wz[c, 4:7, 5 * LANE:6 * LANE] = az
        w6 = jnp.asarray(np.concatenate(list(wz), axis=1).reshape(8, -1))
        r8 = np.zeros((R, 8), np.float32)
        r8[:, 0:3] = np.asarray(rays)[0:3].T
        r8[:, 3] = 1.0
        r8[:, 4:7] = np.asarray(rays)[3:6].T
        r8j = jnp.asarray(r8)
        f = jax.jit(lambda w, r, a: pl.pallas_call(
            make_mxu(mode),
            out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, r, a))
        args = (w6, r8j, attr)

    np.asarray(f(*args))
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)
    dt = (time.time() - t0) / reps
    ns_round = dt / N_ROUNDS * 1e9
    print(f"{mode:9s} {dt*1e6:9.1f} us/call  {ns_round:8.1f} ns/round "
          f"({R*LANE/ns_round:6.1f} Gtest/s)", flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ("vpu_dyn", "vpu_unr", "vpu_pre",
                             "mxu_hi", "mxu_df", "mxu_fold")
    for mode in modes:
        run(mode)
