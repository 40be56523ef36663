#!/usr/bin/env python
"""SUPERSEDED (round 5): this harness times per-call through the axon
tunnel, whose ~28 ms sync RTT dominates the measurement — its absolute
numbers (and the round-4 conclusions drawn from them) are artifacts.
Use tools/mbench.py's call-count-slope protocol (microbench_round5.py,
bench_kernel_true.py) instead.  Kept for the record.

"""
"""Isolate the fused-BVH kernel's per-round costs on real TPU.

Three kernels, same (128 rays x 128 slots) Woop sweep body, N rounds each:
  static : fixed chunk offset per round (pure sweep throughput)
  dyn    : offset from a vector->scalar argmin pick per round (the ftb
           pick chain: candidate scan + vector-domain argmin + scalar
           extraction + dynamic slice)
  gather : static sweep + the per-chunk attr one-hot MXU gather (A rows)

Prints ns/round and derived Mrays/s-equivalents so the kernel's cost model
(sweep vs pick vs gather) is grounded in hardware numbers, not guesses.
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
C_PAD = 256
N_ATTR = 32


def woop_sweep(woop_ref, off, ox, oy, oz, dx, dy, dz, bt):
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
    hit = ok & (t > 0.0) & (t < bt)
    tm = jnp.where(hit, t, 1e30)
    t_it = jnp.min(tm, axis=1, keepdims=True)
    return jnp.minimum(bt, t_it), tm, u, v, hit


def make(mode):
    def kernel(woop_ref, rays_ref, tn_ref, out_ref):
        ox = rays_ref[0:1, :].T
        oy = rays_ref[1:2, :].T
        oz = rays_ref[2:3, :].T
        dx = rays_ref[3:4, :].T
        dy = rays_ref[4:5, :].T
        dz = rays_ref[5:6, :].T
        col = jax.lax.broadcasted_iota(jnp.int32, (1, C_PAD), 1)
        slot_i = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)

        def body(i, carry):
            bt, vis, acc = carry
            if mode == "dyn":
                cand = jnp.where(tn_ref[:, :] + vis < bt, tn_ref[:, :], 1e30)
                m = jnp.min(cand, axis=0, keepdims=True)
                mn = jnp.min(m, axis=1, keepdims=True)
                bv = jnp.min(jnp.where(m == mn, col, 1 << 30), axis=1,
                             keepdims=True)
                vis = jnp.where(col == bv, 1e30, vis)
                off = bv[0, 0] * LANE
            else:
                off = (i % 4) * LANE
            bt, tm, u, v, hit = woop_sweep(
                woop_ref, off, ox, oy, oz, dx, dy, dz, bt)
            if mode == "gather":
                t_it = jnp.min(tm, axis=1, keepdims=True)
                fs = jnp.min(jnp.where(tm == t_it, slot_i, 1 << 30), axis=1,
                             keepdims=True)
                first = ((slot_i == fs) & hit).astype(jnp.float32)
                attr = jax.lax.dot_general(
                    first, woop_ref[0:N_ATTR, 0:LANE],
                    dimension_numbers=((((1,), (1,))), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(attr, axis=1, keepdims=True)
            return bt, vis, acc

        z = jnp.zeros((R, 1), jnp.float32)
        bt, _, acc = jax.lax.fori_loop(
            0, N_ROUNDS, body,
            (jnp.full((R, 1), 1e30), jnp.zeros((1, C_PAD), jnp.float32), z))
        out_ref[:, :] = bt + acc

    return kernel


def run(mode):
    rs = np.random.default_rng(0)
    woop = jnp.asarray(rs.normal(size=(32, 8 * LANE)).astype(np.float32))
    rays = jnp.asarray(rs.normal(size=(8, R)).astype(np.float32))
    tn = jnp.asarray(
        np.abs(rs.normal(size=(R, C_PAD))).astype(np.float32) * 10)

    f = jax.jit(lambda w, r, t: pl.pallas_call(
        make(mode),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, r, t))
    np.asarray(f(woop, rays, tn))
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        out = f(woop, rays, tn)
    np.asarray(out)
    dt = (time.time() - t0) / reps
    ns_round = dt / N_ROUNDS * 1e9
    print(f"{mode:8s} {dt*1e6:9.1f} us/call  {ns_round:8.1f} ns/round "
          f"({ns_round/R:6.2f} ns/ray-slotchunk; "
          f"{R*LANE/ns_round:6.1f} Gtest/s)", flush=True)


if __name__ == "__main__":
    for mode in ("static", "dyn", "gather"):
        run(mode)
