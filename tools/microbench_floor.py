#!/usr/bin/env python
"""SUPERSEDED (round 5): this harness times per-call through the axon
tunnel, whose ~28 ms sync RTT dominates the measurement — its absolute
numbers (and the round-4 conclusions drawn from them) are artifacts.
Use tools/mbench.py's call-count-slope protocol (microbench_round5.py,
bench_kernel_true.py) instead.  Kept for the record.

"""
"""Where does the ~2.7us/round floor of every sweep variant come from?

Variants (same fori_loop harness as microbench_sweep2, N_ROUNDS=512):
  nop        body = one add on (128,128)              -> loop overhead
  ops10      10 elementwise ops on (128,128), no loads
  ops38      38 elementwise ops on (128,128), no loads (sweep-sized body)
  loads12    12 dynamic-offset row loads + 12 adds
  reduce1    one add + lane-min reduce (128,128)->(128,1) + (128,1) min
  reduce4    4x (add + reduce + narrow min)           -> reduce scaling
  narrow20   20 elementwise ops on (128,1)            -> narrow-op cost
  sub20      20 elementwise ops on (8,128)            -> 1-vreg op cost
  subred     (8,128) body: add + lane-min to (8,1) + min  -> cheap-shape reduce
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


def make(mode):
    def kernel(woop_ref, rays_ref, out_ref):
        x0 = rays_ref[0:1, :].T + jnp.zeros((R, LANE), jnp.float32)

        def body(i, carry):
            acc, nar = carry
            if mode == "nop":
                acc = acc + 1.0
            elif mode in ("ops10", "ops38"):
                n = 10 if mode == "ops10" else 38
                v = acc
                for k in range(n // 2):
                    v = v * 1.0000001 + 0.5
                acc = v
            elif mode == "loads12":
                off = (i % 4) * LANE
                sl = pl.ds(pl.multiple_of(off, LANE), LANE)
                v = acc
                for k in range(12):
                    v = v + woop_ref[k, sl][None, :]
                acc = v
            elif mode in ("reduce1", "reduce4"):
                reps = 1 if mode == "reduce1" else 4
                v = acc
                for k in range(reps):
                    v = v + 1.0
                    m = jnp.min(v, axis=1, keepdims=True)
                    nar = jnp.minimum(nar, m)
                acc = v
            elif mode == "narrow20":
                v = nar
                for k in range(10):
                    v = v * 1.0000001 + 0.5
                nar = v
                acc = acc + 1.0
            return acc, nar

        acc, nar = jax.lax.fori_loop(
            0, N_ROUNDS, body, (x0, jnp.full((R, 1), 1e30)))
        out_ref[:, :] = acc + nar

    def kernel_sub(woop_ref, rays_ref, out_ref):
        x0 = rays_ref[0:8, :] * 1.0

        def body(i, carry):
            acc, nar = carry
            if mode == "sub20":
                v = acc
                for k in range(10):
                    v = v * 1.0000001 + 0.5
                acc = v
            else:  # subred
                acc = acc + 1.0
                m = jnp.min(acc, axis=1, keepdims=True)
                nar = jnp.minimum(nar, m)
            return acc, nar

        acc, nar = jax.lax.fori_loop(
            0, N_ROUNDS, body, (x0, jnp.full((8, 1), 1e30)))
        out_ref[0:8, :] = acc + nar

    return kernel_sub if mode in ("sub20", "subred") else kernel


def run(mode):
    rs = np.random.default_rng(0)
    woop = jnp.asarray(rs.normal(size=(12, 4 * LANE)).astype(np.float32))
    rays = jnp.asarray(rs.normal(size=(8, R)).astype(np.float32))

    f = jax.jit(lambda w, r: pl.pallas_call(
        make(mode),
        out_shape=jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, r))
    np.asarray(f(woop, rays))
    t0 = time.time()
    reps = 30
    for _ in range(reps):
        out = f(woop, rays)
    np.asarray(out)
    dt = (time.time() - t0) / reps
    ns_round = dt / N_ROUNDS * 1e9
    print(f"{mode:9s} {dt*1e6:9.1f} us/call  {ns_round:8.1f} ns/round",
          flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ("nop", "ops10", "ops38", "loads12", "reduce1",
                             "reduce4", "narrow20", "sub20", "subred")
    for mode in modes:
        run(mode)
