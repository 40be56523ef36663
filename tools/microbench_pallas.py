#!/usr/bin/env python
"""Calibrate Pallas TPU primitive costs on the attached chip.

The axon tunnel adds ~45 ms fixed overhead per dispatch+fetch, so every
measurement is DIFFERENTIAL: cost(N iters) = time(2N) - time(N).  Work loops
run inside one kernel.

Reports ~cycles @940 MHz per unit of work.
"""

import os
import sys
import time
from functools import partial
import functools
print = functools.partial(print, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, n=3):
    jax.device_get(fn(*args))  # compile + warm
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def diff_cycles(make_run, n1, n2, x):
    t1 = timed(make_run(n1), x)
    t2 = timed(make_run(n2), x)
    return (t2 - t1) * 0.94e9 / (n2 - n1)


# 1. VPU FMA throughput ------------------------------------------------------

def fma_run(reps, planes):
    def kernel(x_ref, o_ref):
        def inner(j, a):
            return a * 1.000001 + 0.5

        o_ref[:, :] = jax.lax.fori_loop(0, reps, inner, x_ref[:, :])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8 * planes, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return run


# 2. gated scalar loop -------------------------------------------------------

def gate_run(iters, frac):
    n_on = int(iters * frac)

    def kernel(g_ref, x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :]

        def body(i, c):
            @pl.when(g_ref[0, i] > 0)
            def _():
                o_ref[:, :] += 1.0
            return c

        jax.lax.fori_loop(0, iters, body, 0)

    @jax.jit
    def run(x):
        g = jnp.zeros((1, iters), jnp.int32).at[0, :n_on].set(1)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(g, x)

    return run


# 3. serial VMEM->SMEM DMA ---------------------------------------------------

def dma_run(n_dma, _unused=None):
    def kernel(x_ref, o_ref, vbuf, sbuf, sem):
        def body(i, c):
            cp = pltpu.make_async_copy(vbuf, sbuf, sem)
            cp.start()
            cp.wait()
            return c + sbuf[0, 0]

        vbuf[0, :] = jnp.zeros((256,), jnp.float32)
        o_ref[0, 0] = jax.lax.fori_loop(0, n_dma, body, jnp.float32(0))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((1, 256), jnp.float32),
                pltpu.SMEM((1, 256), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)

    return run


# 4. cross-lane reduction ----------------------------------------------------

def reduce_run(reps, _unused=None):
    def kernel(x_ref, o_ref):
        def body(i, acc):
            v = x_ref[:, :] + jnp.float32(i)
            return acc + jnp.max(v)  # full cross-lane+sublane max to scalar

        o_ref[0, 0] = jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)

    return run


if __name__ == "__main__":
    x2 = jnp.ones((16, 128), jnp.float32)
    x8 = jnp.ones((64, 128), jnp.float32)
    x1 = jnp.ones((8, 128), jnp.float32)

    c = diff_cycles(lambda n: fma_run(n, 2), 500_000, 1_000_000, x2)
    print(f"FMA (16,128)/iter : {c:7.2f} cycles/iter -> {2*16*128/max(c,1e-9):7.0f} flops/cycle")
    c = diff_cycles(lambda n: fma_run(n, 8), 500_000, 1_000_000, x8)
    print(f"FMA (64,128)/iter : {c:7.2f} cycles/iter -> {2*64*128/max(c,1e-9):7.0f} flops/cycle")

    c = diff_cycles(lambda n: gate_run(n, 0.0), 16_000, 32_000, x1)
    print(f"gated loop skip   : {c:7.2f} cycles/iter")
    c = diff_cycles(lambda n: gate_run(n, 1.0), 16_000, 32_000, x1)
    print(f"gated loop taken  : {c:7.2f} cycles/iter (body = (8,128) +=)")

    c = diff_cycles(lambda n: dma_run(n), 16_000, 32_000, x1)
    print(f"VMEM->SMEM DMA    : {c:7.2f} cycles (serial start+wait, 1KB)")

    c = diff_cycles(lambda n: reduce_run(n), 100_000, 200_000, x1)
    print(f"(8,128)->scalar max: {c:7.2f} cycles/reduction")
