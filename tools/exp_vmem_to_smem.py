#!/usr/bin/env python
"""Experiment: can a Pallas TPU kernel move a computed vector (VMEM) into
SMEM so the scalar unit can branch on it later in the SAME kernel?

If yes, a fused megakernel can re-vote BVH clusters per bounce and still get
cheap scalar gating (the two-kernel cluster sweep does this across a kernel
boundary today)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, out_ref, votes_v, votes_s, sem):
    # compute a "vote vector" on the VPU
    votes_v[:, :] = (x_ref[:, :] > 0.5).astype(jnp.int32)
    # DMA it into SMEM
    dma = pltpu.make_async_copy(votes_v, votes_s, sem)
    dma.start()
    dma.wait()

    # scalar-gated accumulation driven by the SMEM copy
    def body(i, acc):
        @pl.when(votes_s[0, i] > 0)
        def _():
            out_ref[0, 0] += 1.0
        return acc

    out_ref[0, 0] = 0.0
    jax.lax.fori_loop(0, votes_s.shape[1], body, 0)


def main():
    x = jnp.linspace(0, 1, 128).reshape(1, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SMEM((1, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    expect = int((x > 0.5).sum())
    print("result:", float(out[0, 0]), "expected:", expect)
    assert float(out[0, 0]) == expect
    print("VMEM->SMEM in-kernel DMA works")


if __name__ == "__main__":
    main()
