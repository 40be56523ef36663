#!/usr/bin/env python
"""Empirically find the usable VMEM per core: compile pallas kernels with
growing VMEM scratch until the compiler refuses.  Informs the table budgets
of the fused kernels (integrator/mega_bvh.MEGA_BVH_TABLE_BYTES,
bvh/binned.MAX_VMEM_SLOTS)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_mb(mb: float) -> bool:
    rows = int(mb * 1024 * 1024) // (128 * 4)

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        o_ref[0, :] = scratch[rows - 1, :] + scratch[0, :]

    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=512 * 1024 * 1024),
        )
        np.asarray(jax.jit(f)(jnp.ones((1, 128), jnp.float32)))
        return True
    except Exception as e:
        print(f"  {mb} MB: {str(e)[:120]}")
        return False


def main():
    print("backend:", jax.default_backend(), jax.devices())
    ok = 0
    for mb in (8, 16, 24, 32, 48, 64, 96, 120):
        good = try_mb(mb)
        print(f"{mb:4d} MB scratch: {'OK' if good else 'FAIL'}", flush=True)
        if good:
            ok = mb
        else:
            break
    print("max OK:", ok, "MB")


if __name__ == "__main__":
    main()
