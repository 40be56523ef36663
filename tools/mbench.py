"""RTT-immune microbench harness for Pallas kernel variants.

The axon tunnel costs ~28 ms per host sync, which swamped round-4's
per-call timings (tools/microbench_sweep.py's 2.8 us/round "compute
bound" figure was mostly tunnel latency).  This harness times each
kernel at TWO inner-round counts and reports the delta slope, so every
fixed cost (RTT, dispatch, pallas call setup) cancels.

Usage: build kernels taking an SMEM (1,1) `n_rounds` scalar; call
`measure(make_fn, args, lo, hi)` -> ns/round.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(f, args, lo=2048, hi=34816, reps=3, verbose=False):
    """f(n, *args) jitted with static n.  Returns ns/round via slope."""
    walls = {}
    for n in (lo, hi):
        g = jax.jit(lambda *a: f(n, *a))
        np.asarray(g(*args))  # compile + warm
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            np.asarray(g(*args))
            best = min(best, time.time() - t0)
        walls[n] = best
        if verbose:
            print(f"    n={n}: {best*1e3:.2f} ms")
    return (walls[hi] - walls[lo]) / (hi - lo) * 1e9
