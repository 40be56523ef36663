"""Benchmark harness: measured Mrays/s on compiled, steady-state renders.

Mrays/s counts rays actually traced (closest-hit + shadow), instrumented in
the integrator — not a W*H*spp*depth upper bound.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def run_benchmark(args) -> dict:
    from ..cli.main import _build
    from ..integrator import render_image_stats_auto as render_image_stats

    scene, cfg = _build(args)
    warmup = getattr(args, "warmup", 1)
    iters = getattr(args, "iters", 3)

    import jax.numpy as jnp

    # NB: host transfer (np.asarray) is the sync point — block_until_ready
    # does not reliably block through the axon TPU tunnel.  timestamp0 is
    # passed as a device array so each iteration reuses the same executable.
    t0 = time.time()
    img, nrays = render_image_stats(scene, cfg, jnp.uint32(0))
    np.asarray(img)
    compile_s = time.time() - t0
    for i in range(max(0, warmup - 1)):
        np.asarray(render_image_stats(scene, cfg, jnp.uint32(i + 1))[0])

    times = []
    for i in range(iters):
        t0 = time.time()
        img, nrays = render_image_stats(scene, cfg, jnp.uint32(100 + i))
        np.asarray(img)
        times.append(time.time() - t0)
    nrays = float(np.asarray(nrays))

    seconds = float(np.median(times))
    total_rays = float(nrays)
    n_paths = cfg.width * cfg.height * cfg.spp
    return {
        "scene": args.scene,
        "width": cfg.width,
        "height": cfg.height,
        "spp": cfg.spp,
        "max_depth": cfg.max_depth,
        "compile_seconds": round(compile_s, 2),
        "seconds_per_frame": seconds,
        "rays_traced": total_rays,
        "mrays_per_s": total_rays / seconds / 1e6,
        "mpaths_per_s": n_paths / seconds / 1e6,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
