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

    # NB: a host transfer is the sync point — block_until_ready does not
    # reliably block through the axon TPU tunnel.  The TIMED transfer is a
    # device-side scalar reduce of the image: transferring the full image
    # costs ~28 ms RTT + ~100 ms/MB through the tunnel (measured round 5)
    # and was inflating every small/fast frame's wall time.  timestamp0 is
    # passed as a device array so each iteration reuses one executable.
    t0 = time.time()
    img, nrays = render_image_stats(scene, cfg, jnp.uint32(0))
    np.asarray(img)
    compile_s = time.time() - t0
    for i in range(max(0, warmup - 1)):
        float(jnp.sum(render_image_stats(scene, cfg, jnp.uint32(i + 1))[0]))

    times = []
    for i in range(iters):
        t0 = time.time()
        img, nrays = render_image_stats(scene, cfg, jnp.uint32(100 + i))
        float(jnp.sum(img))
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


def run_grad_benchmark(scene_path: str, size: int = 512, spp: int = 64,
                       depth: int = 5, ray_batch: int = 65536,
                       steps: int = 2, use_bvh: bool = False) -> dict:
    """Gradient-step throughput at the headline config (BASELINE.json
    metric: grad-steps/s on Cornell 512^2@64spp): one Adam-less
    value_and_grad of the MSE against a fixed target through the
    path-replay-differentiable renderer."""
    import jax
    import jax.numpy as jnp

    from ..integrator.path_tracer import render_sample
    from ..scene import load_mitsuba_scene
    from ..utils.config import RenderConfig

    scene, _ = load_mitsuba_scene(scene_path)
    cfg = RenderConfig(width=size, height=size, spp=spp, max_depth=depth,
                       ray_batch=ray_batch, grad_remat="sample",
                       use_bvh=use_bvh)
    n_pixels = size * size
    target = jnp.zeros((n_pixels, 3), jnp.float32)

    from ..integrator.mega_grad import (
        mega_bvh_grad_eligible, mega_grad_eligible, render_mega_bvh_diff,
        render_mega_diff)

    render_diff = None
    kernel_name = "xla"
    if jax.default_backend() == "tpu":
        # fused path-replay kernels: forward = megakernel, backward = replay
        # kernel (integrator/mega_grad.py); BVH scenes use the fused-BVH
        # pair (VERDICT r3 #5a)
        if mega_grad_eligible(scene, cfg):
            render_diff, kernel_name = render_mega_diff, "mega"
        elif mega_bvh_grad_eligible(scene, cfg):
            render_diff, kernel_name = render_mega_bvh_diff, "mega_bvh"
    if render_diff is not None:
        @jax.jit
        def grad_step(params, ts):
            def loss(p):
                sc = scene.replace(bsdf_params=p)
                img = render_diff(sc, cfg, ts).reshape(n_pixels, 3)
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss)(params)
    else:
        grad_step = None

    @jax.jit
    def grad_step_xla(params, ts):
        def loss(p):
            sc = scene.replace(bsdf_params=p)
            nb = n_pixels // ray_batch
            pix = jnp.arange(n_pixels, dtype=jnp.uint32).reshape(nb, ray_batch)

            def pix_batch(pb):
                # sample-level remat: replay across samples, store residuals
                # within one (see RenderConfig.grad_remat)
                @jax.checkpoint
                def body(acc, s):
                    rad, _ = render_sample(sc, cfg.replace(spp=1), pb, ts + s,
                                           differentiable=True)
                    return acc + rad, None

                acc, _ = jax.lax.scan(body, jnp.zeros((ray_batch, 3), jnp.float32),
                                      jnp.arange(spp, dtype=jnp.uint32))
                return acc / spp

            img = jax.lax.map(pix_batch, pix).reshape(n_pixels, 3)
            return jnp.mean((img - target) ** 2)

        return jax.value_and_grad(loss)(params)

    if grad_step is None:
        grad_step = grad_step_xla

    t0 = time.time()
    _, g = grad_step(scene.bsdf_params, jnp.uint32(0))
    np.asarray(g)
    compile_s = time.time() - t0
    times = []
    for i in range(steps):
        t0 = time.time()
        _, g = grad_step(scene.bsdf_params, jnp.uint32(i + 1))
        np.asarray(g)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    out = {
        "seconds_per_step": dt,
        "grad_steps_per_s": 1.0 / dt,
        "mpaths_per_s_fwd_bwd": n_pixels * spp / dt / 1e6,
        "compile_seconds": round(compile_s, 1),
        "size": size, "spp": spp, "max_depth": depth,
        "kernel": kernel_name,
    }
    try:  # best effort: peak HBM (not all backends expose memory_stats)
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            out["peak_hbm_gb"] = round(peak / 2**30, 3)
    except Exception:  # noqa: BLE001
        pass
    return out
