#!/usr/bin/env python
"""True fused-kernel frame time via call-count slope.

Through the axon tunnel a single timed call carries ~25 ms of RTT/dispatch
overhead and a full-image transfer ~100 ms/MB — both swamped small frames
and poisoned every round-4 A/B (BASELINE.md round-5 notes).  This harness
times N and 4N chained calls with ONE scalar-reduce sync each and reports
the slope, which cancels every per-measurement constant.

Usage: bench_kernel_true.py <scene.xml> [WxH] [spp] [depth] [bin_target]
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gpuspectral_tpu.utils.jaxcache import enable

enable()

from gpuspectral_tpu.integrator import mega_bvh as mb  # noqa: E402
from gpuspectral_tpu.scene import load_mitsuba_scene  # noqa: E402
from gpuspectral_tpu.utils import RenderConfig  # noqa: E402


@jax.jit
def _red(img, nr):
    return jnp.sum(img) + nr


def frame_time(scene, cfg, n_lo=3, n_hi=12, reps=2):
    img, nr = mb.render_mega_bvh(scene, cfg, 0)
    t0 = time.time()
    float(_red(img, nr))
    compile_s = time.time() - t0
    walls = {}
    for n in (n_lo, n_hi):
        best = 1e9
        for r in range(reps):
            t0 = time.time()
            for i in range(n):
                img, nr = mb.render_mega_bvh(scene, cfg, 100 + r * n + i)
            float(_red(img, nr))
            best = min(best, time.time() - t0)
        walls[n] = best
    dt = (walls[n_hi] - walls[n_lo]) / (n_hi - n_lo)
    return dt, float(nr), compile_s


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml")
    size = sys.argv[2] if len(sys.argv) > 2 else "128x128"
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    w, h = (int(x) for x in size.split("x"))
    if len(sys.argv) > 5 and int(sys.argv[5]):
        import gpuspectral_tpu.bvh.build as bd

        bd.BIN_TARGET = int(sys.argv[5])
        bd.BIN_TARGET_STREAM = int(sys.argv[5])
        print(f"BIN_TARGET(_STREAM)={bd.BIN_TARGET}")
    if len(sys.argv) > 6:
        mb.ROUND_SLOTS = int(sys.argv[6])
        print(f"ROUND_SLOTS={mb.ROUND_SLOTS}")
    scene, _ = load_mitsuba_scene(scene_path)
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=depth,
                       ray_batch=w * h, use_bvh=True, jitter=False,
                       light_sampling="power", mis_mode="exact")
    dt, nr, compile_s = frame_time(scene, cfg)
    print(f"{scene_path.split('/')[-2]} {size}@{spp}spp d{depth}: "
          f"frame {dt*1e3:.1f} ms  {nr/1e6:.2f}M rays  "
          f"{nr/dt/1e6:.2f} Mrays/s  (compile {compile_s:.0f}s, "
          f"bins {scene.bvh_bins}x{scene.bvh_bin_slots})", flush=True)


if __name__ == "__main__":
    main()
