#!/usr/bin/env python
"""A/B the streaming vs VMEM-resident fused-BVH path on the big scenes.

Round-5 finding (tools/probe_vmem.py ON REAL HARDWARE): 120 MB of VMEM
scratch compiles AND runs on v5e — the ~16 MB "usable VMEM" figure that
sized MEGA_BVH_TABLE_BYTES was a compiler-guardrail artifact.  coffee's
(51 MB) and living-room's (99 MB) gather tables fit resident, removing
the per-round HBM DMA round-trips that bound those scenes at
~1.5 Mrays/s (BASELINE.md round 5).

Usage: python tools/resident_ab.py [scene ...]  (default coffee)
Renders each scene at 256^2 @ 4 spp, prints Mrays/s (slope-style: warmup
+ timed reps with one scalar sync) and saves the image to
/tmp/resident_ab_<scene>_<mode>.npy for cross-mode comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig

REF = "/root/reference/src/GPUSpectral/assets/scenes"


def main():
    scenes = sys.argv[1:] or ["coffee"]
    from gpuspectral_tpu.integrator import mega_bvh
    from gpuspectral_tpu.integrator.mega_bvh import (
        mega_bvh_stream, render_mega_bvh)

    for name in scenes:
        scene, scfg = load_mitsuba_scene(f"{REF}/{name}/scene.xml")
        cfg = RenderConfig(
            width=256, height=256, spp=4, max_depth=scfg.max_depth,
            use_bvh=True, jitter=False)
        stream = mega_bvh_stream(scene)
        mode = "stream" if stream else "resident"
        t0 = time.perf_counter()
        img, nrays = render_mega_bvh(scene, cfg)
        float(jnp_sum(img))
        compile_s = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            img, nrays = render_mega_bvh(scene, cfg, timestamp0=0)
        s = float(jnp_sum(img)) + float(nrays)
        dt = (time.perf_counter() - t0) / reps
        mrays = float(nrays) / dt / 1e6
        np.save(f"/tmp/resident_ab_{name}_{mode}.npy", np.asarray(img))
        print(f"{name}: mode={mode} table="
              f"{mega_bvh.mega_bvh_table_bytes(scene)/2**20:.1f}MB "
              f"compile={compile_s:.1f}s frame={dt*1e3:.1f}ms "
              f"Mrays/s={mrays:.2f} checksum={s:.6g}")


def jnp_sum(x):
    import jax.numpy as jnp

    return jax.jit(jnp.sum)(x)


if __name__ == "__main__":
    main()
