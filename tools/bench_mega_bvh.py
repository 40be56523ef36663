#!/usr/bin/env python
"""Perf decomposition of the fused-BVH megakernel on real TPU.

Sweeps debug_rounds_cap / sync_regen / nee to separate per-round cost from
round counts and traversal from shading.  Keeps every run SHORT (small
configs) so a stuck run can't wedge the tunnel for long.

Usage: python tools/bench_mega_bvh.py [scene.xml] [size] [spp] [depth]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/src/GPUSpectral/assets/scenes"


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else f"{REF}/staircase2/scene.xml"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from gpuspectral_tpu.utils.jaxcache import enable
    enable()
    from gpuspectral_tpu.scene import load_mitsuba_scene
    from gpuspectral_tpu.utils import RenderConfig
    from gpuspectral_tpu.integrator.mega_bvh import (
        render_mega_bvh, mega_bvh_eligible, mega_bvh_table_bytes)

    scene, _ = load_mitsuba_scene(scene_path)
    base = RenderConfig(width=size, height=size, spp=spp, max_depth=depth,
                        ray_batch=size * size, use_bvh=True, jitter=False,
                        light_sampling="power", mis_mode="exact")
    print(f"scene tris={scene.num_tris} bins={scene.bvh_bins} "
          f"slots={scene.bvh_bin_slots} tableMB={mega_bvh_table_bytes(scene)/1e6:.1f} "
          f"eligible={mega_bvh_eligible(scene, base)}")

    def run(tag, cfg):
        t0 = time.time()
        img, nr = render_mega_bvh(scene, cfg, 0)
        np.asarray(img)
        compile_s = time.time() - t0
        t0 = time.time()
        img, nr = render_mega_bvh(scene, cfg, 1)
        np.asarray(img)
        dt = time.time() - t0
        mr = float(nr) / dt / 1e6
        print(f"{tag:36s} compile {compile_s:6.1f}s  steady {dt*1e3:8.1f} ms"
              f"  rays {float(nr)/1e6:7.2f}M  {mr:7.2f} Mrays/s", flush=True)
        return dt, float(nr)

    variants = [
        ("base", base),
        ("cap=1", base.replace(debug_rounds_cap=1)),
        ("cap=2", base.replace(debug_rounds_cap=2)),
        ("cap=4", base.replace(debug_rounds_cap=4)),
        ("cap=8", base.replace(debug_rounds_cap=8)),
        ("nee=off", base.replace(nee=False)),
        ("nee=off cap=2", base.replace(nee=False, debug_rounds_cap=2)),
        ("sync_regen", base.replace(mega_sync_regen=True)),
        ("sync_regen cap=4", base.replace(mega_sync_regen=True,
                                          debug_rounds_cap=4)),
    ]
    for tag, cfg in variants:
        try:
            run(tag, cfg)
        except Exception as e:
            print(f"{tag}: ERROR {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
