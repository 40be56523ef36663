#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Covers the full declared metric (BASELINE.json): Mrays/s at Cornell box
512x512 @ 64 spp depth 50 (rays actually traced: closest-hit + shadow),
grad-steps/s at Cornell 512^2@64spp (depth 5), and a BVH-scale scene row
(staircase2, 31k triangles).  The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against the north-star working
target of 100 Mrays/s/chip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_MRAYS = 100.0
REF_SCENES = "/root/reference/src/GPUSpectral/assets/scenes"


def main() -> int:
    import argparse

    from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    from gpuspectral_tpu.utils.bench import run_benchmark, run_grad_benchmark

    here = os.path.dirname(os.path.abspath(__file__))
    cornell = os.path.join(here, "scenes/cornell/scene.xml")

    def render_args(scene, spp, bvh):
        return argparse.Namespace(
            scene=scene, output="/dev/null", spp=spp, size="512x512",
            depth=None, no_nee=False, jitter=False, tonemap=False, seed=0,
            ray_batch=65536, metrics=None, warmup=1, iters=2, bvh=bvh,
            intersector="auto", packet_size=1024,
        )

    detail = {}
    # 1. headline: Cornell 512^2 @ 64 spp (fused Pallas megakernel)
    result = run_benchmark(render_args(cornell, 64, False))
    detail["cornell"] = result

    # 2. config 3 (the reference's default demo scene): test3 glossy,
    #    declared 512^2 @ 32 spp (megakernel path)
    t3 = os.path.join(REF_SCENES, "test3/scene.xml")
    if os.path.exists(t3):
        try:
            detail["test3_32spp"] = run_benchmark(render_args(t3, 32, False))
        except Exception as e:
            detail["test3_32spp"] = {"error": str(e)[:300]}

    # 3. BVH-scale scenes: staircase2 (31k tris) and coffee (168k).
    #    spp=4 iterations for wall-clock; Mrays/s is the declared metric and
    #    is spp-independent (reported rays/second of rays actually traced)
    stair = os.path.join(REF_SCENES, "staircase2/scene.xml")
    if os.path.exists(stair):
        try:
            detail["staircase2"] = run_benchmark(render_args(stair, 4, True))
        except Exception as e:  # keep the headline even if the BVH row fails
            detail["staircase2"] = {"error": str(e)[:300]}
    coffee = os.path.join(REF_SCENES, "coffee/scene.xml")
    if os.path.exists(coffee):
        try:
            detail["coffee"] = run_benchmark(render_args(coffee, 4, True))
        except Exception as e:
            detail["coffee"] = {"error": str(e)[:300]}

    # 4. gradient-step throughput (path-replay backprop), median of 3
    try:
        detail["grad"] = run_grad_benchmark(cornell, steps=3)
    except Exception as e:
        detail["grad"] = {"error": str(e)[:300]}

    mrays = result["mrays_per_s"]
    print(
        json.dumps(
            {
                "metric": "cornell_512_64spp_mrays_per_s",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / TARGET_MRAYS, 4),
                "staircase2_mrays_per_s": round(
                    detail.get("staircase2", {}).get("mrays_per_s", 0.0), 3
                ),
                "coffee_mrays_per_s": round(
                    detail.get("coffee", {}).get("mrays_per_s", 0.0), 3
                ),
                "test3_mrays_per_s": round(
                    detail.get("test3_32spp", {}).get("mrays_per_s", 0.0), 3
                ),
                "grad_steps_per_s_512_64spp_d5": round(
                    detail.get("grad", {}).get("grad_steps_per_s", 0.0), 4
                ),
                "detail": detail,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
