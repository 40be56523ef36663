#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Headline config (BASELINE.json): Cornell box 512x512 @ 64 spp.  Reports
measured Mrays/s on the current chip (rays actually traced: closest-hit +
shadow).  The reference publishes no numbers (BASELINE.md), so vs_baseline
is reported against the north-star working target of 100 Mrays/s/chip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_MRAYS = 100.0


def main() -> int:
    import argparse

    from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    from gpuspectral_tpu.utils.bench import run_benchmark

    scene_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scenes/cornell/scene.xml")
    args = argparse.Namespace(
        scene=scene_path,
        output="/dev/null",
        spp=16,
        size="512x512",
        depth=None,
        no_nee=False,
        jitter=False,
        tonemap=False,
        seed=0,
        ray_batch=65536,
        metrics=None,
        warmup=1,
        iters=2,
    )
    result = run_benchmark(args)
    print(
        json.dumps(
            {
                "metric": "cornell_512_mrays_per_s",
                "value": round(result["mrays_per_s"], 2),
                "unit": "Mrays/s",
                "vs_baseline": round(result["mrays_per_s"] / TARGET_MRAYS, 4),
                "detail": result,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
