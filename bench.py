#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Covers the full declared metric (BASELINE.json): Mrays/s at Cornell box
512x512 @ 64 spp depth 50 (rays actually traced: closest-hit + shadow),
grad-steps/s at Cornell 512^2@64spp (depth 5), config 3 (test3 glossy,
512^2 @ 32 spp), and the BVH-scale scenes staircase2 (31k tris) and
coffee (168k tris, HBM-streaming fused kernel).  The reference publishes
no numbers (BASELINE.md), so vs_baseline is reported against the
north-star working target of 100 Mrays/s/chip.

Each row runs in its own subprocess: a TPU worker crash (or watchdog
kill) in one row must not poison the rest — round 2's coffee row died
mid-bench and took the grad row with it.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

TARGET_MRAYS = 100.0
REF_SCENES = "/root/reference/src/GPUSpectral/assets/scenes"
ROW_TIMEOUT_S = 420


def run_row(name: str):
    """One benchmark row, printed as a JSON line (subprocess entry)."""
    from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    import argparse

    from gpuspectral_tpu.utils.bench import run_benchmark, run_grad_benchmark

    cornell = os.path.join(HERE, "scenes/cornell/scene.xml")

    def render_args(scene, spp, bvh):
        return argparse.Namespace(
            scene=scene, output="/dev/null", spp=spp, size="512x512",
            depth=None, no_nee=False, jitter=False, tonemap=False, seed=0,
            ray_batch=65536, metrics=None, warmup=1, iters=2, bvh=bvh,
            intersector="auto", packet_size=1024,
        )

    if name == "cornell":
        out = run_benchmark(render_args(cornell, 64, False))
    elif name == "test3_32spp":
        out = run_benchmark(
            render_args(os.path.join(REF_SCENES, "test3/scene.xml"), 32, False))
    elif name == "staircase2":
        # spp=4 iterations for wall-clock; Mrays/s is the declared metric
        # and is spp-independent (rays actually traced per second)
        out = run_benchmark(
            render_args(os.path.join(REF_SCENES, "staircase2/scene.xml"), 4, True))
    elif name == "coffee":
        out = run_benchmark(
            render_args(os.path.join(REF_SCENES, "coffee/scene.xml"), 4, True))
    elif name == "grad":
        out = run_grad_benchmark(cornell, steps=3)
    else:
        raise SystemExit(f"unknown row {name}")
    print("ROW_JSON:" + json.dumps(out))


def main() -> int:
    if len(sys.argv) == 3 and sys.argv[1] == "--row":
        run_row(sys.argv[2])
        return 0

    detail = {}
    rows = ["cornell", "test3_32spp", "staircase2", "coffee", "grad"]
    for name in rows:
        if name not in ("cornell", "grad") and not os.path.isdir(REF_SCENES):
            continue
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--row", name],
                capture_output=True, text=True, timeout=ROW_TIMEOUT_S,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("ROW_JSON:")),
                None,
            )
            if line is None:
                detail[name] = {
                    "error": (p.stderr.strip().splitlines() or ["no output"])[-1][:300]
                }
            else:
                detail[name] = json.loads(line[len("ROW_JSON:"):])
        except subprocess.TimeoutExpired:
            detail[name] = {"error": f"row timed out after {ROW_TIMEOUT_S}s"}
        except Exception as e:  # noqa: BLE001 — keep the headline alive
            detail[name] = {"error": str(e)[:300]}

    mrays = detail.get("cornell", {}).get("mrays_per_s", 0.0)
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
