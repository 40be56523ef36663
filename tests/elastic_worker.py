"""Worker for tests/test_elastic.py: one simulated host of an elastic gang.

argv: ckpt_path total_frames fault_at(host1 only; -1 = none)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

from gpuspectral_tpu.parallel import launch
from gpuspectral_tpu.parallel.elastic import render_chunks
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils import RenderConfig


def main() -> int:
    ckpt, total, fault_at = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    launch.initialize()
    scene, _ = load_mitsuba_scene(
        str(pathlib.Path(__file__).resolve().parents[1]
            / "scenes/cornell/scene.xml"))
    cfg = RenderConfig(width=16, height=8, spp=2, max_depth=2, ray_batch=64)
    mesh = launch.pod_mesh(spp_shards=1)
    host_id = int(os.environ["GPUSPECTRAL_FAKE_HOST_ID"])
    my_fault = fault_at if (host_id == 1 and jax.process_count() > 1) else -1
    render_chunks(scene, cfg, mesh, total, ckpt, chunk_frames=1,
                  _fault_at=my_fault)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
