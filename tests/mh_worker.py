"""Worker process for tests/test_multihost.py: one simulated host.

Invoked with GPUSPECTRAL_FAKE_HOSTS / GPUSPECTRAL_FAKE_HOST_ID /
GPUSPECTRAL_COORDINATOR set; runs the sharded render + gradient step over
the global (all-process) device mesh and writes results (coordinator only)
to the npz path in argv[1]."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from gpuspectral_tpu.parallel import launch
from gpuspectral_tpu.parallel.dist import grad_step_sharded, render_image_sharded
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils import RenderConfig


def main() -> int:
    out_path = sys.argv[1]
    launch.initialize()  # GPUSPECTRAL_FAKE_HOSTS env drives everything
    assert jax.process_count() == int(os.environ["GPUSPECTRAL_FAKE_HOSTS"]), (
        jax.process_count()
    )
    scene, _ = load_mitsuba_scene(
        str(pathlib.Path(__file__).resolve().parents[1] / "scenes/cornell/scene.xml")
    )
    cfg = RenderConfig(width=16, height=8, spp=4, max_depth=2, ray_batch=128)
    mesh = launch.pod_mesh(spp_shards=2)
    img = render_image_sharded(scene, cfg, mesh)
    full = launch.gather_image(img)  # collective: every process participates once
    target = np.zeros((8, 16, 3), np.float32)
    loss, grads = grad_step_sharded(scene, cfg, mesh, target)
    if launch.is_coordinator():
        assert full is not None and full.shape == (8, 16, 3)
        np.savez(out_path, img=full, loss=np.asarray(loss), grads=np.asarray(grads),
                 processes=jax.process_count(), devices=len(jax.devices()))
    else:
        assert full is None  # gather_image returns None off-coordinator
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
