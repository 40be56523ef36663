"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the driver env pins axon/TPU; tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


REPO = pathlib.Path(__file__).resolve().parents[1]
CORNELL_XML = REPO / "scenes" / "cornell" / "scene.xml"


@pytest.fixture(scope="session")
def cornell_scene():
    from gpuspectral_tpu.scene import load_mitsuba_scene

    scene, builder = load_mitsuba_scene(str(CORNELL_XML))
    return scene
