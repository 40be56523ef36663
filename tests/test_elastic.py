"""Elastic failure recovery (parallel/elastic.py, SURVEY.md §5.3): a worker
gang that loses a host mid-render must be restarted by the supervisor from
the last exact checkpoint and finish with the SAME image an uninterrupted
run produces."""

import os
import pathlib
import socket
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_gang(tmp_path, tag, total_frames, fault_at):
    from gpuspectral_tpu.io.checkpoint import load_checkpoint
    from gpuspectral_tpu.parallel.elastic import supervise

    ckpt = str(tmp_path / f"{tag}.npz")

    def build_cmd(host_id, n_hosts):
        # the INJECTED fault only fires while no checkpoint progress passed
        # it: after restart the resume frame is > fault_at, so the worker
        # runs clean — no extra plumbing needed
        return [sys.executable, str(REPO / "tests/elastic_worker.py"),
                ckpt, str(total_frames), str(fault_at)]

    def env_extra(incarnation):
        return {
            "GPUSPECTRAL_COORDINATOR": f"127.0.0.1:{_free_port()}",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        }

    def done():
        if not os.path.exists(ckpt):
            return False
        try:
            return int(load_checkpoint(ckpt)["frames"]) >= total_frames
        except Exception:
            return False

    res = supervise(build_cmd, 2, done=done, max_restarts=3,
                    allow_shrink=False, timeout_s=480,
                    env_extra=env_extra)
    state = load_checkpoint(ckpt)
    return np.asarray(state["accum"]), int(state["frames"]), res


def test_gang_restart_reproduces_uninterrupted_render(tmp_path):
    total = 5
    # clean run (no fault)
    img_clean, frames_clean, res_clean = _run_gang(
        tmp_path, "clean", total, fault_at=-1)
    assert frames_clean == total
    assert res_clean.restarts == 0

    # faulty run: host 1 dies (os._exit) before checkpointing frame 2;
    # the supervisor must relaunch the gang, which resumes from the last
    # checkpoint and completes
    img_fault, frames_fault, res_fault = _run_gang(
        tmp_path, "fault", total, fault_at=2)
    assert frames_fault == total
    assert res_fault.restarts >= 1

    # recovery is EXACT: same frames, same running mean
    np.testing.assert_array_equal(img_fault, img_clean)
