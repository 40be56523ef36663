"""Elastic failure recovery for long multi-host renders (SURVEY.md §5.3).

The reference's failure model is throw-and-die (std::runtime_error
throughout, e.g. VulkanDevice.cpp:30-31); ours so far was JAX fail-stop +
exact checkpoints.  This module adds the missing supervision layer:

  * workers render PROGRESSIVE CHUNKS (one timestamp = one 1-spp frame per
    chip group) and atomically checkpoint the running-mean accumulator +
    frame counter after every chunk (io/checkpoint.py),
  * a single-process SUPERVISOR runs the worker gang, watches liveness
    (exit codes + heartbeat files), and on ANY worker failure kills the
    gang and relaunches it from the last checkpoint — JAX multi-host is
    gang-scheduled, so gang restart from an exact checkpoint is the
    TPU-idiomatic recovery unit,
  * restarts may SHRINK the gang (fewer hosts) when a host stays dead: the
    (tiles x spp) sharding is host-count agnostic and the accumulator is a
    plain running mean, so the resumed render is exact regardless of the
    new mesh shape.

Recovery is EXACT: frame t's radiance depends only on (scene, cfg, t), so
mean over frames [0, T) resumed at any boundary reproduces the
uninterrupted result bit-for-bit (asserted by tests/test_elastic.py, which
kills a worker mid-run).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np


@dataclass
class GangResult:
    restarts: int
    hosts_used: list  # host count per incarnation


def supervise(
    build_cmd: Callable[[int, int], list],
    n_hosts: int,
    *,
    done: Callable[[], bool],
    max_restarts: int = 3,
    allow_shrink: bool = True,
    min_hosts: int = 1,
    poll_s: float = 0.5,
    timeout_s: float = 600.0,
    env_extra: Optional[dict] = None,
) -> GangResult:
    """Run a worker gang until `done()` reports completion.

    build_cmd(host_id, n_hosts) -> argv for one worker process.  On any
    worker death before completion the whole gang is killed and relaunched
    (workers resume from their checkpoint).  After two failed incarnations
    at the same size the gang shrinks by one host (allow_shrink)."""
    restarts = 0
    hosts_used = []
    hosts = n_hosts
    fails_at_size = 0
    while True:
        if done():
            return GangResult(restarts=restarts, hosts_used=hosts_used)
        if restarts > max_restarts:
            raise RuntimeError(
                f"elastic supervisor: exceeded {max_restarts} restarts")
        hosts_used.append(hosts)
        extra = env_extra(len(hosts_used) - 1) if callable(env_extra) else (
            env_extra or {})
        procs = []
        for i in range(hosts):
            env = dict(os.environ)
            env.update(extra)
            env["GPUSPECTRAL_FAKE_HOSTS"] = str(hosts)
            env["GPUSPECTRAL_FAKE_HOST_ID"] = str(i)
            procs.append(subprocess.Popen(
                build_cmd(i, hosts), env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE))
        t0 = time.time()
        failed = False
        while True:
            codes = [p.poll() for p in procs]
            if any(c is not None and c != 0 for c in codes):
                failed = True
                break
            if all(c == 0 for c in codes):
                break
            if time.time() - t0 > timeout_s:
                failed = True
                break
            time.sleep(poll_s)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        if not failed and done():
            return GangResult(restarts=restarts, hosts_used=hosts_used)
        restarts += 1
        fails_at_size += 1
        if allow_shrink and fails_at_size >= 2 and hosts > min_hosts:
            hosts -= 1
            fails_at_size = 0


def render_chunks(scene, cfg, mesh, total_frames: int, ckpt_path: str,
                  chunk_frames: int = 1, on_frame=None,
                  _fault_at: int = -1):
    """Worker-side progressive render loop with exact checkpoint/resume.

    Renders frames [resume_at, total_frames), updating the running-mean
    accumulator; the coordinator checkpoints atomically every
    `chunk_frames`.  Returns (accum (H,W,3), frames_done).  `_fault_at`
    injects a crash before checkpointing that frame index (tests)."""
    import jax.numpy as jnp

    from ..io.checkpoint import load_checkpoint, save_checkpoint
    from . import launch
    from .dist import render_image_sharded

    accum = np.zeros((cfg.height, cfg.width, 3), np.float32)
    start = 0
    if os.path.exists(ckpt_path):
        state = load_checkpoint(ckpt_path)
        accum = np.asarray(state["accum"], np.float32)
        start = int(state["frames"])
    for t in range(start, total_frames):
        if _fault_at == t and start < _fault_at:
            # injected fault (tests): die WITHOUT checkpointing this frame.
            # One-shot by construction: the restarted gang resumes AT the
            # fault frame (start == _fault_at) and runs clean.
            os._exit(41)
        img = render_image_sharded(scene, cfg, mesh, timestamp0=t)
        full = launch.gather_image(img)
        if launch.is_coordinator():
            # running mean (raygen.rgen:84-91 progressive accumulation)
            accum = accum + (np.asarray(full) - accum) / (t + 1)
            if (t + 1) % chunk_frames == 0 or t + 1 == total_frames:
                save_checkpoint(ckpt_path, dict(
                    accum=accum, frames=np.int64(t + 1)))
        if on_frame is not None:
            on_frame(t, accum)
    return accum, total_frames
