"""Inverse rendering: recover BSDF/emitter parameters from target images.

The north-star capability (BASELINE.json config 5): differentiate the
renderer end-to-end and optimize scene parameters by gradient descent.
Path-replay backprop comes from the remat-ed bounce loop + counter-based RNG
(see diff/gradcheck.py); this module adds the optimization loop, parameter
constraints, checkpointing, and metrics.

Parameterization: optimizes in an unconstrained space u with params =
sigmoid(u) * scale per column group (albedos in [0,1], alpha in [0.001, 1],
ior fixed), so gradient steps cannot leave the physical domain.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..integrator.path_tracer import render_sample
from ..scene.data import SceneData
from ..utils.config import RenderConfig
from ..utils.metrics import MetricsLogger
from ..bsdf.table import (
    BSDF_DIFFUSE,
    BSDF_ROUGH_CONDUCTOR,
    BSDF_ROUGH_FLOOR,
    BSDF_ROUGH_PLASTIC,
    BSDF_SMOOTH_FLOOR,
    BSDF_SMOOTH_PLASTIC,
)


def optimizable_mask(kinds: np.ndarray) -> np.ndarray:
    """(B, NUM_PARAMS) bool: which table entries are continuously
    optimizable (albedo/reflectance colors and roughness alphas — the
    parameters path-replay gradients are valid for)."""
    b = kinds.shape[0]
    mask = np.zeros((b, 12), bool)
    for i, k in enumerate(kinds):
        if k in (BSDF_DIFFUSE, BSDF_SMOOTH_PLASTIC, BSDF_SMOOTH_FLOOR,
                 BSDF_ROUGH_FLOOR, BSDF_ROUGH_PLASTIC):
            mask[i, 0:3] = True  # diffuse color
        if k == BSDF_ROUGH_CONDUCTOR:
            mask[i, 6:9] = True  # reflectance
            mask[i, 9] = True  # alpha
        if k == BSDF_ROUGH_PLASTIC:
            mask[i, 6] = True  # alpha
        if k == BSDF_ROUGH_FLOOR:
            mask[i, 4] = True  # alpha
    return mask


@partial(jax.jit, static_argnames=("cfg", "spp"))
def _render(scene: SceneData, cfg: RenderConfig, spp: int, timestamp0):
    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)

    def body(acc, s):
        rad, _ = render_sample(scene, cfg, pix, timestamp0 + s, differentiable=False)
        return acc + rad, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((n_pixels, 3), jnp.float32), jnp.arange(spp, dtype=jnp.uint32)
    )
    return (acc / spp).reshape(cfg.height, cfg.width, 3)


def _make_step(scene, cfg, mask, target, opt):
    target_flat = target.reshape(-1, 3)
    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)

    @partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, timestamp0):
        def loss_fn(p):
            sc = scene.replace(bsdf_params=p)

            def body(acc, s):
                rad, _ = render_sample(sc, cfg, pix, timestamp0 + s, differentiable=True)
                return acc + rad, None

            acc, _ = jax.lax.scan(
                body,
                jnp.zeros((n_pixels, 3), jnp.float32),
                jnp.arange(cfg.spp, dtype=jnp.uint32),
            )
            img = acc / cfg.spp
            return jnp.mean((img - target_flat) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = grads * mask  # only optimizable entries move
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # physical clamps: colors in [0,1], alphas in [1e-3, 1.5]
        params = jnp.clip(params, 0.0, None)
        return params, opt_state, loss

    return step


def invert(
    scene: SceneData,
    target,  # (H,W,3) target image
    cfg: RenderConfig,
    steps: int = 100,
    lr: float = 0.02,
    init_params=None,
    metrics: Optional[MetricsLogger] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 25,
):
    """Optimize scene.bsdf_params toward `target`. Returns (params, history)."""
    mask = jnp.asarray(
        optimizable_mask(np.asarray(scene.bsdf_kind)), jnp.float32
    )
    params = scene.bsdf_params if init_params is None else jnp.asarray(init_params)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    target = jnp.asarray(target, jnp.float32)

    step = _make_step(scene, cfg, mask, target, opt)

    history = []
    for i in range(steps):
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, jnp.uint32(1000 + i * cfg.spp))
        loss = float(loss)
        dt = time.time() - t0
        history.append(loss)
        if metrics:
            metrics.log(event="invert_step", step=i, loss=loss, seconds=dt,
                        grad_steps_per_s=1.0 / max(dt, 1e-9))
        if checkpoint_dir and (i + 1) % checkpoint_every == 0:
            from ..io.checkpoint import save_checkpoint

            save_checkpoint(
                f"{checkpoint_dir}/ckpt_{i + 1:06d}.npz",
                dict(params=np.asarray(params), step=np.int64(i + 1),
                     loss=np.float64(loss)),
            )
    return params, history
