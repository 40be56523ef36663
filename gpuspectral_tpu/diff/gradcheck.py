"""Gradient checking: path-replay AD gradients vs finite differences.

The north-star acceptance gate (BASELINE.json): pixel gradients w.r.t.
BSDF/emitter parameters must `allclose` a finite-difference reference.

Why this works without recorded paths: every random draw is a pure function
of (pixel, timestamp, bounce, channel) — see ops/rng.py — so the rendered
image is a *deterministic* function of the scene parameters.  AD through the
remat-ed bounce loop (trace_rays(differentiable=True)) differentiates exactly
the function FD evaluates: common-random-numbers finite differences and the
AD gradient agree to O(h^2) + float32 noise.  This is path-replay backprop
expressed idiomatically: the backward pass re-runs each bounce (recomputing
the same paths via the counter-based RNG) instead of storing them.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..integrator.path_tracer import render_sample
from ..scene.data import SceneData
from ..utils.config import RenderConfig


@partial(jax.jit, static_argnames=("cfg",))
def _loss_and_grad(scene: SceneData, cfg: RenderConfig, params, target):
    """L = mean((render(params) - target)^2); grad w.r.t. the bsdf table."""
    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)

    def loss(p):
        sc = scene.replace(bsdf_params=p)

        def body(acc, s):
            rad, _ = render_sample(sc, cfg, pix, s, differentiable=True)
            return acc + rad, None

        acc, _ = jax.lax.scan(
            body,
            jnp.zeros((n_pixels, 3), jnp.float32),
            jnp.arange(cfg.spp, dtype=jnp.uint32),
        )
        img = acc / cfg.spp
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss)(params)


@partial(jax.jit, static_argnames=("cfg",))
def _loss_only(scene: SceneData, cfg: RenderConfig, params, target):
    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)
    sc = scene.replace(bsdf_params=params)

    def body(acc, s):
        rad, _ = render_sample(sc, cfg, pix, s, differentiable=False)
        return acc + rad, None

    acc, _ = jax.lax.scan(
        body,
        jnp.zeros((n_pixels, 3), jnp.float32),
        jnp.arange(cfg.spp, dtype=jnp.uint32),
    )
    img = acc / cfg.spp
    return jnp.mean((img - target) ** 2)


def finite_difference_grad(scene, cfg, params, target, entries, h=1e-3):
    """Central differences on selected (row, col) entries, common random
    numbers (same seeds/timestamps as the AD loss)."""
    grads = {}
    params = np.asarray(params, np.float64).astype(np.float32)
    for (r, c) in entries:
        p_plus = params.copy()
        p_plus[r, c] += h
        p_minus = params.copy()
        p_minus[r, c] -= h
        lp = float(_loss_only(scene, cfg, jnp.asarray(p_plus), target))
        lm = float(_loss_only(scene, cfg, jnp.asarray(p_minus), target))
        grads[(r, c)] = (lp - lm) / (2 * h)
    return grads


def check_gradients(
    scene: SceneData,
    cfg: RenderConfig,
    entries=None,
    h: float = 1e-3,
    rtol: float = 0.05,
    atol: float = 1e-4,
    perturb: float = 0.05,
):
    """Returns (ok, report).  The target is rendered at the true params; the
    check point is the params perturbed by `perturb` so gradients are
    nonzero."""
    params0 = scene.bsdf_params
    target = None
    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)

    # render the target at the unperturbed parameters
    sc = scene

    def body(acc, s):
        rad, _ = render_sample(sc, cfg, pix, s, differentiable=False)
        return acc + rad, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((n_pixels, 3), jnp.float32), jnp.arange(cfg.spp, dtype=jnp.uint32)
    )
    target = acc / cfg.spp

    params = jnp.asarray(np.asarray(params0) * (1.0 + perturb) + 0.01)

    loss, ad_grad = _loss_and_grad(scene, cfg, params, target)
    ad_grad = np.asarray(ad_grad)

    if entries is None:
        # all entries with non-negligible AD gradient, capped for FD cost
        idx = np.argwhere(np.abs(ad_grad) > 1e-6)
        order = np.argsort(-np.abs(ad_grad[idx[:, 0], idx[:, 1]]))
        entries = [tuple(e) for e in idx[order][:16]]

    fd = finite_difference_grad(scene, cfg, params, target, entries, h=h)

    rows = []
    ok = True
    for (r, c), fd_val in fd.items():
        ad_val = float(ad_grad[r, c])
        denom = max(abs(fd_val), abs(ad_val), 1e-12)
        rel = abs(ad_val - fd_val) / denom
        good = abs(ad_val - fd_val) <= atol + rtol * max(abs(fd_val), abs(ad_val))
        ok = ok and good
        rows.append(
            dict(row=int(r), col=int(c), ad=ad_val, fd=fd_val, rel_err=rel, ok=bool(good))
        )
    report = dict(loss=float(loss), checked=len(rows), entries=rows, allclose=bool(ok))
    return ok, report


@partial(jax.jit, static_argnames=("cfg",))
def _emission_loss_and_grad(scene: SceneData, cfg: RenderConfig, lemit, target):
    """L = mean((render(light_emission) - target)^2); grad w.r.t. the light
    radiance table — the north star's "emitter parameters".  The emission is
    applied consistently to the light table (NEE) and the per-triangle
    emission (BSDF-path emitter hits)."""
    from .invert import scatter_light_emission

    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)

    def loss(e):
        sc = scatter_light_emission(scene, e)

        def body(acc, s):
            rad, _ = render_sample(sc, cfg, pix, s, differentiable=True)
            return acc + rad, None

        acc, _ = jax.lax.scan(
            body,
            jnp.zeros((n_pixels, 3), jnp.float32),
            jnp.arange(cfg.spp, dtype=jnp.uint32),
        )
        img = acc / cfg.spp
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss)(lemit)


@partial(jax.jit, static_argnames=("cfg",))
def _emission_loss_only(scene: SceneData, cfg: RenderConfig, lemit, target):
    from .invert import scatter_light_emission

    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)
    sc = scatter_light_emission(scene, lemit)

    def body(acc, s):
        rad, _ = render_sample(sc, cfg, pix, s, differentiable=False)
        return acc + rad, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((n_pixels, 3), jnp.float32), jnp.arange(cfg.spp, dtype=jnp.uint32)
    )
    img = acc / cfg.spp
    return jnp.mean((img - target) ** 2)


def check_emission_gradients(
    scene: SceneData,
    cfg: RenderConfig,
    entries=None,
    h: float = 1e-2,
    rtol: float = 0.05,
    atol: float = 1e-5,
    perturb: float = 0.2,
):
    """AD vs central-difference gradients w.r.t. light_emission entries.
    Target rendered at the true radiances; checked at radiances scaled by
    (1 + perturb) so gradients are nonzero."""
    n_pixels = cfg.width * cfg.height
    pix = jnp.arange(n_pixels, dtype=jnp.uint32)

    def body(acc, s):
        rad, _ = render_sample(scene, cfg, pix, s, differentiable=False)
        return acc + rad, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((n_pixels, 3), jnp.float32), jnp.arange(cfg.spp, dtype=jnp.uint32)
    )
    target = acc / cfg.spp

    lemit = jnp.asarray(np.asarray(scene.light_emission) * (1.0 + perturb))
    loss, ad_grad = _emission_loss_and_grad(scene, cfg, lemit, target)
    ad_grad = np.asarray(ad_grad)

    if entries is None:
        idx = np.argwhere(np.abs(ad_grad) > 1e-7)
        order = np.argsort(-np.abs(ad_grad[idx[:, 0], idx[:, 1]]))
        entries = [tuple(e) for e in idx[order][:8]]

    lemit_np = np.asarray(lemit, np.float64).astype(np.float32)
    rows = []
    ok = len(entries) > 0
    for (r, c) in entries:
        e_plus = lemit_np.copy()
        e_plus[r, c] += h
        e_minus = lemit_np.copy()
        e_minus[r, c] -= h
        lp = float(_emission_loss_only(scene, cfg, jnp.asarray(e_plus), target))
        lm = float(_emission_loss_only(scene, cfg, jnp.asarray(e_minus), target))
        fd_val = (lp - lm) / (2 * h)
        ad_val = float(ad_grad[r, c])
        denom = max(abs(fd_val), abs(ad_val), 1e-12)
        rel = abs(ad_val - fd_val) / denom
        good = abs(ad_val - fd_val) <= atol + rtol * max(abs(fd_val), abs(ad_val))
        ok = ok and good
        rows.append(
            dict(row=int(r), col=int(c), ad=ad_val, fd=fd_val, rel_err=rel, ok=bool(good))
        )
    report = dict(loss=float(loss), checked=len(rows), entries=rows, allclose=bool(ok))
    return ok, report


def run_gradcheck(scene_path: str, spp: int = 32, size: Optional[str] = None):
    """CLI entry: gradcheck on a scene at small resolution."""
    from ..scene import load_mitsuba_scene

    scene, _ = load_mitsuba_scene(scene_path)
    w = h = 24
    if size:
        w, h = (int(x) for x in size.lower().split("x"))
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=3, ray_batch=w * h)
    ok, report = check_gradients(scene, cfg)
    ok_e, report_e = check_emission_gradients(scene, cfg)
    report["emission"] = report_e
    return ok and ok_e, report
