"""Sampling routines for the path integrator.

Behavior specs from the reference device code (file:line cites are into
/root/reference/src/GPUSpectral/assets/shaders/):

  * concentric disk       rayhit.rchit:89-105
  * cosine hemisphere     rayhit.rchit:107-115
  * Beckmann half vector  rayhit.rchit:155-166
  * triangle area light   rayhit.rchit:123-153

All functions take explicit uniforms (u1, u2 in [0,1)) instead of a mutable
RNG stream — see ops/rng.py for why.  Everything broadcasts over leading
batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math3d as m3

M_PI = jnp.pi


def sample_concentric_disk(u1, u2):
    """Concentric square->disk map (rayhit.rchit:89-105)."""
    ux = 2.0 * u1 - 1.0
    uy = 2.0 * u2 - 1.0
    use_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_x, ux, uy)
    # Guard the 0/0 at the origin; the reference early-outs to (0, 0).
    th = jnp.where(
        use_x,
        (M_PI / 4.0) * m3.safe_div(uy, ux, 1e-12),
        M_PI / 2.0 - (M_PI / 4.0) * m3.safe_div(ux, uy, 1e-12),
    )
    at_origin = (ux == 0.0) & (uy == 0.0)
    x = jnp.where(at_origin, 0.0, r * jnp.cos(th))
    y = jnp.where(at_origin, 0.0, r * jnp.sin(th))
    return x, y


def sample_cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere direction in the shading frame
    (rayhit.rchit:107-111).  Returns (..., 3)."""
    x, y = sample_concentric_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(1e-24, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def cosine_hemisphere_pdf(w):
    """pdf of the cosine sampler (rayhit.rchit:113-115)."""
    return jnp.maximum(jnp.abs(w[..., 2]) / M_PI, 1e-6)


def sample_half_beckmann(u1, u2, alpha):
    """Beckmann-distributed half vector (rayhit.rchit:155-166).

    Note the reference samples a *Beckmann* D for the half vector while
    shading with GGX D; the pdf used for MIS is the Beckmann one
    (rayhit.rchit:516).  We reproduce that pairing exactly.
    """
    phi = 2.0 * M_PI * u1
    log_sample = jnp.log(jnp.maximum(1.0 - u2, 1e-12))  # guard log(0) -> -inf
    tan2 = -alpha * alpha * log_sample
    cost = 1.0 / jnp.sqrt(1.0 + tan2)
    sint = jnp.sqrt(jnp.maximum(1e-24, 1.0 - cost * cost))
    return jnp.stack([jnp.cos(phi) * sint, jnp.sin(phi) * sint, cost], axis=-1)


def power_heuristic(f_pdf, g_pdf, nf: float = 1.0, ng: float = 1.0):
    """Power heuristic MIS weight (rayhit.rchit:206-210)."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / jnp.maximum(denom, 1e-12), 0.0)


def sample_triangle_light(v0, v1, v2, emission, shade_pos, u1, u2):
    """Area-sample one triangle light toward `shade_pos`.

    Reference: sampleTrangleLight (rayhit.rchit:123-145).  Returns
    (light_pos, emitted, pdf) where `pdf` is the solid-angle-converted area
    pdf  d^2 / (|cos| * A)  and `emitted` is zeroed on the back side.
    """
    su = jnp.sqrt(jnp.maximum(u1, 0.0))
    bu = 1.0 - su
    bv = u2 * su
    bw = 1.0 - bu - bv
    area = 0.5 * jnp.abs(m3.length(m3.cross(v2 - v0, v1 - v0)))
    normal = m3.normalize(m3.cross(v1 - v0, v2 - v0))
    light_pos = bu[..., None] * v0 + bv[..., None] * v1 + bw[..., None] * v2
    delta = light_pos - shade_pos
    dist = m3.length(delta)
    l_dir = delta / jnp.maximum(dist, 1e-12)[..., None]
    cos_light = m3.dot(-l_dir, normal)
    emitted = emission * (cos_light > 0.0)[..., None].astype(emission.dtype)
    pdf = dist * dist / jnp.maximum(jnp.abs(cos_light) * area, 1e-12)
    return light_pos, emitted, pdf
