"""Environment emitter evaluation (ray-miss radiance).

The reference declares an `Envmap` struct but never evaluates it — its miss
shader returns nothing (renderer/Scene.h:116-119, assets/shaders/miss.rmiss:15-18,
engine/Loader.cpp:338-346 parses then drops the scene-level emitter).  Here the
capability is completed: lat-long radiance maps (Mitsuba `envmap`) and uniform
`constant` emitters shade on ray miss.

Mapping follows Mitsuba's equirectangular convention (Y-up):

    d' = R_world_to_env @ d
    u  = (1 + atan2(d'.x, -d'.z) / pi) / 2
    v  = acos(clamp(d'.y)) / pi

Bilinear filtering with wrap addressing in u and clamp in v.  The lookup is a
gather per miss lane; envmap scenes run on the XLA wavefront path (the Pallas
megakernel is scoped to SMEM-resident closed scenes where misses cannot occur).
"""

from __future__ import annotations

import jax.numpy as jnp


def eval_envmap(envmap, rot, direction):
    """Radiance of the environment along world-space `direction`.

    envmap: (H, W, 3) float32 lat-long radiance map (gradients flow into it —
    it is a differentiable scene parameter like any BSDF table).
    rot: (3, 3) world->envmap rotation.
    direction: (R, 3) unit vectors.
    Returns (R, 3) radiance.
    """
    h, w = envmap.shape[0], envmap.shape[1]
    dx, dy, dz = direction[..., 0], direction[..., 1], direction[..., 2]
    # explicit products, not a matmul: MXU f32 passes quantize to bf16 and
    # direction error shows up as visible seam wobble near the poles
    ex = rot[0, 0] * dx + rot[0, 1] * dy + rot[0, 2] * dz
    ey = rot[1, 0] * dx + rot[1, 1] * dy + rot[1, 2] * dz
    ez = rot[2, 0] * dx + rot[2, 1] * dy + rot[2, 2] * dz

    u = (1.0 + jnp.arctan2(ex, -ez) / jnp.pi) * 0.5
    v = jnp.arccos(jnp.clip(ey, -1.0, 1.0)) / jnp.pi

    # continuous texel coordinates, texel centers at half-integers
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]

    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    # clamp the *unclamped* row pair so both rows collapse to the edge texel
    # beyond the pole centers (no bleed from the opposite row)
    y0u = y0.astype(jnp.int32)
    y0i = jnp.clip(y0u, 0, h - 1)
    y1i = jnp.clip(y0u + 1, 0, h - 1)

    flat = envmap.reshape(-1, 3)
    c00 = flat[y0i * w + x0i]
    c01 = flat[y0i * w + x1i]
    c10 = flat[y1i * w + x0i]
    c11 = flat[y1i * w + x1i]
    top = c00 * (1.0 - tx) + c01 * tx
    bot = c10 * (1.0 - tx) + c11 * tx
    return top * (1.0 - ty) + bot * ty
