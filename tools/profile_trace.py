#!/usr/bin/env python
"""Capture a jax profiler trace of the 50-bounce loop."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()

import jax, jax.numpy as jnp
import numpy as np

from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator import path_tracer as pt
from gpuspectral_tpu.ops import rng
from gpuspectral_tpu.scene.camera import generate_rays

R = 65536
N = 50
scene, _b = load_mitsuba_scene("scenes/cornell/scene.xml")
cfg = RenderConfig(width=512, height=512, spp=16, ray_batch=R)

pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)

@jax.jit
def run(o, d):
    st = dict(
        origin=o, direction=d,
        weight=jnp.ones((R, 3), jnp.float32),
        direct_weight=jnp.ones((R,), jnp.float32),
        prev_pdf=jnp.ones((R,), jnp.float32),
        prev_nee=jnp.zeros((R,), bool),
        was_delta=jnp.zeros((R,), bool),
        count_emitted=jnp.ones((R,), bool),
        done=jnp.zeros((R,), bool),
        radiance=jnp.zeros((R, 3), jnp.float32),
        rays_traced=jnp.zeros((R,), jnp.int32),
        seed=seed,
    )
    def body(i, s):
        return pt._bounce(scene, cfg, i.astype(jnp.uint32), s)
    st = jax.lax.fori_loop(0, N, body, st)
    return st["radiance"].sum()

print(float(run(o, d)))  # compile
with jax.profiler.trace("/tmp/jaxtrace"):
    t0 = time.time()
    v = float(run(o, d))
    print("run:", time.time() - t0, v)
print("trace written")
