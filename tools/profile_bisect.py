#!/usr/bin/env python
"""Bisect the bounce step cost: time pieces in a 50-iteration fori loop
(amortizes tunnel sync), carrying minimal state so XLA can't DCE the work."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()

import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator import path_tracer as pt
from gpuspectral_tpu.ops.pallas_isect import closest_pallas, any_pallas
from gpuspectral_tpu.ops.woop import _recover_uv
from gpuspectral_tpu.ops import rng
from gpuspectral_tpu.ops import math3d as m3
from gpuspectral_tpu.ops import sampling as smp
from gpuspectral_tpu.bsdf.dispatch import eval_bsdf, sample_bsdf
from gpuspectral_tpu.scene.camera import generate_rays

R = 65536
N = 50
scene, _b = load_mitsuba_scene("scenes/cornell/scene.xml")
cfg = RenderConfig(width=512, height=512, spp=16, ray_batch=R)

pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)

def timeloop(name, step):
    """step(i, carry(o,d)) -> new (o,d)-like carry; loop N times."""
    @jax.jit
    def run(o, d):
        def body(i, c):
            return step(i, c)
        return jax.lax.fori_loop(0, N, body, (o, d))
    out = run(o, d)
    np.asarray(out[0])
    t0 = time.time()
    out = run(o, d)
    np.asarray(out[0])
    dt = (time.time() - t0) / N
    print(f"{name:44s} {dt*1e3:8.3f} ms/iter")
    return dt

# baseline: pure data dependency, no work
timeloop("noop (loop overhead)", lambda i, c: (c[0] + 1e-9, c[1]))

# intersection only
def isect_step(i, c):
    o, d = c
    tmin = jnp.zeros((R,), jnp.float32); tmax = jnp.full((R,), 1e30, jnp.float32)
    t, prim = closest_pallas(o, d, scene.tri_woop_t, tmin, tmax)
    return (o + t[:, None] * 1e-9, d)
timeloop("closest_pallas", isect_step)

def isect2_step(i, c):
    o, d = c
    tmin = jnp.zeros((R,), jnp.float32); tmax = jnp.full((R,), 1e30, jnp.float32)
    t, prim = closest_pallas(o, d, scene.tri_woop_t, tmin, tmax)
    occ = any_pallas(o, d, scene.tri_woop_t, tmin, tmax)
    return (o + (t * occ)[:, None] * 1e-9, d)
timeloop("closest + any pallas", isect2_step)

# uv recovery
def uv_step(i, c):
    o, d = c
    tmin = jnp.zeros((R,), jnp.float32); tmax = jnp.full((R,), 1e30, jnp.float32)
    t, prim = closest_pallas(o, d, scene.tri_woop_t, tmin, tmax)
    bu, bv = _recover_uv(o, d, scene.tri_woop, prim, jnp.where(prim >= 0, t, 0.0))
    return (o + (t * bu * bv)[:, None] * 1e-9, d)
timeloop("closest + recover_uv", uv_step)

# gather
def gather_step(i, c):
    o, d = c
    prim = (jnp.arange(R) % 32).astype(jnp.int32)
    pos_c, nrm_c, bparams, bkind, emission, twofaced, tri_lidx, rows = pt._gather_tri(scene, prim)
    return (o + pos_c[:, 0] * 1e-9 + bparams[:, :3] * 1e-9, d)
timeloop("gather_tri", gather_step)

# rng draws (7 channels)
def rng_step(i, c):
    o, d = c
    s = seed
    acc = 0.0
    for ch in range(7):
        acc = acc + rng.uniform(s, i.astype(jnp.uint32), ch)
    return (o + acc[:, None] * 1e-9, d)
timeloop("7x rng.uniform", rng_step)

# bsdf sample + eval (diffuse only, as in cornell)
def bsdf_step(i, c):
    o, d = c
    wo = m3.normalize(d)
    p = jnp.ones((R, 12), jnp.float32)
    kind = jnp.zeros((R,), jnp.int32)
    u = rng.uniform(seed, i.astype(jnp.uint32), 0)
    wi, f, pdf, delta = sample_bsdf(p, kind, wo, u, u, u, present=scene.kinds_present)
    f2, pdf2, _ = eval_bsdf(p, kind, wo, wi, present=scene.kinds_present)
    return (o + (f + f2) * 1e-9 + pdf[:, None] * 1e-9, d)
timeloop("sample+eval bsdf", bsdf_step)

# light sampling machinery
def light_step(i, c):
    o, d = c
    u_l = rng.uniform(seed, i.astype(jnp.uint32), 3)
    lbits = rng.random_bits(seed, i.astype(jnp.uint32), 3)
    lidx = (lbits % jnp.uint32(scene.num_lights)).astype(jnp.int32)
    light_table = jnp.concatenate([scene.light_pos.reshape(-1, 9), scene.light_emission], axis=1)
    lrows = pt._take_rows(light_table, lidx)
    lv = lrows[:, 0:9].reshape(-1, 3, 3)
    lemit = lrows[:, 9:12]
    lp, le, lpdf = smp.sample_triangle_light(lv[:, 0], lv[:, 1], lv[:, 2], lemit, o, u_l, u_l)
    return (o + lp * 1e-9 + le * 1e-9 + lpdf[:, None] * 1e-9, d)
timeloop("light sample", light_step)

# full bounce
def full_step(i, c):
    o, d = c
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
    st = pt._bounce(scene, cfg, i.astype(jnp.uint32), st)
    return (st["origin"] * (1.0 - 1e-9) + st["radiance"] * 1e-9, st["direction"])
timeloop("full _bounce", full_step)
