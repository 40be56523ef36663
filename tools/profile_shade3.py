#!/usr/bin/env python
"""Ablate deeper: BSDF dispatch, RNG, light sampling."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()
import jax, jax.numpy as jnp, numpy as np
from unittest import mock
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator import path_tracer as pt
import gpuspectral_tpu.bvh.dfs_sweep as ds
from gpuspectral_tpu.ops import rng
from gpuspectral_tpu.scene.camera import generate_rays

R = 65536
scene, _b = load_mitsuba_scene("/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml")
pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)
prim_const = jnp.asarray(np.random.default_rng(0).integers(0, scene.num_tris, size=R).astype(np.int32))
state = dict(origin=o, direction=d, weight=jnp.ones((R,3)), direct_weight=jnp.ones((R,)),
             prev_pdf=jnp.ones((R,)), prev_nee=jnp.zeros((R,),bool), prev_nee_any=jnp.zeros((R,),bool),
             was_delta=jnp.zeros((R,),bool), count_emitted=jnp.ones((R,),bool), done=jnp.zeros((R,),bool),
             radiance=jnp.zeros((R,3)), rays_traced=jnp.zeros((R,),jnp.int32), seed=seed)

def fake_closest(sc, origin, direction, active=None):
    t = jnp.full((R,), 1.0) + origin[:, 0] * 1e-9
    n_attr = ds.fused_attr_rows(sc)
    row = jnp.zeros((n_attr,), jnp.float32).at[13].set(4096.0).at[2].set(1.0).at[11].set(1.0)
    attrs = jnp.broadcast_to(row, (R, n_attr)) + t[:, None] * 0.0
    return t, prim_const, jnp.full((R,), 0.3), jnp.full((R,), 0.3), attrs

def fake_any(sc, origin, direction, t_min, t_max, active=None):
    return jnp.zeros((R,), bool) | (origin[:, 0] > 1e30)

def fake_sample(bparams, bkind, wo, u_sel, u1, u2, present=None):
    wi = jnp.stack([wo[:,0]*0, wo[:,1]*0, jnp.ones_like(wo[:,2])], -1)
    f = bparams[:, 0:3] / jnp.pi
    pdf = jnp.maximum(jnp.abs(wi[:,2])/jnp.pi, 1e-6) + u1*0 + u2*0 + u_sel*0
    return wi, f, pdf, jnp.zeros_like(pdf, bool)

def fake_eval(bparams, bkind, wo, wi, present=None):
    pdf = jnp.maximum(jnp.abs(wi[:,2])/jnp.pi, 1e-6)
    return bparams[:, 0:3]/jnp.pi, pdf, jnp.zeros_like(pdf, bool)

def timeit(name, cfg, sc, extra=()):
    patches = [mock.patch.object(ds, "closest_diff", fake_closest),
               mock.patch.object(ds, "any_nodiff", fake_any)] + list(extra)
    for p in patches: p.__enter__()
    try:
        f = jax.jit(lambda b, st: pt._bounce(sc, cfg, b, st))
        out = f(jnp.uint32(1), state)
        jax.tree.map(lambda x: np.asarray(x), out)
        t0 = time.time()
        for i in range(8): out = f(jnp.uint32(1 + (i % 2)), state)
        jax.tree.map(lambda x: np.asarray(x), out)
        print(f"{name:46s} {(time.time()-t0)/8*1e3:8.2f} ms")
    finally:
        for p in patches: p.__exit__(None, None, None)

base = RenderConfig(width=512, height=512, spp=1, max_depth=8, ray_batch=R, use_bvh=True)
timeit("shade baseline (attrs const)", base, scene)
timeit("shade, fake sample+eval bsdf", base, scene,
       (mock.patch.object(pt, "sample_bsdf", fake_sample), mock.patch.object(pt, "eval_bsdf", fake_eval)))
timeit("shade, kinds_present=(0,) diffuse only", base, scene.replace(kinds_present=(0,)))
