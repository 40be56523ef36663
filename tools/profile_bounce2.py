#!/usr/bin/env python
"""Decompose the BVH bounce cost on TPU: closest / any / gather / shade."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
scene, _b = load_mitsuba_scene("/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml")
def mkcfg(**kw):
    return RenderConfig(width=512, height=512, spp=1, max_depth=8, ray_batch=R, use_bvh=True, **kw)
pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)
def mkstate():
    return dict(origin=o, direction=d, weight=jnp.ones((R,3)), direct_weight=jnp.ones((R,)),
             prev_pdf=jnp.ones((R,)), prev_nee=jnp.zeros((R,),bool), was_delta=jnp.zeros((R,),bool),
             count_emitted=jnp.ones((R,),bool), done=jnp.zeros((R,),bool),
             radiance=jnp.zeros((R,3)), rays_traced=jnp.zeros((R,),jnp.int32), seed=seed)

def timeit(name, fn, iters=8):
    out = fn(0); jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.time()
    for i in range(iters): out = fn(i)
    jax.tree.map(lambda x: np.asarray(x), out)
    dt = (time.time()-t0)/iters
    print(f"{name:36s} {dt*1e3:8.2f} ms")
    return dt

state0 = mkstate()
for name, cfg in [("bounce nee=off", mkcfg(nee=False)),
                  ("bounce nee=on", mkcfg()),
                  ("bounce nee=on intersector=woop(xla)", mkcfg(intersector="woop"))]:
    fn = jax.jit(lambda b, st, c=cfg: pt._bounce(scene, c, b, st))
    st1 = fn(jnp.uint32(0), state0)  # build a post-bounce state once
    timeit(name, lambda i: fn(jnp.uint32(1 + (i % 2)), st1))
