#!/usr/bin/env python
"""Microbenchmark the wavefront bounce step's pieces on the current backend."""
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
from gpuspectral_tpu.ops import rng
from gpuspectral_tpu.scene.camera import generate_rays

R = 65536
scene, _builder = load_mitsuba_scene("scenes/cornell/scene.xml")
cfg = RenderConfig(width=512, height=512, spp=16, ray_batch=R)

pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)

def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return dt

# 1. intersection kernels alone
tmin = jnp.zeros((R,), jnp.float32)
tmax = jnp.full((R,), 1e30, jnp.float32)
timeit("closest_pallas", jax.jit(lambda o, d: closest_pallas(o, d, scene.tri_woop_t, tmin, tmax)), o, d)
timeit("any_pallas", jax.jit(lambda o, d: any_pallas(o, d, scene.tri_woop_t, tmin, tmax)), o, d)

# 2. one full bounce step
def make_state():
    return dict(
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

state = make_state()
bounce1 = jax.jit(lambda st: pt._bounce(scene, cfg, jnp.uint32(0), st))
timeit("one _bounce (full)", bounce1, state)

# 3. N bounces in a fori loop (amortizes dispatch of loop machinery)
@jax.jit
def bounce_n(st, n):
    def body(i, s):
        return pt._bounce(scene, cfg, i.astype(jnp.uint32), s)
    return jax.lax.fori_loop(0, n, body, st)
dt = timeit("50 bounces (fori)", partial(bounce_n, n=50), state, iters=3)
print(f"  per bounce inside loop: {dt/50*1e3:.3f} ms -> {R*2/ (dt/50) /1e6:.1f} Mrays/s upper bound")

# 4. shading only (no intersect): patch in fake hit results
def shade_only(st):
    # replicate _bounce with intersection replaced by constants
    import gpuspectral_tpu.integrator.path_tracer as P
    prim = jnp.zeros((R,), jnp.int32)
    t = jnp.ones((R,), jnp.float32)
    bu = jnp.full((R,), 0.3); bv = jnp.full((R,), 0.3)
    # reuse gather+shade pipeline by calling internals
    pos_c, nrm_c, bparams, bkind, emission, twofaced, tri_lidx, _rows = P._gather_tri(scene, prim)
    return pos_c.sum() + bparams.sum()
timeit("gather_tri only", jax.jit(shade_only), state)
