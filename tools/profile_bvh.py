#!/usr/bin/env python
"""Time the BVH wavefront's pieces on the current backend (staircase2)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()
import jax, jax.numpy as jnp
import numpy as np

from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator import path_tracer as pt
from gpuspectral_tpu.bvh import cluster_sweep as cs
from gpuspectral_tpu.ops import rng
from gpuspectral_tpu.scene.camera import generate_rays

scene_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml"
R = 65536
scene, _b = load_mitsuba_scene(scene_path)
cfg = RenderConfig(width=512, height=512, spp=1, max_depth=8, ray_batch=R, use_bvh=True)
print(f"tris={scene.num_tris} backend={jax.default_backend()}")

pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)
state = dict(origin=o, direction=d, weight=jnp.ones((R,3)), direct_weight=jnp.ones((R,)),
             prev_pdf=jnp.ones((R,)), prev_nee=jnp.zeros((R,),bool), was_delta=jnp.zeros((R,),bool),
             count_emitted=jnp.ones((R,),bool), done=jnp.zeros((R,),bool),
             radiance=jnp.zeros((R,3)), rays_traced=jnp.zeros((R,),jnp.int32), seed=seed)
bounce_fn = jax.jit(lambda b, st: pt._bounce(scene, cfg, b, st))
for bounce in range(2):  # get bounce-2 ray state (incoherent)
    state = bounce_fn(jnp.uint32(bounce), state)
o2, d2, alive = state["origin"], state["direction"], ~state["done"]

def timeit(name, fn, iters=10):
    out = fn(0)
    jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.time()
    for i in range(iters):
        out = fn(i)
    jax.tree.map(lambda x: np.asarray(x), out)
    dt = (time.time() - t0) / iters
    print(f"{name:30s} {dt*1e3:8.2f} ms  ({R/dt/1e6:7.2f} Mq/s)")
    return dt

# perturb origins per iteration to defeat loop-invariant hoisting
oj = jax.jit(lambda i: o2 + i * 1e-6)

closest = jax.jit(lambda o_, d_, a: cs.cluster_closest(scene, o_, d_, active=a))
anyh = jax.jit(lambda o_, d_, a: cs.cluster_any(scene, o_, d_, t_min=0.01, t_max=1.0, active=a))
timeit("cluster_closest (bounce rays)", lambda i: closest(oj(i), d2, alive))
timeit("cluster_any     (bounce rays)", lambda i: anyh(oj(i), d2, alive))
closest0 = jax.jit(lambda o_, d_: cs.cluster_closest(scene, o_, d_))
oj0 = jax.jit(lambda i: o + i * 1e-6)
timeit("cluster_closest (primary)", lambda i: closest0(oj0(i), d))

# votes kernel alone
def votes_only(o_, d_, a):
    t_min = jnp.zeros((R,), jnp.float32)
    t_max = jnp.where(a, 1e30, -1e30)
    out = cs._prepare(scene, o_, d_, t_min, t_max)
    return out[1]
votes_j = jax.jit(lambda o_, d_, a: votes_only(o_, d_, a))
timeit("votes kernel", lambda i: votes_j(oj(i), d2, alive))

# XLA row gather (tri attr table)
table = pt._tri_table(scene)
prim = np.random.default_rng(0).integers(0, scene.num_tris, size=R).astype(np.int32)
prim = jnp.asarray(prim)
gather_j = jax.jit(lambda p: pt._take_rows(table, p))
timeit("tri-table gather (36 cols)", lambda i: gather_j(prim + (i % 2)))

# one full bounce
st2 = dict(state)
timeit("full _bounce", lambda i: bounce_fn(jnp.uint32(3 + (i % 2)), st2), iters=5)
