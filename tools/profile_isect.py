#!/usr/bin/env python
"""Compare standalone intersector kernels on bounce-like rays (staircase2)."""
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
from gpuspectral_tpu.bvh import dfs_sweep as ds
from gpuspectral_tpu.ops import rng
from gpuspectral_tpu.scene.camera import generate_rays

R = 65536
scene, _b = load_mitsuba_scene(sys.argv[1] if len(sys.argv)>1 else "/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml")
cfg = RenderConfig(width=512, height=512, spp=1, max_depth=8, ray_batch=R, use_bvh=True)
print(f"tris={scene.num_tris} dfs_nodes={scene.bvh_dfs_bounds.shape[1]} attr_rows={ds.fused_attr_rows(scene)} block={ds._block_size(scene, ds.fused_attr_rows(scene))}")
pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)
state = dict(origin=o, direction=d, weight=jnp.ones((R,3)), direct_weight=jnp.ones((R,)),
             prev_pdf=jnp.ones((R,)), prev_nee=jnp.zeros((R,),bool), prev_nee_any=jnp.zeros((R,),bool),
             was_delta=jnp.zeros((R,),bool),
             count_emitted=jnp.ones((R,),bool), done=jnp.zeros((R,),bool),
             radiance=jnp.zeros((R,3)), rays_traced=jnp.zeros((R,),jnp.int32), seed=seed)
bounce_fn = jax.jit(lambda b, st: pt._bounce(scene, cfg, b, st))
for bounce in range(2):
    state = bounce_fn(jnp.uint32(bounce), state)
o2, d2, alive = state["origin"], state["direction"], ~state["done"]

def timeit(name, fn, iters=10):
    out = fn(0); jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.time()
    for i in range(iters): out = fn(i)
    jax.tree.map(lambda x: np.asarray(x), out)
    dt = (time.time()-t0)/iters
    print(f"{name:34s} {dt*1e3:8.2f} ms ({R/dt/1e6:6.2f} Mq/s)")

oj = jax.jit(lambda i: o2 + i * 1e-6)
c_cl = jax.jit(lambda o_, d_, a: cs.cluster_closest(scene, o_, d_, active=a))
c_df = jax.jit(lambda o_, d_, a: ds.dfs_closest(scene, o_, d_, active=a))
a_cl = jax.jit(lambda o_, d_, a: cs.cluster_any(scene, o_, d_, t_min=0.01, t_max=1.0, active=a))
a_df = jax.jit(lambda o_, d_, a: ds.dfs_any(scene, o_, d_, 0.01, jnp.full((R,),1.0), active=a))
timeit("cluster_closest bounce", lambda i: c_cl(oj(i), d2, alive))
timeit("dfs_closest bounce", lambda i: c_df(oj(i), d2, alive))
timeit("cluster_any bounce", lambda i: a_cl(oj(i), d2, alive))
timeit("dfs_any bounce", lambda i: a_df(oj(i), d2, alive))
oj0 = jax.jit(lambda i: o + i * 1e-6)
c_cl0 = jax.jit(lambda o_, d_: cs.cluster_closest(scene, o_, d_))
c_df0 = jax.jit(lambda o_, d_: ds.dfs_closest(scene, o_, d_))
timeit("cluster_closest primary", lambda i: c_cl0(oj0(i), d))
timeit("dfs_closest primary", lambda i: c_df0(oj0(i), d))
