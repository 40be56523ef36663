#!/usr/bin/env python
"""Time the XLA shade portion of a bounce with faked intersections."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()
import jax, jax.numpy as jnp, numpy as np
from unittest import mock
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator import path_tracer as pt
from gpuspectral_tpu.ops import rng
from gpuspectral_tpu.scene.camera import generate_rays

R = 65536
scene, _b = load_mitsuba_scene(sys.argv[1] if len(sys.argv)>1 else "/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml")
cfg = RenderConfig(width=512, height=512, spp=1, max_depth=8, ray_batch=R, use_bvh=True)
pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)
prim_const = jnp.asarray(np.random.default_rng(0).integers(0, scene.num_tris, size=R).astype(np.int32))

def fake_closest(sc, origin, direction, active=None):
    t = jnp.full((R,), 1.0) + origin[:, 0] * 1e-9
    from gpuspectral_tpu.bvh.dfs_sweep import fused_attr_rows, _attr_table
    n_attr = fused_attr_rows(sc)
    # fake attrs by an XLA gather once? no - use zeros+meta consistent: gather small
    attr_t = _attr_table(sc, sc.has_textures)  # (A, T)
    attrs = attr_t.T[prim_const]  # one honest gather, but constant-foldable? add dep:
    attrs = attrs + t[:, None] * 0.0
    return t, prim_const, jnp.full((R,), 0.3), jnp.full((R,), 0.3), attrs

def fake_any(sc, origin, direction, t_min, t_max, active=None):
    return jnp.zeros((R,), bool) | (origin[:, 0] > 1e30)

state = dict(origin=o, direction=d, weight=jnp.ones((R,3)), direct_weight=jnp.ones((R,)),
             prev_pdf=jnp.ones((R,)), prev_nee=jnp.zeros((R,),bool), prev_nee_any=jnp.zeros((R,),bool),
             was_delta=jnp.zeros((R,),bool), count_emitted=jnp.ones((R,),bool), done=jnp.zeros((R,),bool),
             radiance=jnp.zeros((R,3)), rays_traced=jnp.zeros((R,),jnp.int32), seed=seed)

import gpuspectral_tpu.bvh.dfs_sweep as ds
with mock.patch.object(ds, "closest_diff", fake_closest), \
     mock.patch.object(ds, "any_nodiff", fake_any):
    bounce_fake = jax.jit(lambda b, st: pt._bounce(scene, cfg, b, st))
    out = bounce_fake(jnp.uint32(1), state)
    jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.time()
    for i in range(8):
        out = bounce_fake(jnp.uint32(1 + (i % 2)), state)
    jax.tree.map(lambda x: np.asarray(x), out)
    print(f"shade-only bounce (fused-attr interface, honest attr gather): {(time.time()-t0)/8*1e3:.2f} ms")
