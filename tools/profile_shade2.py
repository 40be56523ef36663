#!/usr/bin/env python
"""Ablate the XLA shade portion: which piece costs what."""
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

def fake_closest_factory(gather_attrs):
    def fake_closest(sc, origin, direction, active=None):
        t = jnp.full((R,), 1.0) + origin[:, 0] * 1e-9
        n_attr = ds.fused_attr_rows(sc)
        if gather_attrs:
            attr_t = ds._attr_table(sc, sc.has_textures)
            attrs = attr_t.T[prim_const] + t[:, None] * 0.0
        else:
            # metadata-consistent constants (bsdf 0, no light, not twofaced)
            row = jnp.zeros((n_attr,), jnp.float32).at[13].set(4096.0)
            row = row.at[2].set(1.0).at[11].set(1.0)  # normals z=1, gn z=1? (rows 0-8 nrm, 9-11 gn)
            attrs = jnp.broadcast_to(row, (R, n_attr)) + t[:, None] * 0.0
        return t, prim_const, jnp.full((R,), 0.3), jnp.full((R,), 0.3), attrs
    return fake_closest

def fake_any(sc, origin, direction, t_min, t_max, active=None):
    return jnp.zeros((R,), bool) | (origin[:, 0] > 1e30)

def timeit(name, cfg, gather_attrs=True, no_tex=False):
    patches = [mock.patch.object(ds, "closest_diff", fake_closest_factory(gather_attrs)),
               mock.patch.object(ds, "any_nodiff", fake_any)]
    if no_tex:
        patches.append(mock.patch.object(pt, "_texture_lookup", lambda sc, uv, ti, bu, bv: jnp.ones((R, 3))))
    ctx = [p.__enter__() for p in patches]
    try:
        f = jax.jit(lambda b, st: pt._bounce(scene, cfg, b, st))
        out = f(jnp.uint32(1), state)
        jax.tree.map(lambda x: np.asarray(x), out)
        t0 = time.time()
        for i in range(8): out = f(jnp.uint32(1 + (i % 2)), state)
        jax.tree.map(lambda x: np.asarray(x), out)
        print(f"{name:44s} {(time.time()-t0)/8*1e3:8.2f} ms")
    finally:
        for p in patches: p.__exit__(None, None, None)

base = RenderConfig(width=512, height=512, spp=1, max_depth=8, ray_batch=R, use_bvh=True)
timeit("shade full (honest attr gather)", base)
timeit("shade, attrs const (no gather)", base, gather_attrs=False)
timeit("shade, attrs const, no texture", base, gather_attrs=False, no_tex=True)
timeit("shade, attrs const, no tex, nee=off", base.replace(nee=False), gather_attrs=False, no_tex=True)
