#!/usr/bin/env python
"""Device-true bounce timing: N bounce iterations inside ONE jit (per-call
dispatch overhead through the axon tunnel is ~2 ms per buffer and poisons
any per-bounce measurement made from the host)."""
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
import gpuspectral_tpu.bvh.cluster_sweep as cs
from gpuspectral_tpu.ops import rng
from gpuspectral_tpu.scene.camera import generate_rays

R = 65536
N = 24
scene, _b = load_mitsuba_scene(sys.argv[1] if len(sys.argv) > 1 else
    "/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml")
pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)
prim_const = jnp.asarray(np.random.default_rng(0).integers(0, scene.num_tris, size=R).astype(np.int32))

def fake_closest(sc, origin, direction, active=None, kernel=None):
    t = jnp.full((R,), 1.0) + origin[:, 0] * 1e-9
    n_attr = ds.fused_attr_rows(sc)
    row = jnp.zeros((n_attr,), jnp.float32).at[13].set(4096.0).at[2].set(1.0).at[11].set(1.0)
    attrs = jnp.broadcast_to(row, (R, n_attr)) + t[:, None] * 0.0
    return t, prim_const, jnp.full((R,), 0.3), jnp.full((R,), 0.3), attrs

def fake_any(sc, origin, direction, t_min, t_max, active=None, kernel=None):
    return jnp.zeros((R,), bool) | (origin[:, 0] > 1e30)

def run_loop(name, cfg, patches=()):
    for p in patches: p.__enter__()
    try:
        @jax.jit
        def loop(o, d, seed):
            st = dict(origin=o, direction=d, weight=jnp.ones((R,3)),
                      direct_weight=jnp.ones((R,)), prev_pdf=jnp.ones((R,)),
                      prev_nee=jnp.zeros((R,),bool), prev_nee_any=jnp.zeros((R,),bool),
                      was_delta=jnp.zeros((R,),bool), count_emitted=jnp.ones((R,),bool),
                      done=jnp.zeros((R,),bool), radiance=jnp.zeros((R,3)),
                      rays_traced=jnp.zeros((R,),jnp.int32), seed=seed)
            def body(i, s):
                s = pt._bounce(scene, cfg, i.astype(jnp.uint32), s)
                s["done"] = jnp.zeros((R,), bool)  # keep all lanes hot every bounce
                return s
            st = jax.lax.fori_loop(0, N, body, st)
            return st["radiance"].sum() + st["rays_traced"].sum()
        v = loop(o, d, seed); np.asarray(v)
        t0 = time.time()
        v = loop(o, d, seed); np.asarray(v)
        dt = time.time() - t0
        print(f"{name:38s} {dt/N*1e3:8.2f} ms/bounce  ({R*N/dt/1e6:6.2f} Mlane-bounce/s)")
    finally:
        for p in patches: p.__exit__(None, None, None)

base = RenderConfig(width=512, height=512, spp=1, max_depth=64, ray_batch=R, use_bvh=True)
# dfs kernel variant skipped (slow, non-default)
# run_loop("full bounce (dfs kernels)", base)
run_loop("shade only (fake intersect)", base,
         (mock.patch.object(ds, "closest_diff", fake_closest),
          mock.patch.object(ds, "any_nodiff", fake_any)))
run_loop("shade only, diffuse-only dispatch", base,
         (mock.patch.object(ds, "closest_diff", fake_closest),
          mock.patch.object(ds, "any_nodiff", fake_any),)) if False else None
# cluster kernels via monkeypatching the imports used in _bounce
def cluster_closest5(sc, origin, direction, active=None, kernel=None):
    t, p_, u_, v_ = cs.cluster_closest(sc, origin, direction, active=active)
    return t, p_, u_, v_, None
run_loop("full bounce (cluster kernels)", base,
         (mock.patch.object(ds, "closest_diff", cluster_closest5),
          mock.patch.object(ds, "any_nodiff",
                            lambda sc, o_, d_, t_min, t_max, active=None, kernel=None:
                            cs.cluster_any(sc, o_, d_, t_min, t_max, active=active)),))

# isolate: real closest + fake shadow, fake closest + real shadow
run_loop("closest only (fake shadow)", base,
         (mock.patch.object(ds, "closest_diff", cluster_closest5),
          mock.patch.object(ds, "any_nodiff", fake_any),))
run_loop("shadow only (fake closest)", base,
         (mock.patch.object(ds, "closest_diff", fake_closest),
          mock.patch.object(ds, "any_nodiff",
                            lambda sc, o_, d_, t_min, t_max, active=None, kernel=None:
                            cs.cluster_any(sc, o_, d_, t_min, t_max, active=active)),))
run_loop("full bounce, no shadow sort", base.replace(shadow_sort=False),
         (mock.patch.object(ds, "closest_diff", cluster_closest5),
          mock.patch.object(ds, "any_nodiff",
                            lambda sc, o_, d_, t_min, t_max, active=None, kernel=None:
                            cs.cluster_any(sc, o_, d_, t_min, t_max, active=active)),))
