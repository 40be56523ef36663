#!/usr/bin/env python
"""Full-frame staircase2 benchmark across BVH variants (device-true)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()
import jax, jax.numpy as jnp, numpy as np
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator.path_tracer import render_image_stats
import gpuspectral_tpu.bvh.cluster_sweep as cs
import gpuspectral_tpu.bvh.dfs_sweep as ds
import gpuspectral_tpu.integrator.path_tracer as pt
from unittest import mock

scene, _b = load_mitsuba_scene("/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml")

def cluster5(sc, origin, direction, active=None):
    t, p_, u_, v_ = cs.cluster_closest(sc, origin, direction, active=active)
    return t, p_, u_, v_, None

def cluster_any_w(sc, o_, d_, t_min, t_max, active=None):
    return cs.cluster_any(sc, o_, d_, t_min, t_max, active=active)

def bench(name, cfg, block=None, use_cluster=True):
    old_block = cs.BLOCK
    if block: cs.BLOCK = block
    patches = []
    if use_cluster:
        patches = [mock.patch.object(ds, "closest_diff", cluster5),
                   mock.patch.object(ds, "any_nodiff", cluster_any_w)]
    for p in patches: p.__enter__()
    try:
        img, nrays = render_image_stats(scene, cfg, jnp.uint32(0))
        np.asarray(img)
        t0 = time.time()
        img, nrays = render_image_stats(scene, cfg, jnp.uint32(7))
        np.asarray(img)
        dt = time.time() - t0
        nr = float(np.asarray(nrays))
        print(f"{name:40s} {dt:7.2f}s  {nr/dt/1e6:6.2f} Mrays/s")
    finally:
        for p in patches: p.__exit__(None, None, None)
        cs.BLOCK = old_block

base = RenderConfig(width=512, height=512, spp=4, max_depth=50, ray_batch=65536, use_bvh=True)
for arg in sys.argv[1:]:
    if arg == "base":    bench("cluster B=1024", base)
    if arg == "sort":    bench("cluster B=1024 +sort4", base.replace(sort_rays=True))
    if arg == "sort2":   bench("cluster B=1024 +sort2", base.replace(sort_rays=True, sort_interval=2))
    if arg == "b512":    bench("cluster B=512", base, block=512)
    if arg == "b512s":   bench("cluster B=512 +sort4", base.replace(sort_rays=True), block=512)
    if arg == "b256s":   bench("cluster B=256 +sort4", base.replace(sort_rays=True), block=256)
    if arg == "dfs":     bench("dfs (default)", base, use_cluster=False)
