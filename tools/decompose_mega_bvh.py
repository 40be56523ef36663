#!/usr/bin/env python
"""Stub-decomposition of the fused-BVH megakernel, slope-timed (round 5:
the original per-call timing carried ~28 ms tunnel RTT + image transfer
per sample — tools/mbench.py explains).  Replaces closest / any_hit /
pick_light / RNG with cheap stubs one at a time and reports TRUE frame
times via the call-count slope."""
import sys, functools, builtins
print = functools.partial(builtins.print, flush=True)
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from gpuspectral_tpu.utils.jaxcache import enable
enable()
import gpuspectral_tpu.integrator.mega_bvh as mb
import gpuspectral_tpu.integrator.mega as mega
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils import RenderConfig
from tools.bench_kernel_true import frame_time

_name = sys.argv[1] if len(sys.argv) > 1 else "staircase2"
scene, _ = load_mitsuba_scene(
    f"/root/reference/src/GPUSpectral/assets/scenes/{_name}/scene.xml")
cfg = RenderConfig(width=128, height=128, spp=2, max_depth=8, ray_batch=128*128,
                   use_bvh=True, jitter=False, light_sampling="power", mis_mode="exact")
_N_ATTR = (mb._NA_TEX if scene.has_textures else mb._NA)
orig_body = mb.make_bounce_body

def run(tag, patch=None):
    mb.make_bounce_body = patch if patch else orig_body
    mb.render_mega_bvh.clear_cache()
    dt, nr, cs = frame_time(scene, cfg)
    print(f"{tag:14s} frame {dt*1e3:7.1f} ms (compile {cs:5.1f}s) rays {nr/1e6:6.2f}M")

def stub_traversal(cfg_, present, **kw):
    def cheap_closest(o, d, alive):
        t = jnp.where(alive, 1.0, 1e30)
        z = jnp.zeros_like(t)
        attrs = [z + (1.0 if i in (2, 5, 8, 29, 30) else (0.5 if i in (15, 16, 17) else 0.0))
                 for i in range(_N_ATTR)]
        return t, alive, z, z, tuple(attrs)
    kw["closest"] = cheap_closest
    kw["any_hit"] = lambda o, d, tmin, tmax, act: jnp.zeros_like(act)
    return orig_body(cfg_, present, **kw)

def stub_anyhit(cfg_, present, **kw):
    kw["any_hit"] = lambda o, d, tmin, tmax, act: jnp.zeros_like(act)
    return orig_body(cfg_, present, **kw)

def stub_all_and_light(cfg_, present, **kw):
    kw["any_hit"] = lambda o, d, tmin, tmax, act: jnp.zeros_like(act)
    def cheap_closest(o, d, alive):
        t = jnp.where(alive, 1.0, 1e30)
        z = jnp.zeros_like(t)
        attrs = [z + (1.0 if i in (2, 5, 8, 29, 30) else (0.5 if i in (15, 16, 17) else 0.0))
                 for i in range(_N_ATTR)]
        return t, alive, z, z, tuple(attrs)
    kw["closest"] = cheap_closest
    def cheap_light(seed, bounce):
        z = jnp.zeros((8, 128), jnp.float32)
        one = z + 1.0
        return ((z, one, z), (one, one, z), (z, one, one), (one + 5, one + 5, one + 5), z + 0.5)
    kw["pick_light"] = cheap_light
    return orig_body(cfg_, present, **kw)

orig_uniform = mega._uniform
def stub_rng_too(cfg_, present, **kw):
    mega._uniform = lambda seed, bounce, ch: jnp.zeros((8, 128), jnp.float32) + 0.37
    try:
        return stub_all_and_light(cfg_, present, **kw)
    finally:
        mega._uniform = orig_uniform

if __name__ == "__main__":
    run("base")
    run("no_traversal", stub_traversal)
    run("no_anyhit", stub_anyhit)
    run("no_trav_light", stub_all_and_light)
    run("no_rng_too", stub_rng_too)
