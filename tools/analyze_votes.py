#!/usr/bin/env python
"""Analyze cluster-sweep vote occupancy on a real scene: how many supernodes
(128-triangle Morton ranges) does each 1024-ray block actually visit, per
bounce, with and without ray sorting?  This bounds the sweep kernel's work.
Runs on CPU (votes math only, no Pallas)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator import path_tracer as pt
from gpuspectral_tpu.bvh.cluster_sweep import _supernode_tables, BLOCK
from gpuspectral_tpu.ops import rng
from gpuspectral_tpu.scene.camera import generate_rays

scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/cornell/scene.xml"
R = 65536
scene, _b = load_mitsuba_scene(scene_path)
cfg = RenderConfig(width=512, height=512, spp=1, max_depth=8, ray_batch=R,
                   use_bvh=True, intersector="woop")

blo, bhi, _pad, S, K = _supernode_tables(
    np.asarray(scene.bvh_node_min), np.asarray(scene.bvh_node_max),
    scene.bvh_clusters, scene.tri_woop_t.shape[1])
blo, bhi = np.asarray(blo), np.asarray(bhi)  # (3, Sp)
print(f"scene={scene_path} tris={scene.num_tris} clusters={scene.bvh_clusters} "
      f"S={S} K={K} (supernode={K*64} tris)")

def votes_per_block(o, d, alive, sort):
    o, d = np.asarray(o), np.asarray(d)
    alive = np.asarray(alive)
    if sort:
        key = np.asarray(pt._ray_sort_key(scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(~alive)))
        order = np.argsort(key)
        o, d, alive = o[order], d[order], alive[order]
    nb = o.shape[0] // BLOCK
    counts = []
    for b in range(nb):
        sl = slice(b * BLOCK, (b + 1) * BLOCK)
        ob, db, ab = o[sl], d[sl], alive[sl]
        if not ab.any():
            counts.append(0); continue
        ob, db = ob[ab], db[ab]
        inv = 1.0 / np.where(np.abs(db) < 1e-12, np.where(db < 0, -1e-12, 1e-12), db)
        t0 = (blo[None, :, :] - ob[:, :, None]) * inv[:, :, None]  # (r,3,Sp)
        t1 = (bhi[None, :, :] - ob[:, :, None]) * inv[:, :, None]
        tn = np.minimum(t0, t1).max(axis=1)
        tf = np.maximum(t0, t1).min(axis=1)
        hit = (tf >= np.maximum(tn, 0.0)) & (tf >= 0)
        counts.append(int(hit.any(axis=0)[:S].sum()))
    return np.array(counts)

# simulate a few bounces with the XLA wavefront to get realistic ray states
pix = jnp.arange(R, dtype=jnp.uint32)
seed = rng.pixel_seed(pix, jnp.uint32(0))
o, d = generate_rays(scene.camera, 512, 512, pix)
state = dict(origin=o, direction=d, weight=jnp.ones((R,3)), direct_weight=jnp.ones((R,)),
             prev_pdf=jnp.ones((R,)), prev_nee=jnp.zeros((R,),bool), was_delta=jnp.zeros((R,),bool),
             count_emitted=jnp.ones((R,),bool), done=jnp.zeros((R,),bool),
             radiance=jnp.zeros((R,3)), rays_traced=jnp.zeros((R,),jnp.int32), seed=seed)
bounce_fn = jax.jit(lambda b, st: pt._bounce(scene, cfg, b, st))
for bounce in range(5):
    alive = ~np.asarray(state["done"])
    for sort in (False, True):
        c = votes_per_block(state["origin"], state["direction"], alive, sort)
        print(f"bounce {bounce} sort={int(sort)}: alive={alive.mean():.2f} "
              f"voted supernodes/block mean={c.mean():.1f} p50={np.median(c):.0f} "
              f"p90={np.percentile(c,90):.0f} max={c.max()} of {S}")
    state = bounce_fn(jnp.uint32(bounce), state)
