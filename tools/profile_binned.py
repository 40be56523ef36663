#!/usr/bin/env python
"""Per-component timing of the binned traversal on a real scene."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REF = "/root/reference/src/GPUSpectral/assets/scenes"


def timeit(name, fn, *args, reps=10):
    r = fn(*args)
    jax.tree.map(np.asarray, r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.tree.map(np.asarray, r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:24s} {dt*1e3:8.2f} ms")
    return r


def main():
    from gpuspectral_tpu.utils.jaxcache import enable

    enable()
    from gpuspectral_tpu.bvh import binned as bn
    from gpuspectral_tpu.scene import load_mitsuba_scene

    scene, _ = load_mitsuba_scene(f"{REF}/staircase2/scene.xml")
    n = 65536
    n_bins, slots = scene.bvh_bins, scene.bvh_bin_slots
    print(f"tris={scene.num_tris} bins={n_bins} slots={slots}")

    rs = np.random.default_rng(0)
    tp = np.asarray(scene.tri_pos[: scene.num_tris])
    ti = rs.integers(0, scene.num_tris, n)
    bc = rs.dirichlet((1, 1, 1), n).astype(np.float32)
    o = np.einsum("rk,rkc->rc", bc, tp[ti]).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.full((n,), 1e30)

    # vote
    vote = jax.jit(lambda o, d, tm: bn._vote(scene.bvh_bin_bounds, o, d, tm, False))
    words = timeit("vote", vote, o, d, t_max)
    w = np.ascontiguousarray(np.asarray(words))
    pc = np.unpackbits(w.view(np.uint8), axis=1).sum(1)
    print(f"  votes/ray mean={pc.mean():.1f} max={pc.max()}")

    # next-bin extraction
    nxt = jax.jit(bn._next_bin)
    binv, words2 = timeit("next_bin", nxt, words)

    # grouping
    grp = jax.jit(lambda b: bn._group(b, n_bins)[:2])
    slot, block_bin = timeit("group(argsort)", grp, binv)

    # ray scatter
    s = (-(-n // bn.BLOCK_R) + n_bins + 1) * bn.BLOCK_R
    scat = jax.jit(lambda sl, o, d, tm: bn._scatter_rays(
        sl, s, o, d, jnp.zeros((n,), jnp.float32), tm))
    o_s, d_s, tmin_s, tmax_s = timeit("scatter_rays", scat, slot, o, d, t_max)

    # sweep
    attr = bn._attr_table(scene, scene.has_textures)
    n_attr = attr.shape[0]
    woop_t = scene.tri_woop_t
    need = n_bins * slots
    if woop_t.shape[1] < need:
        woop_t = jnp.pad(woop_t, ((0, 0), (0, need - woop_t.shape[1])))
        attr = jnp.pad(attr, ((0, 0), (0, need - attr.shape[1])))
    n_blocks = s // bn.BLOCK_R
    sweep = bn._sweep_call(slots, n_attr, n_blocks, False)
    sw = jax.jit(lambda bb, os_, ds_, tn, tx: sweep(bb, os_, ds_, tn, tx, woop_t, attr))
    outs = timeit("sweep", sw, block_bin, o_s, d_s, tmin_s, tmax_s)

    # gather-back + merge (representative)
    def merge(t_s, slot, tb):
        t_r = t_s[slot, 0]
        return jnp.minimum(t_r, tb)
    mg = jax.jit(merge)
    timeit("gather_merge", mg, outs[0], slot, t_max)

    # full rounds loop
    full = jax.jit(lambda o, d: bn.binned_closest(scene, o, d, interpret=False))
    timeit("FULL closest", full, o, d, reps=3)

    # round count
    wcur = words
    rounds = 0
    while np.asarray(jnp.any(wcur != 0)):
        b, wcur = nxt(wcur)
        rounds += 1
    print(f"rounds (all-rays drain) = {rounds}")


if __name__ == "__main__":
    main()
