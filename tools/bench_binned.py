#!/usr/bin/env python
"""Raw binned-traversal throughput on a real scene (closest + any)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REF = "/root/reference/src/GPUSpectral/assets/scenes"


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else f"{REF}/staircase2/scene.xml"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    from gpuspectral_tpu.utils.jaxcache import enable

    enable()
    if os.environ.get("BVH_KERNEL", "binned") == "ftb":
        from gpuspectral_tpu.bvh.ftb import ftb_any as binned_any
        from gpuspectral_tpu.bvh.ftb import ftb_closest as binned_closest
        print("kernel: ftb")
    else:
        from gpuspectral_tpu.bvh.binned import binned_any, binned_closest
    from gpuspectral_tpu.scene import load_mitsuba_scene

    scene, _ = load_mitsuba_scene(scene_path)
    print(f"tris={scene.num_tris} bins={scene.bvh_bins} slots={scene.bvh_bin_slots}")

    # bounce-1-like rays: origins on surfaces (random barycenters of random
    # tris), cosine-ish directions
    rs = np.random.default_rng(0)
    tp = np.asarray(scene.tri_pos[: scene.num_tris])
    ti = rs.integers(0, scene.num_tris, n)
    bc = rs.dirichlet((1, 1, 1), n).astype(np.float32)
    o = np.einsum("rk,rkc->rc", bc, tp[ti])
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nrm = np.cross(tp[ti, 1] - tp[ti, 0], tp[ti, 2] - tp[ti, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    d = np.where((d * nrm).sum(-1, keepdims=True) < 0, -d, d)
    o = (o + 1e-4 * nrm).astype(np.float32)

    sort = sys.argv[3] if len(sys.argv) > 3 else "octant"
    if sort == "octant":
        # what the wavefront's periodic lane re-sort gives the kernel
        from gpuspectral_tpu.integrator.path_tracer import _ray_sort_key

        key = np.asarray(_ray_sort_key(scene, jnp.asarray(o), jnp.asarray(d),
                                       jnp.zeros((n,), bool)))
        order = np.argsort(key)
        o, d = o[order], d[order]
    elif sort == "firstbin":
        bb = np.asarray(scene.bvh_bin_bounds)
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        t0 = (bb[0:3].T[None] - o[:, None]) * inv[:, None]
        t1 = (bb[3:6].T[None] - o[:, None]) * inv[:, None]
        tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
        tf = np.minimum(np.maximum(t0, t1).min(-1), 1e30)
        v = tf >= tn
        key = np.where(v.any(1), np.argmax(v, 1), 1 << 20)
        order = np.argsort(key, kind="stable")
        o, d = o[order], d[order]
    print(f"ray order: {sort}")
    o, d = jnp.asarray(o), jnp.asarray(d)

    closest = jax.jit(lambda o, d: binned_closest(scene, o, d, interpret=False))
    anyf = jax.jit(lambda o, d: binned_any(
        scene, o, d, t_min=1e-3, t_max=jnp.full((n,), 2.0), interpret=False))

    for name, fn, outs in (("closest", closest, 5), ("any", anyf, 1)):
        t0 = time.perf_counter()
        r = fn(o, d)
        np.asarray(r[0] if isinstance(r, tuple) else r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            r = fn(o, d)
        np.asarray(r[0] if isinstance(r, tuple) else r)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: compile {compile_s:.1f}s, {dt*1e3:.2f} ms/query, "
              f"{n/dt/1e6:.1f} Mrays/s")
        if name == "closest":
            prim = np.asarray(r[1])
            print(f"  hit rate {np.mean(prim >= 0):.3f}")


if __name__ == "__main__":
    main()
