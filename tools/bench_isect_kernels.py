#!/usr/bin/env python
"""Device-true intersection-kernel benchmark on captured real rays.

Feeds the staircase2 ray sets captured by tools/measure_votes.py
(/tmp/stair_rays.npz: primary/bounce1 coherence-sorted, shadow
endpoint-sorted) through the BVH kernels, timing N back-to-back calls inside
one jit (inputs perturbed through a carry so XLA cannot hoist).

This is the inner-loop number that bounds everything: Mrays/s per kernel per
ray-distribution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

N = 16


def bench(name, fn, *args):
    @jax.jit
    def loop(o, d, *rest):
        def body(i, carry):
            acc, oo = carry
            r = fn(oo, d, *rest)
            # fold result into acc and perturb origin so iterations chain
            s = r[0] if isinstance(r, tuple) else r
            s = jnp.sum(s.astype(jnp.float32))
            return (acc + s, oo + (s * 1e-30))
        acc, _ = jax.lax.fori_loop(0, N, body, (jnp.float32(0), o))
        return acc

    v = loop(*args); np.asarray(v)  # compile+warm
    t0 = time.time(); np.asarray(loop(*args)); dt = (time.time() - t0) / N
    r = args[0].shape[0]
    print(f"{name:34s} {dt*1e3:8.2f} ms/call  {r/dt/1e6:7.2f} Mrays/s")
    return dt


def main():
    from gpuspectral_tpu.bvh import cluster_sweep as cs
    from gpuspectral_tpu.scene import load_mitsuba_scene

    scene, _ = load_mitsuba_scene(
        sys.argv[1] if len(sys.argv) > 1 else
        "/root/reference/src/GPUSpectral/assets/scenes/staircase2/scene.xml")
    rays = np.load("/tmp/stair_rays.npz")
    print(f"clusters={scene.bvh_clusters} leaf={scene.bvh_leaf_size} "
          f"slots={scene.tri_woop_t.shape[1]} BLOCK={cs.BLOCK}")

    j = jnp.asarray
    o, d = j(rays["o"]), j(rays["d"])
    o1, d1 = j(rays["o1"]), j(rays["d1"])
    h1 = j(rays["hit"])
    os_, ds_ = j(rays["os"]), j(rays["ds"])
    ts_, hs = j(rays["ts"]), j(rays["hits"])

    bench("closest primary (sorted)",
          lambda oo, dd: cs.cluster_closest(scene, oo, dd), o, d)
    bench("closest bounce1 (sorted)",
          lambda oo, dd: cs.cluster_closest(scene, oo, dd, active=h1), o1, d1)
    bench("any shadow (endpoint-sorted)",
          lambda oo, dd: cs.cluster_any(scene, oo, dd, 0.01,
                                        ts_ - 0.01, active=hs), os_, ds_)


if __name__ == "__main__":
    main()
