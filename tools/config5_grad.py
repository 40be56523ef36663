#!/usr/bin/env python
"""Config 5 scale demonstration (BASELINE.json north star): one inverse-
rendering gradient step at 1024^2 @ 256 spp on a single chip, through the
fused megakernel forward + path-replay backward (integrator/mega_grad.py).

Usage: python tools/config5_grad.py [size] [spp] [depth]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from gpuspectral_tpu.utils.jaxcache import enable
    enable()
    import jax
    import jax.numpy as jnp

    from gpuspectral_tpu.integrator.mega_grad import (
        mega_grad_eligible, render_mega_diff)
    from gpuspectral_tpu.scene import load_mitsuba_scene
    from gpuspectral_tpu.utils import RenderConfig

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, _ = load_mitsuba_scene(os.path.join(here, "scenes/cornell/scene.xml"))
    cfg = RenderConfig(width=size, height=size, spp=spp, max_depth=depth,
                       ray_batch=size * size)
    print(f"{size}^2 @ {spp} spp depth {depth}; eligible:",
          mega_grad_eligible(scene, cfg), flush=True)
    n_pixels = size * size
    target = jnp.zeros((n_pixels, 3), jnp.float32)

    @jax.jit
    def grad_step(params, ts):
        def loss(p):
            sc = scene.replace(bsdf_params=p)
            img = render_mega_diff(sc, cfg, ts).reshape(n_pixels, 3)
            return jnp.mean((img - target) ** 2)

        return jax.value_and_grad(loss)(params)

    t0 = time.time()
    loss, g = grad_step(scene.bsdf_params, jnp.uint32(0))
    np.asarray(g)
    print(f"compile+step {time.time()-t0:.1f}s loss={float(loss):.5f}",
          flush=True)
    times = []
    for i in range(3):
        t0 = time.time()
        _, g = grad_step(scene.bsdf_params, jnp.uint32(i + 1))
        np.asarray(g)
        times.append(time.time() - t0)
        print(f"step {i}: {times[-1]:.2f}s", flush=True)
    dt = float(np.median(times))
    print(f"median {dt:.2f} s/step = {1/dt:.3f} grad-steps/s "
          f"({n_pixels*spp/dt/1e6:.1f} Mpaths/s fwd+bwd)")


if __name__ == "__main__":
    main()
