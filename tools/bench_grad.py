#!/usr/bin/env python
"""Time one Adam gradient step (MSE vs target) on Cornell at given config."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()
import jax, jax.numpy as jnp, numpy as np
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator.path_tracer import render_sample

remat = sys.argv[5] if len(sys.argv) > 5 else "bounce"
size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 64
depth = int(sys.argv[3]) if len(sys.argv) > 3 else 5
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 65536

scene, _ = load_mitsuba_scene("scenes/cornell/scene.xml")
cfg = RenderConfig(width=size, height=size, spp=spp, max_depth=depth, ray_batch=batch,
                   grad_remat=remat)
n_pixels = size * size
target = jnp.zeros((n_pixels, 3), jnp.float32)

@jax.jit
def grad_step(params, ts):
    def loss(p):
        sc = scene.replace(bsdf_params=p)
        nb = n_pixels // batch
        pix = jnp.arange(n_pixels, dtype=jnp.uint32).reshape(nb, batch)
        def pix_batch(pb):
            # double remat: the spp scan would otherwise store every bounce
            # carry per sample (48 GB at 512^2@64spp d5) — path replay
            # recomputes instead
            @jax.checkpoint
            def body(acc, s):
                rad, _ = render_sample(sc, cfg.replace(spp=1), pb, ts + s, differentiable=True)
                return acc + rad, None
            acc, _ = jax.lax.scan(body, jnp.zeros((batch, 3), jnp.float32),
                                  jnp.arange(spp, dtype=jnp.uint32))
            return acc / spp
        img = jax.lax.map(pix_batch, pix).reshape(n_pixels, 3)
        return jnp.mean((img - target) ** 2)
    return jax.value_and_grad(loss)(params)

t0 = time.time()
l, g = grad_step(scene.bsdf_params, jnp.uint32(0))
np.asarray(g)
print(f"compile+first: {time.time()-t0:.1f}s")
times = []
for i in range(2):
    t0 = time.time()
    l, g = grad_step(scene.bsdf_params, jnp.uint32(i+1))
    np.asarray(g)
    times.append(time.time()-t0)
dt = float(np.median(times))
paths = n_pixels * spp
print(f"size={size} spp={spp} depth={depth}: {dt:.2f}s/step = {1/dt:.3f} grad-steps/s "
      f"({paths/dt/1e6:.2f} Mpaths/s fwd+bwd)")
