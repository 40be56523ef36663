import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()
import numpy as np, jax.numpy as jnp, jax
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator.mega import render_mega

scene, _b = load_mitsuba_scene("scenes/cornell/scene.xml")
cfg = RenderConfig(width=512, height=512, spp=16, max_depth=50)
t0 = time.time()
img, nrays = render_mega(scene, cfg, 100)
np.asarray(img)
print("compile+run", time.time() - t0)
times = []
for i in range(3):
    t0 = time.time()
    img, nrays = render_mega(scene, cfg, 100)
    np.asarray(img)
    times.append(time.time() - t0)
sec = float(np.median(times))
nr = float(np.asarray(nrays))
print(f"seconds {sec:.3f}  rays {nr:.0f}  Mrays/s {nr/sec/1e6:.1f}")
print("img mean", float(np.asarray(img).mean()))
