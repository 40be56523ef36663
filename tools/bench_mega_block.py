import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gpuspectral_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()
import numpy as np, jax.numpy as jnp
from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.utils.config import RenderConfig
from gpuspectral_tpu.integrator import mega

scene, _b = load_mitsuba_scene("scenes/cornell/scene.xml")
cfg = RenderConfig(width=512, height=512, spp=16, max_depth=50)
for sub, lanes in [(8, 128), (16, 128), (8, 256), (32, 128), (16, 256)]:
    mega.SUB, mega.LANES, mega.BLOCK = sub, lanes, sub * lanes
    mega.render_mega.clear_cache()
    try:
        img, nrays = mega.render_mega(scene, cfg, 100)
        np.asarray(img)
        times = []
        for i in range(3):
            t0 = time.time()
            img, nrays = mega.render_mega(scene, cfg, 100)
            np.asarray(img)
            times.append(time.time() - t0)
        sec = float(np.median(times)); nr = float(np.asarray(nrays))
        print(f"block ({sub:2d},{lanes:3d})={sub*lanes:5d}: {sec:.3f}s  {nr/sec/1e6:7.1f} Mrays/s")
    except Exception as e:
        print(f"block ({sub},{lanes}): FAIL {str(e)[:120]}")
