"""Engine workflow tests: the reference's init/load/run loop + resume."""

import numpy as np

from gpuspectral_tpu.engine import Engine
from tests.conftest import CORNELL_XML


def test_engine_progressive_loop(tmp_path):
    e = Engine()
    e.init(16, 16, max_depth=2, ray_batch=256)
    e.load_scene(str(CORNELL_XML))
    frames = []
    img = e.run(3, on_frame=lambda t, im: frames.append((t, im.mean())))
    assert img.shape == (16, 16, 3)
    assert len(frames) == 3
    assert np.isfinite(img).all() and img.max() > 0

    # checkpoint mid-run, keep rendering, restore and catch up
    e2 = Engine()
    e2.init(16, 16, max_depth=2, ray_batch=256)
    e2.load_scene(str(CORNELL_XML))
    e2.run(2)
    ck = str(tmp_path / "state.npz")
    e2.checkpoint(ck)
    full = e2.run(1)

    e3 = Engine()
    e3.init(16, 16, max_depth=2, ray_batch=256)
    e3.load_scene(str(CORNELL_XML))
    e3.restore(ck)
    resumed = e3.run(1)
    np.testing.assert_array_equal(resumed, full)

    # saving works
    e3.save(str(tmp_path / "out.png"))
    e3.save(str(tmp_path / "out.exr"))
    assert (tmp_path / "out.png").exists() and (tmp_path / "out.exr").exists()
