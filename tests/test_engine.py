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


def test_cli_view_progressive(tmp_path, cornell_scene):
    """The headless viewer (reference Window::run analogue) writes previews
    and a final image."""
    from gpuspectral_tpu.cli.main import main

    prev = tmp_path / "prev.png"
    out = tmp_path / "final.png"
    rc = main([
        "view", "scenes/cornell/scene.xml", "--size", "16x16", "--depth", "2",
        "--frames", "4", "--every", "2", "--preview", str(prev),
        "-o", str(out), "--tonemap", "--ray-batch", "256",
    ])
    assert rc == 0
    assert prev.exists() and out.exists()


def test_ansi_preview_renders():
    import numpy as np

    from gpuspectral_tpu.cli.main import _ansi_preview

    img = np.random.default_rng(0).uniform(0, 2, size=(32, 32, 3)).astype(np.float32)
    s = _ansi_preview(img, max_rows=8)
    assert "\x1b[38;2;" in s and s.count("\n") >= 3
