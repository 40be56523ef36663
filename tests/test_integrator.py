"""Integrator-level correctness tests on the Cornell box.

The strongest internal check we have (the reference ships no tests at all):
NEE+MIS and pure BSDF sampling are two different estimators of the same
integral, so their converged images must agree.  Plus structural checks on
the render (light/wall colors, energy placement, NaN-freeness) and
progressive-accumulation semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gpuspectral_tpu.integrator import render_image
from gpuspectral_tpu.integrator.path_tracer import render_step
from gpuspectral_tpu.utils import RenderConfig


CFG = RenderConfig(width=32, height=32, spp=16, max_depth=3, ray_batch=1024, tri_chunk=128)


@pytest.fixture(scope="module")
def cornell_render(cornell_scene):
    return np.asarray(render_image(cornell_scene, CFG))


def test_render_finite_and_lit(cornell_render):
    img = cornell_render
    assert np.isfinite(img).all()
    assert img.max() > 1.0  # the light source is visible
    assert img.mean() > 0.01  # indirect light fills the box


def test_cornell_color_bleeding(cornell_render):
    img = cornell_render
    # left wall red-dominant, right wall green-dominant
    left = img[12:28, 1:5].mean((0, 1))
    right = img[12:28, 27:31].mean((0, 1))
    assert left[0] > 2.0 * left[1]
    assert right[1] > 1.5 * right[0]
    # light region is the brightest patch
    ceiling_light = img[1:4, 13:19].mean((0, 1))
    assert ceiling_light.sum() > img.mean((0, 1)).sum() * 3


def test_nee_off_matches_nee_on(cornell_scene):
    """Two independent estimators of the same transport integral."""
    cfg_on = CFG.replace(width=24, height=24, spp=96, max_depth=3)
    cfg_off = cfg_on.replace(nee=False, spp=512)
    on = np.asarray(render_image(cornell_scene, cfg_on))
    off = np.asarray(render_image(cornell_scene, cfg_off, timestamp0=9000))
    # compare downsampled means (pure BSDF sampling is noisy)
    m_on = on.reshape(6, 4, 6, 4, 3).mean((1, 3))
    m_off = off.reshape(6, 4, 6, 4, 3).mean((1, 3))
    err = np.abs(m_on - m_off).mean() / max(m_on.mean(), 1e-9)
    assert err < 0.25, f"relative disagreement {err:.3f}"


def test_progressive_accumulation_matches_batch(cornell_scene):
    """K render_step frames == one render_image with spp=K (same seeds)."""
    cfg = CFG.replace(width=16, height=16, spp=4, ray_batch=256)
    batch = np.asarray(render_image(cornell_scene, cfg, timestamp0=0))
    accum = jnp.zeros((16, 16, 3))
    for t in range(4):
        accum = render_step(cornell_scene, cfg, accum, jnp.uint32(t))
    np.testing.assert_allclose(np.asarray(accum), batch, rtol=1e-4, atol=1e-5)


def test_depth_increases_energy(cornell_scene):
    """More bounces -> more (indirect) light, monotonically."""
    cfg1 = CFG.replace(width=16, height=16, spp=16, max_depth=1, ray_batch=256)
    cfg3 = cfg1.replace(max_depth=4)
    img1 = np.asarray(render_image(cornell_scene, cfg1)).mean()
    img3 = np.asarray(render_image(cornell_scene, cfg3)).mean()
    assert img3 > img1 * 1.05


def test_firefly_clamp_bounds_output(cornell_scene):
    cfg = CFG.replace(width=16, height=16, spp=4, ray_batch=256)
    img = np.asarray(render_image(cornell_scene, cfg))
    # each per-bounce contribution < clamp; depth+1 bounces bound the sum
    assert img.max() <= cfg.firefly_clamp * (cfg.max_depth + 2)
