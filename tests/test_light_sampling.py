"""Power-weighted light sampling: same expectation as uniform, CDF sane."""

import numpy as np
import jax.numpy as jnp

from gpuspectral_tpu.integrator import render_image
from gpuspectral_tpu.utils import RenderConfig


def test_light_cdf_structure(cornell_scene):
    cdf = np.asarray(cornell_scene.light_cdf)
    prob = np.asarray(cornell_scene.light_prob)
    assert cdf.shape == prob.shape
    assert abs(prob.sum() - 1.0) < 1e-5
    assert abs(cdf[-1] - 1.0) < 1e-6
    assert (np.diff(cdf) >= -1e-7).all()
    # both cornell light triangles have the same power
    np.testing.assert_allclose(prob, 0.5, atol=1e-5)


def test_power_sampling_same_expectation(cornell_scene):
    cfg_u = RenderConfig(width=24, height=24, spp=48, max_depth=2, ray_batch=576)
    cfg_p = cfg_u.replace(light_sampling="power", spp=48)
    img_u = np.asarray(render_image(cornell_scene, cfg_u))
    img_p = np.asarray(render_image(cornell_scene, cfg_p, timestamp0=500))
    m_u = img_u.reshape(6, 4, 6, 4, 3).mean((1, 3))
    m_p = img_p.reshape(6, 4, 6, 4, 3).mean((1, 3))
    err = np.abs(m_u - m_p).mean() / max(m_u.mean(), 1e-9)
    assert err < 0.15, err
