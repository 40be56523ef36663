"""Sampler unit tests: pdf normalization, cosine distribution, light pdf."""

import numpy as np
import jax.numpy as jnp

from gpuspectral_tpu.ops import rng, sampling as smp
from gpuspectral_tpu.ops import math3d as m3


def _uniforms(n, bounce=0, ch=0):
    seeds = rng.pixel_seed(jnp.arange(n, dtype=jnp.uint32), 0)
    return rng.uniform(seeds, bounce, ch), rng.uniform(seeds, bounce, ch + 1)


def test_concentric_disk_in_unit_disk():
    u1, u2 = _uniforms(1 << 14)
    x, y = smp.sample_concentric_disk(u1, u2)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert r2.max() <= 1.0 + 1e-6
    # area-uniform: mean radius^2 should be ~1/2
    assert abs(r2.mean() - 0.5) < 0.01


def test_cosine_hemisphere_distribution():
    u1, u2 = _uniforms(1 << 15)
    w = np.asarray(smp.sample_cosine_hemisphere(u1, u2))
    assert np.all(w[:, 2] >= 0.0)
    np.testing.assert_allclose(np.linalg.norm(w, axis=1), 1.0, atol=1e-5)
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert abs(w[:, 2].mean() - 2.0 / 3.0) < 0.01
    # pdf agreement
    pdf = np.asarray(smp.cosine_hemisphere_pdf(jnp.asarray(w)))
    np.testing.assert_allclose(pdf, np.abs(w[:, 2]) / np.pi, atol=1e-5)


def test_beckmann_half_vector_statistics():
    alpha = 0.3
    u1, u2 = _uniforms(1 << 15)
    wh = np.asarray(smp.sample_half_beckmann(u1, u2, alpha))
    np.testing.assert_allclose(np.linalg.norm(wh, axis=1), 1.0, atol=1e-5)
    assert np.all(wh[:, 2] > 0.0)
    # E[tan^2 theta] = alpha^2 for Beckmann
    tan2 = (wh[:, 0] ** 2 + wh[:, 1] ** 2) / wh[:, 2] ** 2
    assert abs(tan2.mean() - alpha * alpha) < 0.01


def test_power_heuristic_props():
    w = np.asarray(smp.power_heuristic(jnp.asarray([1.0]), jnp.asarray([1.0])))
    np.testing.assert_allclose(w, 0.5)
    wa = np.asarray(smp.power_heuristic(jnp.asarray([2.0]), jnp.asarray([1.0])))
    wb = np.asarray(smp.power_heuristic(jnp.asarray([1.0]), jnp.asarray([2.0])))
    np.testing.assert_allclose(wa + wb, 1.0, atol=1e-6)


def test_triangle_light_monte_carlo_irradiance():
    """MC estimate of solid angle subtended by a unit triangle, using the
    sampler's pdf, must match the analytic solid angle."""
    v0 = jnp.asarray([-0.5, 2.0, -0.5])
    v1 = jnp.asarray([0.5, 2.0, -0.5])
    v2 = jnp.asarray([-0.5, 2.0, 0.5])
    emission = jnp.ones((3,))
    shade = jnp.zeros((3,))
    n = 1 << 15
    u1, u2 = _uniforms(n)
    b = lambda v: jnp.broadcast_to(v, (n, 3))
    pos, emitted, pdf = smp.sample_triangle_light(
        b(v0), b(v1), b(v2), b(emission), b(shade), u1, u2
    )
    # estimator of solid angle: E[1/pdf]
    est = np.asarray(1.0 / pdf).mean()
    # analytic (Van Oosterom-Strackee)
    a, bb, c = np.asarray(v0), np.asarray(v1), np.asarray(v2)
    la, lb, lc = np.linalg.norm(a), np.linalg.norm(bb), np.linalg.norm(c)
    num = np.abs(np.dot(a, np.cross(bb, c)))
    den = la * lb * lc + np.dot(a, bb) * lc + np.dot(a, c) * lb + np.dot(bb, c) * la
    omega = 2 * np.arctan2(num, den)
    np.testing.assert_allclose(est, omega, rtol=0.02)
    # back side is dark
    behind = jnp.asarray([0.0, 4.0, 0.0])
    _, emitted_b, _ = smp.sample_triangle_light(
        b(v0), b(v1), b(v2), b(emission), b(behind), u1, u2
    )
    assert np.asarray(emitted_b).max() == 0.0


def test_onb_roundtrip():
    rs = np.random.default_rng(0)
    n = m3.normalize(jnp.asarray(rs.normal(size=(100, 3)), jnp.float32))
    t, b, nn = m3.onb_create(n)
    v = m3.normalize(jnp.asarray(rs.normal(size=(100, 3)), jnp.float32))
    local = m3.onb_world_to_local(t, b, nn, v)
    back = m3.onb_local_to_world(t, b, nn, local)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)
    # orthonormality
    np.testing.assert_allclose(np.asarray(m3.dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m3.dot(t, nn)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m3.length(t)), 1.0, atol=1e-5)
