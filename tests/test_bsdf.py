"""BSDF library tests: sample/eval agreement, energy conservation (white
furnace bounds), Fresnel closed forms, delta bookkeeping — the unit layer the
reference never had (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from gpuspectral_tpu.bsdf import (
    BSDFTable,
    diffuse,
    eval_bsdf,
    is_transmission,
    rough_conductor,
    rough_plastic,
    sample_bsdf,
    smooth_conductor,
    smooth_dielectric,
    smooth_plastic,
)
from gpuspectral_tpu.bsdf.table import (
    BSDF_DIFFUSE,
    BSDF_ROUGH_CONDUCTOR,
    BSDF_SMOOTH_DIELECTRIC,
)
from gpuspectral_tpu.ops import microfacet as mf
from gpuspectral_tpu.ops import rng


def _params_for(kind_row, n):
    t = BSDFTable()
    t.add(kind_row)
    kinds, params = t.pack()
    return (
        jnp.broadcast_to(jnp.asarray(params[0]), (n, params.shape[1])),
        jnp.full((n,), kinds[0], jnp.int32),
    )


def _wo(n, z=0.6):
    wo = jnp.asarray([np.sqrt(1 - z * z), 0.0, z], jnp.float32)
    return jnp.broadcast_to(wo, (n, 3))


def _uniform3(n, salt=0):
    seeds = rng.pixel_seed(jnp.arange(n, dtype=jnp.uint32), salt)
    return (rng.uniform(seeds, 0, 0), rng.uniform(seeds, 0, 1), rng.uniform(seeds, 0, 2))


def test_diffuse_sample_eval_agree():
    n = 4096
    p, k = _params_for(diffuse((0.7, 0.5, 0.3)), n)
    wo = _wo(n)
    u0, u1, u2 = _uniform3(n)
    wi, f, pdf, delta = sample_bsdf(p, k, wo, u0, u1, u2)
    f_e, pdf_e, delta_e = eval_bsdf(p, k, wo, wi)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf_e), atol=1e-6)
    assert not np.asarray(delta).any()
    # white furnace: E[f * cos / pdf] = albedo for cosine-sampled diffuse
    est = np.asarray(f * (jnp.abs(wi[:, 2:3]) / pdf[:, None])).mean(0)
    np.testing.assert_allclose(est, [0.7, 0.5, 0.3], rtol=0.02)


def test_smooth_dielectric_energy_and_flags():
    n = 8192
    p, k = _params_for(smooth_dielectric(1.5, 1.0), n)
    wo = _wo(n)
    u0, u1, u2 = _uniform3(n)
    wi, f, pdf, delta = sample_bsdf(p, k, wo, u0, u1, u2)
    assert np.asarray(delta).all()
    assert np.asarray(is_transmission(k)).all()
    # throughput weight f*|cos wi|/pdf: exactly 1 for reflection, exactly
    # (no/nt)^2 (the radiance-compression factor the reference bakes into the
    # refraction bsdf, rayhit.rchit:394) for refraction
    w = np.asarray(f[:, 0] * jnp.abs(wi[:, 2]) / pdf)
    refl = np.asarray(wi[:, 2]) > 0
    np.testing.assert_allclose(w[refl], 1.0, rtol=1e-5)
    np.testing.assert_allclose(w[~refl], (1.0 / 1.5) ** 2, rtol=1e-5)
    # reflected rays mirror wo, refracted bend below surface
    np.testing.assert_allclose(np.asarray(wi)[refl, 2], 0.6, atol=1e-5)
    assert (np.asarray(wi)[~refl, 2] < 0).all()
    # eval of a delta bsdf is black (rayhit.rchit:400-404)
    f_e, _, delta_e = eval_bsdf(p, k, wo, wi)
    assert np.asarray(f_e).max() == 0.0
    assert np.asarray(delta_e).all()


def test_smooth_dielectric_tir():
    """From inside the dense medium at grazing angle: total internal
    reflection, weight exactly 1/|cos| * pdf=1."""
    n = 16
    p, k = _params_for(smooth_dielectric(1.5, 1.0), n)
    z = -0.2  # inside, steep grazing => sin_critical = 1/1.5 -> TIR
    wo = jnp.broadcast_to(jnp.asarray([np.sqrt(1 - z * z), 0.0, z], jnp.float32), (n, 3))
    u0, u1, u2 = _uniform3(n)
    wi, f, pdf, delta = sample_bsdf(p, k, wo, u0, u1, u2)
    np.testing.assert_allclose(np.asarray(wi[:, 2]), z, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf), 1.0)
    np.testing.assert_allclose(np.asarray(f[:, 0]), 1.0 / abs(z), rtol=1e-5)


def test_smooth_conductor_mirror():
    n = 64
    p, k = _params_for(smooth_conductor(0.0, 1.0), n)  # ior 0 => perfect mirror
    wo = _wo(n)
    u0, u1, u2 = _uniform3(n)
    wi, f, pdf, delta = sample_bsdf(p, k, wo, u0, u1, u2)
    np.testing.assert_allclose(np.asarray(wi), np.asarray(wo * jnp.asarray([-1, -1, 1.0])), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f[:, 0] * jnp.abs(wi[:, 2]) / pdf), 1.0, rtol=1e-5)
    assert np.asarray(delta).all()


def test_rough_conductor_sample_eval_agree():
    n = 8192
    p, k = _params_for(
        rough_conductor((1.657, 0.88, 0.521), (9.22, 6.27, 4.84), (1, 1, 1), alpha=0.3), n
    )
    wo = _wo(n)
    u0, u1, u2 = _uniform3(n)
    wi, f, pdf, delta = sample_bsdf(p, k, wo, u0, u1, u2)
    f_e, pdf_e, _ = eval_bsdf(p, k, wo, wi)
    valid = np.asarray(wi[:, 2]) > 1e-3  # same hemisphere
    np.testing.assert_allclose(np.asarray(f)[valid], np.asarray(f_e)[valid], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pdf)[valid], np.asarray(pdf_e)[valid], rtol=2e-3, atol=1e-5)
    assert not np.asarray(delta).any()
    # energy must not exceed 1 per channel (passivity)
    w = np.asarray(f * (jnp.abs(wi[:, 2:3]) / jnp.maximum(pdf[:, None], 1e-8)))
    assert w[valid].mean(0).max() <= 1.05


def test_rough_plastic_reciprocal_bounds():
    n = 8192
    p, k = _params_for(rough_plastic((0.4, 0.5, 0.6), 1.3, alpha=0.25), n)
    wo = _wo(n)
    u0, u1, u2 = _uniform3(n)
    wi, f, pdf, delta = sample_bsdf(p, k, wo, u0, u1, u2)
    valid = np.asarray(wi[:, 2]) > 1e-3
    w = np.asarray(f * (jnp.abs(wi[:, 2:3]) / jnp.maximum(pdf[:, None], 1e-8)))[valid]
    assert np.isfinite(w).all()
    assert w.mean(0).max() <= 1.1  # passivity within MC noise


def test_fresnel_dielectric_normal_incidence():
    """At normal incidence F = ((n1-n2)/(n1+n2))^2."""
    f = np.asarray(mf.fresnel_dielectric(jnp.asarray([1.0]), 1.0, 1.5))
    np.testing.assert_allclose(f, ((1.5 - 1.0) / (1.5 + 1.0)) ** 2, rtol=1e-5)


def test_fresnel_dielectric_tir():
    # from dense to thin medium beyond critical angle
    f = np.asarray(mf.fresnel_dielectric(jnp.asarray([0.1]), 1.5, 1.0))
    np.testing.assert_allclose(f, 1.0)


def test_fresnel_conductor_normal_incidence():
    """Conductor Fresnel at normal incidence: ((n-1)^2+k^2)/((n+1)^2+k^2)."""
    eta, k = 2.0, 3.0
    f = np.asarray(
        mf.fresnel_conductor(jnp.asarray([1.0]), jnp.asarray([[eta] * 3]), jnp.asarray([[k] * 3]))
    )
    want = ((eta - 1) ** 2 + k**2) / ((eta + 1) ** 2 + k**2)
    np.testing.assert_allclose(f, want, rtol=1e-5)


def test_ggx_d_normalization():
    """Integral of D(wh) cos(wh) over hemisphere must be 1."""
    alpha = 0.4
    n = 256
    theta = (np.arange(n) + 0.5) / n * (np.pi / 2)
    wh = jnp.asarray(
        np.stack([np.sin(theta), np.zeros(n), np.cos(theta)], -1), jnp.float32
    )
    d = np.asarray(mf.ggx_d(wh, alpha))
    integrand = d * np.cos(theta) * np.sin(theta) * 2 * np.pi
    integral = integrand.sum() * (np.pi / 2 / n)
    np.testing.assert_allclose(integral, 1.0, rtol=0.02)


def test_beckmann_d_normalization():
    alpha = 0.4
    n = 512
    theta = (np.arange(n) + 0.5) / n * (np.pi / 2)
    wh = jnp.asarray(
        np.stack([np.sin(theta), np.zeros(n), np.cos(theta)], -1), jnp.float32
    )
    d = np.asarray(mf.beckmann_d(wh, alpha))
    integrand = d * np.cos(theta) * np.sin(theta) * 2 * np.pi
    integral = integrand.sum() * (np.pi / 2 / n)
    np.testing.assert_allclose(integral, 1.0, rtol=0.02)


def test_dispatch_selects_by_kind():
    """Mixed-kind batch must produce per-kind results identical to
    single-kind batches."""
    n = 512
    t = BSDFTable()
    t.add(diffuse((0.8, 0.8, 0.8)))
    t.add(smooth_conductor(0.0, 1.0))
    kinds, params = t.pack()
    idx = jnp.asarray(np.arange(n) % 2, jnp.int32)
    p = jnp.asarray(params)[idx]
    k = jnp.asarray(kinds)[idx]
    wo = _wo(n)
    u0, u1, u2 = _uniform3(n)
    wi, f, pdf, delta = sample_bsdf(p, k, wo, u0, u1, u2)
    assert not np.asarray(delta)[::2].any()  # diffuse rows
    assert np.asarray(delta)[1::2].all()  # mirror rows
    mirror = np.asarray(wo * jnp.asarray([-1, -1, 1.0]))[1::2]
    np.testing.assert_allclose(np.asarray(wi)[1::2], mirror, atol=1e-6)
