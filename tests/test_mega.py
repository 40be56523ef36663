"""Megakernel (integrator/mega.py) vs XLA wavefront equivalence.

The two integrators consume identical counter-based RNG draws and implement
identical semantics, so they agree everywhere except rays that land exactly
on geometric seams (wall/floor edges), where bit-level t-ties between the
intersector implementations flip the winning triangle — both choices are
valid closest hits.  Tests therefore assert exactness for emission-only
configs and tight statistical agreement once NEE samples seams.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gpuspectral_tpu.integrator.mega import mega_eligible, render_mega
from gpuspectral_tpu.integrator.path_tracer import render_image_stats
from gpuspectral_tpu.integrator import render_image_stats_auto
from gpuspectral_tpu.utils.config import RenderConfig


def _cfg(**kw):
    base = dict(width=32, height=32, ray_batch=1024)
    base.update(kw)
    return RenderConfig(**base)


def test_eligibility(cornell_scene):
    assert mega_eligible(cornell_scene, _cfg())
    assert not mega_eligible(cornell_scene, _cfg(use_bvh=True))
    assert not mega_eligible(cornell_scene, _cfg(light_sampling="power"))


def test_mega_matches_xla_emission_only(cornell_scene):
    # primary-hit emission involves no RNG and no seams along any ray: exact
    cfg = _cfg(max_depth=0, nee=False, spp=1)
    ref = np.asarray(render_image_stats(cornell_scene, cfg, jnp.uint32(0))[0])
    got = np.asarray(render_mega(cornell_scene, cfg, 0, interpret=True)[0])
    np.testing.assert_array_equal(ref, got)


def test_mega_matches_xla_one_bounce(cornell_scene):
    cfg = _cfg(max_depth=1, nee=False, spp=1)
    ref = np.asarray(render_image_stats(cornell_scene, cfg, jnp.uint32(0))[0])
    got = np.asarray(render_mega(cornell_scene, cfg, 0, interpret=True)[0])
    d = np.abs(ref - got)
    # seam-tie path flips only; everything else is bit-equal
    assert np.mean(np.max(d, -1) > 1e-4) < 0.01
    assert abs(ref.mean() - got.mean()) < 2e-3


def test_mega_matches_xla_full(cornell_scene):
    cfg = _cfg(max_depth=4, nee=True, spp=2)
    ref, rays_ref = render_image_stats(cornell_scene, cfg, jnp.uint32(0))
    got, rays_got = render_mega(cornell_scene, cfg, 0, interpret=True)
    ref, got = np.asarray(ref), np.asarray(got)
    d = np.abs(ref - got)
    assert np.mean(np.max(d, -1) > 1e-3) < 0.02
    assert abs(ref.mean() - got.mean()) < 2e-3
    assert abs(float(rays_ref) - float(rays_got)) / float(rays_ref) < 0.01


def test_mega_timestamp_advances_samples(cornell_scene):
    cfg = _cfg(max_depth=2, nee=True, spp=1)
    a = np.asarray(render_mega(cornell_scene, cfg, 0, interpret=True)[0])
    b = np.asarray(render_mega(cornell_scene, cfg, 7, interpret=True)[0])
    assert not np.array_equal(a, b)  # different sample seeds
    assert abs(a.mean() - b.mean()) < 0.02  # same expectation


def test_auto_facade_dispatch(cornell_scene):
    # forcing the megakernel off-TPU goes through interpret mode
    cfg = _cfg(max_depth=1, nee=False, spp=1, intersector="mega")
    got, _ = render_image_stats_auto(cornell_scene, cfg, 0)
    cfg_x = _cfg(max_depth=1, nee=False, spp=1)
    ref = np.asarray(render_image_stats(cornell_scene, cfg_x, jnp.uint32(0))[0])
    d = np.abs(ref - np.asarray(got))
    assert np.mean(np.max(d, -1) > 1e-4) < 0.01


def test_uniform_mod_matches_xla():
    from gpuspectral_tpu.integrator.mega import _uniform_mod

    bits = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**32, size=4096, dtype=np.uint32)
    )
    for n in (1, 2, 3, 5, 7, 12, 100, 255, 257, 1023, 40000):
        ref = (bits % jnp.uint32(n)).astype(jnp.int32)
        got = _uniform_mod(bits, n)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got)), n
