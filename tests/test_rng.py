"""RNG unit tests: reproducibility, reference-hash parity, distribution."""

import numpy as np
import jax.numpy as jnp

from gpuspectral_tpu.ops import rng


def _pcg_hash_ref(v):
    """Literal uint32 model of pcgHash (pt_common.glsl:95-100)."""
    v = np.uint64(v) & np.uint64(0xFFFFFFFF)
    state = (v * np.uint64(747796405) + np.uint64(2891336453)) & np.uint64(0xFFFFFFFF)
    shift = ((state >> np.uint64(28)) + np.uint64(4)) & np.uint64(0xFFFFFFFF)
    word = (((state >> shift) ^ state) * np.uint64(277803737)) & np.uint64(0xFFFFFFFF)
    return np.uint32((word >> np.uint64(22)) ^ word)


def _tea_ref(v0, v1):
    """Literal uint32 model of tea (pt_common.glsl:106-120)."""
    v0, v1, s0 = np.uint64(v0), np.uint64(v1), np.uint64(0)
    M = np.uint64(0xFFFFFFFF)
    for _ in range(4):
        s0 = (s0 + np.uint64(0x9E3779B9)) & M
        v0 = (v0 + ((((v1 << np.uint64(4)) + np.uint64(0xA341316C)) & M) ^ ((v1 + s0) & M) ^ (((v1 >> np.uint64(5)) + np.uint64(0xC8013EA4)) & M))) & M
        v1 = (v1 + ((((v0 << np.uint64(4)) + np.uint64(0xAD90777D)) & M) ^ ((v0 + s0) & M) ^ (((v0 >> np.uint64(5)) + np.uint64(0x7E95761E)) & M))) & M
    return np.uint32(v0)


def test_pcg_hash_matches_reference_model():
    vals = np.array([0, 1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF], np.uint32)
    got = np.asarray(rng.pcg_hash(jnp.asarray(vals)))
    want = np.array([_pcg_hash_ref(v) for v in vals], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_tea_matches_reference_model():
    pairs = [(0, 0), (1, 0), (123, 456), (0xFFFFFFFF, 7)]
    got = np.asarray(rng.tea(jnp.asarray([p[0] for p in pairs], jnp.uint32),
                             jnp.asarray([p[1] for p in pairs], jnp.uint32)))
    want = np.array([_tea_ref(*p) for p in pairs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_uniform_range_and_determinism():
    seeds = rng.pixel_seed(jnp.arange(4096, dtype=jnp.uint32), 7)
    u = np.asarray(rng.uniform(seeds, 3, 1))
    assert u.min() >= 0.0 and u.max() <= 1.0
    u2 = np.asarray(rng.uniform(seeds, 3, 1))
    np.testing.assert_array_equal(u, u2)
    # different channel/bounce decorrelates
    u3 = np.asarray(rng.uniform(seeds, 3, 2))
    assert np.abs(np.corrcoef(u, u3)[0, 1]) < 0.05


def test_uniform_moments():
    seeds = rng.pixel_seed(jnp.arange(1 << 16, dtype=jnp.uint32), 0)
    u = np.asarray(rng.uniform(seeds, 0, 0))
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(u.var() - 1.0 / 12.0) < 5e-3


def test_distinct_pixels_distinct_streams():
    seeds = np.asarray(rng.pixel_seed(jnp.arange(10000, dtype=jnp.uint32), 0))
    assert len(np.unique(seeds)) == 10000
