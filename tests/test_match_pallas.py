"""Pallas fused matcher: exact parity with the XLA matcher (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax.numpy as jnp

from sfm_tpu.features.bits import pack_bits
from sfm_tpu.features.match import match_features
from sfm_tpu.features.match_pallas import match_features_pallas


def _case(rng, ns=300, nt=128):
    d0 = pack_bits(jnp.asarray(rng.integers(0, 2, (ns, 512)).astype(np.float32)))
    d1 = pack_bits(jnp.asarray(rng.integers(0, 2, (nt, 512)).astype(np.float32)))
    xy0 = jnp.asarray(rng.uniform(0, 200, (ns, 2)).astype(np.float32))
    xy1 = jnp.asarray(rng.uniform(0, 200, (nt, 2)).astype(np.float32))
    v0 = jnp.asarray(rng.uniform(0, 1, ns) < 0.9)
    v1 = jnp.asarray(rng.uniform(0, 1, nt) < 0.9)
    return d0, xy0, v0, d1, xy1, v1


def test_parity_with_xla_matcher(rng):
    d0, xy0, v0, d1, xy1, v1 = _case(rng)
    kw = dict(min_radius=1.5, max_radius=60.0, max_distance=260.0, ratio=0.9)
    ref = match_features(d0, xy0, v0, d1, xy1, v1, **kw)
    out = match_features_pallas(d0, xy0, v0, d1, xy1, v1, interpret=True,
                                **kw)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(out.idx)[m],
                                  np.asarray(ref.idx)[m])
    np.testing.assert_allclose(np.asarray(out.dist)[m],
                               np.asarray(ref.dist)[m])


def test_parity_with_window_centers(rng):
    d0, xy0, v0, d1, xy1, v1 = _case(rng, ns=257, nt=96)
    centers = jnp.asarray(rng.uniform(0, 200, (257, 2)).astype(np.float32))
    kw = dict(min_radius=0.0, max_radius=30.0, max_distance=260.0, ratio=0.85)
    ref = match_features(d0, xy0, v0, d1, xy1, v1, window_center0=centers,
                         **kw)
    out = match_features_pallas(d0, xy0, v0, d1, xy1, v1,
                                window_center0=centers, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(out.idx)[m],
                                  np.asarray(ref.idx)[m])


def test_parity_under_vmap(rng):
    """Mapping vmaps the matcher over keyframes; the in-kernel per-target
    dedup accumulator must stay per-batch-element (row offsets arrive as
    inputs, not program ids, precisely for this)."""
    import jax
    cases = [_case(rng, ns=300, nt=128) for _ in range(3)]
    batch = [jnp.stack([c[i] for c in cases]) for i in range(6)]
    kw = dict(min_radius=0.0, max_radius=80.0, max_distance=260.0,
              ratio=0.9)
    out = jax.vmap(lambda d0, xy0, v0, d1, xy1, v1: match_features_pallas(
        d0, xy0, v0, d1, xy1, v1, interpret=True, **kw))(*batch)
    for b, c in enumerate(cases):
        ref = match_features(*c, **kw)
        np.testing.assert_array_equal(np.asarray(out.mask[b]),
                                      np.asarray(ref.mask))
        m = np.asarray(ref.mask)
        np.testing.assert_array_equal(np.asarray(out.idx[b])[m],
                                      np.asarray(ref.idx)[m])


def test_dedup_tie_prefers_lowest_row(rng):
    """Two sources with identical descriptors competing for one target:
    the lower row index must win (match.py's tie rule)."""
    nt = 8
    d_t = pack_bits(jnp.asarray(
        rng.integers(0, 2, (nt, 512)).astype(np.float32)))
    # sources 2 and 5 are exact copies of target 3's descriptor
    bits = rng.integers(0, 2, (16, 512)).astype(np.float32)
    t3 = np.asarray(jnp.asarray(
        rng.integers(0, 2, (1, 512)).astype(np.float32)))
    # rebuild target 3 and the two sources from the same bits
    bits[2] = t3[0]
    bits[5] = t3[0]
    d_s = pack_bits(jnp.asarray(bits))
    d_t = d_t.at[3].set(pack_bits(jnp.asarray(t3))[0])
    xy = jnp.zeros((16, 2))
    xy_t = jnp.zeros((nt, 2))
    out = match_features_pallas(
        d_s, xy, jnp.ones(16, bool), d_t, xy_t, jnp.ones(nt, bool),
        max_distance=512.0, ratio=1.01, interpret=True)
    ref = match_features(
        d_s, xy, jnp.ones(16, bool), d_t, xy_t, jnp.ones(nt, bool),
        max_distance=512.0, ratio=1.01)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(out.idx)[m],
                                  np.asarray(ref.idx)[m])
