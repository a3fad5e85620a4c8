"""Frame/map query helper tests (the CFrame/CMap query-surface parity)."""

import numpy as np
import jax.numpy as jnp

from sfm_tpu.mapstore import empty_frame, empty_keyframes, insert_keyframe
from sfm_tpu.frame_queries import (
    matched_mask, unmatched_mask, matched_points, unmatched_points,
    points_at, descriptors_at, nearest_point_index,
    landmarks_in_keyframe, landmarks_in_keyframes)

N, W = 16, 16


def mk_frame(rng):
    f = empty_frame(N, W)
    links = jnp.full((N,), -1, jnp.int32).at[2].set(5).at[4].set(7)
    return f._replace(
        xy=jnp.asarray(rng.uniform(0, 100, (N, 2)).astype(np.float32)),
        xy_dist=jnp.asarray(rng.uniform(0, 100, (N, 2)).astype(np.float32)),
        kp_valid=jnp.asarray(np.arange(N) < 10),
        landmark=links,
        frame_no=jnp.asarray(0, jnp.int32))


class TestFrameQueries:
    def test_masks(self, rng):
        f = mk_frame(rng)
        m = np.asarray(matched_mask(f))
        u = np.asarray(unmatched_mask(f))
        assert m[2] and m[4] and m.sum() == 2
        assert not u[2] and u[0] and u.sum() == 8
        assert not (m & u).any()

    def test_matched_unmatched_points(self, rng):
        f = mk_frame(rng)
        xy, ids, mask = matched_points(f)
        assert int(ids[2]) == 5 and int(ids[0]) == -1
        xy2, umask = unmatched_points(f)
        assert bool(umask[0]) and not bool(umask[2])

    def test_gathers(self, rng):
        f = mk_frame(rng)
        idx = jnp.asarray([3, 1, 2])
        np.testing.assert_allclose(np.asarray(points_at(f, idx)),
                                   np.asarray(f.xy)[[3, 1, 2]])
        np.testing.assert_array_equal(np.asarray(descriptors_at(f, idx)),
                                      np.asarray(f.desc)[[3, 1, 2]])

    def test_nearest_point(self, rng):
        f = mk_frame(rng)
        q = f.xy_dist[3] + 0.3
        assert int(nearest_point_index(f, q, max_dist=1.0)) == 3
        far = jnp.asarray([1e5, 1e5], jnp.float32)
        assert int(nearest_point_index(f, far, max_dist=1.0)) == -1


class TestMapQueries:
    def test_in_keyframe_and_union(self, rng):
        kfs = empty_keyframes(4, N, W)
        kfs, s0 = insert_keyframe(kfs, mk_frame(rng))
        f2 = mk_frame(rng)._replace(
            landmark=jnp.full((N,), -1, jnp.int32).at[1].set(9))
        kfs, s1 = insert_keyframe(kfs, f2)
        a = np.asarray(landmarks_in_keyframe(kfs, s0, 16))
        assert a[5] and a[7] and a.sum() == 2
        u = np.asarray(landmarks_in_keyframes(kfs, 16))
        assert u[5] and u[7] and u[9] and u.sum() == 3
