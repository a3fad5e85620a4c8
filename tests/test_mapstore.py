"""Map-invariant tests (SURVEY.md §4.2): the landmark/keyframe SoA under
random add/cull/remove sequences must preserve the invariants implicit in
CMap.cpp:36-78, 406-474, 483-541 — id stability, link/observation symmetry,
view-counter consistency — here enforced by construction and checked."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.mapstore import (
    Frame, empty_frame, empty_keyframes, empty_landmarks,
    allocate_slots, add_landmarks, add_descriptors, add_views,
    representative_descriptors, increment_age, kf_view_counts,
    cull_landmarks, clear_links, insert_keyframe, remove_keyframe,
    cull_keyframes,
)
from sfm_tpu.features.bits import pack_bits

L, N, K, W = 128, 32, 8, 16


def rand_desc(rng, m):
    return pack_bits(jnp.asarray(rng.integers(0, 2, (m, 512)).astype(np.float32)))


class TestAllocator:
    def test_allocates_distinct_free_slots(self, rng):
        free = jnp.asarray(np.array([1, 0, 1, 0, 1, 1, 0, 1], bool))
        want = jnp.asarray(np.array([1, 1, 1, 0, 1], bool))
        slots = np.asarray(allocate_slots(free, want))
        assert slots[3] == -1
        got = slots[[0, 1, 2, 4]]
        assert len(set(got.tolist())) == 4
        assert set(got.tolist()) <= {0, 2, 4, 5, 7}

    def test_overflow_returns_minus_one(self):
        free = jnp.asarray(np.array([1, 1, 0, 0], bool))
        want = jnp.ones(4, bool)
        slots = np.asarray(allocate_slots(free, want))
        assert (slots >= 0).sum() == 2
        assert (slots == -1).sum() == 2


class TestLandmarks:
    def test_add_and_gather(self, rng):
        lms = empty_landmarks(L, 512)
        xyz = jnp.asarray(rng.normal(0, 1, (10, 3)).astype(np.float32))
        desc = rand_desc(rng, 10)
        lms, ids = add_landmarks(lms, xyz, desc, jnp.ones(10, bool),
                                 jnp.full(10, 2, jnp.int32))
        ids = np.asarray(ids)
        assert (ids >= 0).all()
        np.testing.assert_allclose(np.asarray(lms.xyz)[ids], np.asarray(xyz))
        assert int(jnp.sum(lms.valid)) == 10
        assert (np.asarray(lms.n_views)[ids] == 2).all()

    def test_id_stability_across_cull(self, rng):
        lms = empty_landmarks(L, 512)
        xyz = jnp.asarray(rng.normal(0, 1, (20, 3)).astype(np.float32))
        lms, ids = add_landmarks(lms, xyz, rand_desc(rng, 20),
                                 jnp.ones(20, bool), jnp.ones(20, jnp.int32))
        # cull half by forcing low kf view counts for even slots
        kf_views = jnp.asarray((np.arange(L) % 2) * 10)
        lms = increment_age(lms, 5, 5)  # make them "old"
        lms2, tomb = cull_landmarks(lms, kf_views)
        surv = np.asarray(lms2.valid)
        # surviving landmarks keep their position (id = slot index)
        for i in np.where(surv)[0]:
            np.testing.assert_allclose(np.asarray(lms2.xyz)[i],
                                       np.asarray(lms.xyz)[i])

    def test_slot_reuse_after_cull(self, rng):
        lms = empty_landmarks(16, 512)
        lms, ids1 = add_landmarks(
            lms, jnp.zeros((16, 3)), rand_desc(rng, 16), jnp.ones(16, bool),
            jnp.ones(16, jnp.int32))
        lms = increment_age(lms, 5, 5)
        lms, tomb = cull_landmarks(lms, jnp.zeros(16, jnp.int32))  # culls all
        assert int(jnp.sum(lms.valid)) == 0
        lms, ids2 = add_landmarks(
            lms, jnp.ones((4, 3)), rand_desc(rng, 4), jnp.ones(4, bool),
            jnp.ones(4, jnp.int32))
        assert (np.asarray(ids2) >= 0).all()

    def test_majority_descriptor(self, rng):
        lms = empty_landmarks(L, 512)
        base = rng.integers(0, 2, 512).astype(np.float32)
        d0 = pack_bits(jnp.asarray(base[None]))
        lms, ids = add_landmarks(lms, jnp.zeros((1, 3)), d0,
                                 jnp.ones(1, bool), jnp.ones(1, jnp.int32))
        # two noisy observations flipping different bits
        n1 = base.copy(); n1[:20] = 1 - n1[:20]
        n2 = base.copy(); n2[20:40] = 1 - n2[20:40]
        for nd in (n1, n2):
            lms = add_descriptors(lms, ids, pack_bits(jnp.asarray(nd[None])))
        rep = representative_descriptors(lms)
        from sfm_tpu.features.bits import unpack_bits
        rep_bits = np.asarray(unpack_bits(rep[np.asarray(ids)[0]][None]))[0]
        # majority of 3 observations recovers the base descriptor
        np.testing.assert_array_equal(rep_bits, base)

    def test_view_counter(self, rng):
        lms = empty_landmarks(L, 512)
        lms, ids = add_landmarks(lms, jnp.zeros((5, 3)), rand_desc(rng, 5),
                                 jnp.ones(5, bool), jnp.ones(5, jnp.int32))
        lms = add_views(lms, ids)
        lms = add_views(lms, jnp.asarray([-1, -1, -1, -1, -1], jnp.int32))
        assert (np.asarray(lms.n_views)[np.asarray(ids)] == 2).all()

    def test_cull_policy_young_ratio(self, rng):
        lms = empty_landmarks(8, 512)
        lms, ids = add_landmarks(lms, jnp.zeros((8, 3)), rand_desc(rng, 8),
                                 jnp.ones(8, bool), jnp.ones(8, jnp.int32))
        # young (kf_alive=2), alive 10 frames, but only 1 view -> ratio 0.1
        lms = increment_age(lms, 10, 2)
        kf_views = jnp.full(8, 5, jnp.int32)  # plenty of KFs see them
        lms2, tomb = cull_landmarks(lms, kf_views)
        assert bool(jnp.all(tomb[np.asarray(ids)]))  # ratio < 0.25 -> culled


class TestKeyframes:
    def _frame(self, rng, frame_no, links=None):
        f = empty_frame(N, W)
        links = jnp.full((N,), -1, jnp.int32) if links is None else links
        return f._replace(
            xy=jnp.asarray(rng.uniform(0, 100, (N, 2)).astype(np.float32)),
            kp_valid=jnp.ones(N, bool),
            landmark=links,
            frame_no=jnp.asarray(frame_no, jnp.int32))

    def test_insert_and_remove(self, rng):
        kfs = empty_keyframes(K, N, W)
        f = self._frame(rng, 0)
        kfs, slot = insert_keyframe(kfs, f)
        assert int(slot) == 0
        assert bool(kfs.valid[0])
        np.testing.assert_allclose(np.asarray(kfs.frames.xy)[0],
                                   np.asarray(f.xy))
        kfs = remove_keyframe(kfs, slot)
        assert not bool(kfs.valid[0])

    def test_insert_overflow(self, rng):
        kfs = empty_keyframes(2, N, W)
        for i in range(2):
            kfs, slot = insert_keyframe(kfs, self._frame(rng, i))
            assert int(slot) >= 0
        kfs, slot = insert_keyframe(kfs, self._frame(rng, 9))
        assert int(slot) == -1

    def test_view_counts_from_links(self, rng):
        kfs = empty_keyframes(K, N, W)
        links0 = jnp.full((N,), -1, jnp.int32).at[0].set(5).at[1].set(7)
        links1 = jnp.full((N,), -1, jnp.int32).at[3].set(5)
        kfs, _ = insert_keyframe(kfs, self._frame(rng, 0, links0))
        kfs, _ = insert_keyframe(kfs, self._frame(rng, 1, links1))
        counts = np.asarray(kf_view_counts(kfs, 16))
        assert counts[5] == 2 and counts[7] == 1 and counts[0] == 0

    def test_removed_keyframe_drops_observations(self, rng):
        kfs = empty_keyframes(K, N, W)
        links = jnp.full((N,), -1, jnp.int32).at[0].set(3)
        kfs, s0 = insert_keyframe(kfs, self._frame(rng, 0, links))
        kfs, s1 = insert_keyframe(kfs, self._frame(rng, 1, links))
        kfs = remove_keyframe(kfs, s0)
        counts = np.asarray(kf_view_counts(kfs, 16))
        assert counts[3] == 1

    def test_clear_links(self):
        links = jnp.asarray([3, -1, 5, 7], jnp.int32)
        tomb = jnp.zeros(16, bool).at[5].set(True)
        out = np.asarray(clear_links(links, tomb))
        np.testing.assert_array_equal(out, [3, -1, -1, 7])

    def test_cull_redundant_keyframes(self, rng):
        # 5 keyframes all seeing the same 20 landmarks -> later ones
        # redundant (each point seen by 4 others > min_others=3)
        kfs = empty_keyframes(K, N, W)
        links = jnp.full((N,), -1, jnp.int32)
        links = links.at[jnp.arange(20)].set(jnp.arange(20))
        for i in range(5):
            kfs, _ = insert_keyframe(kfs, self._frame(rng, i, links))
        kfs2, culled = cull_keyframes(kfs, 32, keep_first=2)
        v = np.asarray(kfs2.valid)
        # scan culls greedily until redundancy drops: keeps the protected 2
        # plus enough others that each point retains > 3 viewers
        assert v[:2].all()
        assert v.sum() == 4  # culling stops once seen_others drops to 3
