"""RANSAC robustness tests: estimators must recover ground truth through
heavy outlier contamination (the property OpenCV's solvers provide to the
reference at CSfM.cpp:842-843, 552-560)."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.ransac import (ransac_fundamental, ransac_homography,
                            ransac_pnp, sample_masked)
from sfm_tpu.geometry import epiline_distance_sq
from synthetic import random_scene, planar_scene


def contaminate(rng, uv, frac):
    uv = uv.copy()
    n = uv.shape[0]
    n_out = int(n * frac)
    idx = rng.choice(n, n_out, replace=False)
    uv[idx] = rng.uniform([0, 0], [640, 480], (n_out, 2)).astype(np.float32)
    return uv, idx


class TestSampling:
    def test_samples_only_valid(self, rng):
        valid = jnp.asarray(np.arange(64) < 20)
        idx = sample_masked(jax.random.PRNGKey(0), valid, 32, 8)
        assert int(jnp.max(idx)) < 20
        # no repeats within a hypothesis
        idxs = np.asarray(idx)
        for row in idxs:
            assert len(set(row.tolist())) == 8


class TestRansacF:
    def test_recovers_through_outliers(self, rng):
        s = random_scene(rng, n_points=200)
        uv1, out_idx = contaminate(rng, s["uv1"], 0.3)
        valid = jnp.ones(200, bool)
        res = ransac_fundamental(jax.random.PRNGKey(1), jnp.asarray(s["uv0"]),
                                 jnp.asarray(uv1), valid, n_hypotheses=256)
        inl = np.asarray(res.inliers)
        # F constrains only the epipolar direction, so a random outlier can
        # land in the line band by chance — allow a few accidental inliers
        assert inl[out_idx].sum() <= 3
        clean = np.setdiff1d(np.arange(200), out_idx)
        assert inl[clean].mean() > 0.9


class TestRansacH:
    def test_recovers_through_outliers(self, rng):
        s = planar_scene(rng, n_points=200)
        uv1, out_idx = contaminate(rng, s["uv1"], 0.3)
        valid = jnp.ones(200, bool)
        res = ransac_homography(jax.random.PRNGKey(2), jnp.asarray(s["uv0"]),
                                jnp.asarray(uv1), valid, n_hypotheses=256)
        inl = np.asarray(res.inliers)
        assert not inl[out_idx].any()
        clean = np.setdiff1d(np.arange(200), out_idx)
        assert inl[clean].mean() > 0.9


class TestRansacPnP:
    def test_recovers_through_outliers(self, rng):
        s = random_scene(rng, n_points=150)
        uv, out_idx = contaminate(rng, s["uv1"], 0.35)
        res = ransac_pnp(jax.random.PRNGKey(3), jnp.asarray(s["K"]),
                         jnp.asarray(s["X"]), jnp.asarray(uv),
                         jnp.ones(150, bool), n_hypotheses=128)
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.rvec), s["rvec1"], atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.tvec), s["t1"], atol=2e-2)
        inl = np.asarray(res.inliers)
        assert not inl[out_idx].any()

    def test_prior_pose_rescues_degenerate_sampling(self, rng):
        # with very few hypotheses and heavy contamination, the prior pose
        # hypothesis (tracking's previous pose) still wins
        s = random_scene(rng, n_points=100)
        uv, out_idx = contaminate(rng, s["uv1"], 0.5)
        prior_rv = jnp.asarray(s["rvec1"] + 0.01)
        prior_tv = jnp.asarray(s["t1"] + 0.01)
        res = ransac_pnp(jax.random.PRNGKey(4), jnp.asarray(s["K"]),
                         jnp.asarray(s["X"]), jnp.asarray(uv),
                         jnp.ones(100, bool), n_hypotheses=2,
                         prior_rvec=prior_rv, prior_tvec=prior_tv)
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.rvec), s["rvec1"], atol=1e-2)

    def test_too_few_points_not_ok(self, rng):
        s = random_scene(rng, n_points=50)
        valid = jnp.asarray(np.arange(50) < 3)  # only 3 valid points
        res = ransac_pnp(jax.random.PRNGKey(5), jnp.asarray(s["K"]),
                         jnp.asarray(s["X"]), jnp.asarray(s["uv1"]),
                         valid, n_hypotheses=16)
        assert int(res.n_inliers) <= 3
        assert not bool(res.ok)


class TestP3P:
    def test_candidates_contain_true_pose(self, rng):
        from sfm_tpu.geometry.pnp import p3p
        s = random_scene(rng, n_points=3)
        rvs, tvs, ok = p3p(jnp.asarray(s["K"]), jnp.asarray(s["X"]),
                           jnp.asarray(s["uv1"]))
        rvs, tvs, ok = np.asarray(rvs), np.asarray(tvs), np.asarray(ok)
        errs = [np.linalg.norm(rvs[i] - s["rvec1"]) +
                np.linalg.norm(tvs[i] - s["t1"])
                for i in range(4) if ok[i]]
        assert errs and min(errs) < 1e-2

    def test_ransac_p3p_survives_heavy_contamination(self, rng):
        # 60% outliers: 3-pt samples hit all-inlier with p=0.4^3=6.4%,
        # 6-pt DLT with 0.4^6=0.4% — p3p recovers where dlt needs a much
        # larger batch
        s = random_scene(rng, n_points=150)
        uv, out_idx = contaminate(rng, s["uv1"], 0.6)
        res = ransac_pnp(jax.random.PRNGKey(7), jnp.asarray(s["K"]),
                         jnp.asarray(s["X"]), jnp.asarray(uv),
                         jnp.ones(150, bool), n_hypotheses=64, solver="p3p")
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.rvec), s["rvec1"],
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.tvec), s["t1"], atol=2e-2)
        # a random outlier can land inside the 7 px gate by chance
        inl = np.asarray(res.inliers)
        assert inl[out_idx].sum() <= 3
        clean = np.setdiff1d(np.arange(150), out_idx)
        assert inl[clean].mean() > 0.9
