"""Known-answer tests for the geometry core (SURVEY.md §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_tpu.geometry import (
    exp_so3, log_so3, project, triangulate_pair, projection_matrix,
    estimate_homography, estimate_fundamental, fundamental_from_poses,
    epiline_distance_sq, homography_score, fundamental_score,
    recover_pose_from_essential, recover_pose_from_homography,
    undistort_pixels, distort_pixels, pnp_dlt, refine_pose,
    reprojection_errors, filter_matches_epipolar, optimal_new_camera_matrix,
)
from synthetic import random_scene, planar_scene, rodrigues_np, DEFAULT_K


class TestRotations:
    def test_exp_log_roundtrip(self, rng):
        # keep |rvec| < pi: beyond that the log map returns the canonical
        # representative, not the input
        rvecs = rng.uniform(-1.0, 1.0, (50, 3)).astype(np.float32) * 1.7
        R = exp_so3(jnp.asarray(rvecs))
        back = log_so3(R)
        np.testing.assert_allclose(np.asarray(back), rvecs, atol=2e-4)

    def test_matches_numpy_rodrigues(self, rng):
        for _ in range(10):
            rvec = rng.uniform(-1.5, 1.5, 3)
            R_ref = rodrigues_np(rvec)
            R = np.asarray(exp_so3(jnp.asarray(rvec, dtype=jnp.float32)))
            np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_identity(self):
        R = np.asarray(exp_so3(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
        rv = np.asarray(log_so3(jnp.eye(3)))
        np.testing.assert_allclose(rv, np.zeros(3), atol=1e-6)

    def test_near_pi(self, rng):
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        rvec = (axis * 3.13).astype(np.float32)
        R = exp_so3(jnp.asarray(rvec))
        back = np.asarray(log_so3(R))
        R2 = np.asarray(exp_so3(jnp.asarray(back)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


class TestProjection:
    def test_project_matches_numpy(self, rng):
        s = random_scene(rng)
        uv = project(jnp.asarray(s["K"]), jnp.asarray(s["rvec1"]),
                     jnp.asarray(s["t1"]), jnp.asarray(s["X"]))
        np.testing.assert_allclose(np.asarray(uv), s["uv1"], atol=1e-2)

    def test_distort_undistort_roundtrip(self, rng):
        K = jnp.asarray(DEFAULT_K)
        d = jnp.asarray([-0.1, 0.03, 1e-3, -5e-4, 0.0], jnp.float32)
        Kopt = jnp.asarray(
            optimal_new_camera_matrix(np.asarray(K), np.asarray(d), (480, 640)))
        uv = jnp.asarray(
            rng.uniform([100, 100], [540, 380], (200, 2)).astype(np.float32))
        und = undistort_pixels(K, d, Kopt, uv)
        back = distort_pixels(K, d, Kopt, und)
        np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-2)


class TestTriangulation:
    def test_exact_recovery(self, rng):
        s = random_scene(rng)
        K = jnp.asarray(s["K"])
        P0 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        P1 = K @ jnp.concatenate(
            [jnp.asarray(s["R1"]), jnp.asarray(s["t1"])[:, None]], axis=1)
        X = triangulate_pair(P0, P1, jnp.asarray(s["uv0"]),
                             jnp.asarray(s["uv1"]))
        np.testing.assert_allclose(np.asarray(X), s["X"], atol=5e-2)


class TestEstimation:
    def test_fundamental_exact(self, rng):
        s = random_scene(rng, n_points=100)
        w = jnp.ones(100)
        F = estimate_fundamental(jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"]), w)
        d1, d0 = epiline_distance_sq(F, jnp.asarray(s["uv0"]),
                                     jnp.asarray(s["uv1"]))
        assert float(jnp.max(d1)) < 0.5
        assert float(jnp.max(d0)) < 0.5

    def test_fundamental_matches_pose_F(self, rng):
        s = random_scene(rng, n_points=100)
        K = jnp.asarray(s["K"])
        F_pose = fundamental_from_poses(
            K, jnp.zeros(3), jnp.zeros(3), K,
            jnp.asarray(s["rvec1"]), jnp.asarray(s["t1"]))
        d1, d0 = epiline_distance_sq(F_pose, jnp.asarray(s["uv0"]),
                                     jnp.asarray(s["uv1"]))
        assert float(jnp.max(d1)) < 1e-2

    def test_homography_planar_exact(self, rng):
        s = planar_scene(rng, n_points=100)
        w = jnp.ones(100)
        H = estimate_homography(jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"]), w)
        from sfm_tpu.geometry import homography_transfer_error_sq
        ef, eb = homography_transfer_error_sq(
            H, jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"]))
        assert float(jnp.max(ef)) < 0.5

    def test_masked_estimation_ignores_outliers(self, rng):
        s = random_scene(rng, n_points=120)
        uv1 = s["uv1"].copy()
        uv1[100:] += rng.uniform(30, 60, (20, 2)).astype(np.float32)
        w = jnp.asarray(np.concatenate([np.ones(100), np.zeros(20)]),
                        jnp.float32)
        F = estimate_fundamental(jnp.asarray(s["uv0"]), jnp.asarray(uv1), w)
        d1, _ = epiline_distance_sq(F, jnp.asarray(s["uv0"][:100]),
                                    jnp.asarray(uv1[:100]))
        assert float(jnp.max(d1)) < 0.5


class TestModelSelection:
    def test_scores_prefer_right_model(self, rng):
        gen = random_scene(rng, n_points=150)
        pla = planar_scene(rng, n_points=150)
        w = jnp.ones(150, bool)
        for s, expect_h in [(gen, False), (pla, True)]:
            uv0, uv1 = jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"])
            H = estimate_homography(uv0, uv1, w)
            F = estimate_fundamental(uv0, uv1, w)
            sh, _ = homography_score(H, uv0, uv1, w)
            sf, _ = fundamental_score(F, uv0, uv1, w)
            r_h = float(sh / (sh + sf))
            if expect_h:
                assert r_h > 0.45
            # general scenes can still score H well at low parallax, so only
            # assert the planar direction strictly


class TestTwoViewRecovery:
    def test_recover_from_essential(self, rng):
        s = random_scene(rng, n_points=150)
        K = jnp.asarray(s["K"])
        uv0, uv1 = jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"])
        w = jnp.ones(150, bool)
        F = estimate_fundamental(uv0, uv1, w)
        E = K.T @ F @ K
        rvec, tvec, X, good, n = recover_pose_from_essential(
            E, K, K, uv0, uv1, w)
        assert int(n) > 140
        # direction of translation (scale-free) must match
        t_est = np.asarray(tvec)
        t_gt = s["t1"] / np.linalg.norm(s["t1"])
        cos = abs(np.dot(t_est / np.linalg.norm(t_est), t_gt))
        assert cos > 0.99
        np.testing.assert_allclose(np.asarray(rvec), s["rvec1"], atol=5e-3)

    def test_recover_from_homography(self, rng):
        s = planar_scene(rng, n_points=150)
        K = jnp.asarray(s["K"])
        uv0, uv1 = jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"])
        w = jnp.ones(150, bool)
        H = estimate_homography(uv0, uv1, w)
        rvec, tvec, X, good, n = recover_pose_from_homography(
            H, K, K, uv0, uv1, w)
        assert int(n) > 130
        t_est = np.asarray(tvec)
        t_gt = s["t1"] / np.linalg.norm(s["t1"])
        cos = abs(np.dot(t_est / np.linalg.norm(t_est), t_gt))
        assert cos > 0.98
        np.testing.assert_allclose(np.asarray(rvec), s["rvec1"], atol=2e-2)


class TestPnP:
    def test_dlt_exact(self, rng):
        s = random_scene(rng, n_points=60)
        K = jnp.asarray(s["K"])
        rvec, tvec = pnp_dlt(K, jnp.asarray(s["X"]), jnp.asarray(s["uv1"]),
                             jnp.ones(60))
        np.testing.assert_allclose(np.asarray(rvec), s["rvec1"], atol=1e-2)
        np.testing.assert_allclose(np.asarray(tvec), s["t1"], atol=5e-2)

    def test_refine_fixes_noisy_pose(self, rng):
        s = random_scene(rng, n_points=100)
        K = jnp.asarray(s["K"])
        rv0 = jnp.asarray(s["rvec1"] + rng.normal(0, 0.05, 3).astype(np.float32))
        tv0 = jnp.asarray(s["t1"] + rng.normal(0, 0.1, 3).astype(np.float32))
        rv, tv = refine_pose(K, rv0, tv0, jnp.asarray(s["X"]),
                             jnp.asarray(s["uv1"]), jnp.ones(100), iters=15)
        err = reprojection_errors(K, rv, tv, jnp.asarray(s["X"]),
                                  jnp.asarray(s["uv1"]))
        assert float(jnp.max(err)) < 0.1

    def test_masked_outliers(self, rng):
        s = random_scene(rng, n_points=80)
        K = jnp.asarray(s["K"])
        uv = s["uv1"].copy()
        uv[60:] += 50.0
        w = jnp.asarray(np.concatenate([np.ones(60), np.zeros(20)]),
                        jnp.float32)
        rvec, tvec = pnp_dlt(K, jnp.asarray(s["X"]), jnp.asarray(uv), w)
        rv, tv = refine_pose(K, rvec, tvec, jnp.asarray(s["X"]),
                             jnp.asarray(uv), w, iters=10)
        np.testing.assert_allclose(np.asarray(rv), s["rvec1"], atol=1e-2)


class TestEpipolarFilter:
    def test_filter_keeps_inliers_removes_behind(self, rng):
        s = random_scene(rng, n_points=100)
        K = jnp.asarray(s["K"])
        F = fundamental_from_poses(K, jnp.zeros(3), jnp.zeros(3), K,
                                   jnp.asarray(s["rvec1"]), jnp.asarray(s["t1"]))
        X = s["X"].copy()
        X[:10, 2] *= -1.0  # move behind camera
        keep = filter_matches_epipolar(
            F, jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"]), jnp.asarray(X),
            jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(s["rvec1"]), jnp.asarray(s["t1"]), 7.0,
            valid=jnp.ones(100, bool))
        keep = np.asarray(keep)
        assert not keep[:10].any()
        assert keep[10:].all()
