"""Loop-closure machinery unit tests (engine/loop.py) — the correction
math on a synthetic drifted chain, and end-to-end detection+correction on
a small drift-injected scan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_tpu.engine.loop import (interpolate_corrections, _rodr, _log_so3,
                                 retriangulate_landmarks)


class TestInterpolation:
    def test_endpoint_recovers_pnp_pose(self):
        rng = np.random.default_rng(0)
        rv = rng.normal(0, 0.3, (5, 3))
        tv = rng.normal(0, 1.0, (5, 3))
        # a drift correction
        d_rvec = np.array([0.02, -0.3, 0.1])
        dt = np.array([0.5, -2.0, 1.0])
        fracs = np.linspace(0, 1, 5)
        rv2, tv2 = interpolate_corrections(rv, tv, fracs, d_rvec, dt)
        # frac 0: unchanged
        np.testing.assert_allclose(rv2[0], rv[0], atol=1e-6)
        np.testing.assert_allclose(tv2[0], tv[0], atol=1e-6)
        # frac 1: x_cam = R' x_old + t' must equal R x_drift + t with
        # x_old = dR x_drift + dt
        dR = _rodr(d_rvec)
        x_d = rng.normal(0, 1, 3)
        x_old = dR @ x_d + dt
        lhs = _rodr(rv2[-1]) @ x_old + tv2[-1]
        rhs = _rodr(rv[-1]) @ x_d + tv[-1]
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_sim3_endpoint_maps_center(self):
        """With a scale component, the a=1 pose's camera center must land
        at s*dR*c + dt, and a=0 must be identity."""
        rng = np.random.default_rng(1)
        rv = rng.normal(0, 0.3, (3, 3))
        tv = rng.normal(0, 1.0, (3, 3))
        d_rvec = np.array([-0.1, 0.25, 0.05])
        dt = np.array([1.0, 0.4, -0.8])
        s = 1.37
        fracs = np.array([0.0, 0.5, 1.0])
        rv2, tv2 = interpolate_corrections(rv, tv, fracs, d_rvec, dt,
                                           scale=s)
        np.testing.assert_allclose(rv2[0], rv[0], atol=1e-6)
        np.testing.assert_allclose(tv2[0], tv[0], atol=1e-6)
        dR = _rodr(d_rvec)
        c = -_rodr(rv[2]).T @ tv[2]
        c_expected = s * (dR @ c) + dt
        c_got = -_rodr(rv2[2]).T @ tv2[2]
        np.testing.assert_allclose(c_got, c_expected, atol=1e-5)

    def test_log_exp_roundtrip(self):
        r = np.array([0.4, -0.2, 0.9])
        np.testing.assert_allclose(_log_so3(_rodr(r)), r, atol=1e-6)

    def test_log_near_pi(self):
        """The SO(3) log must stay exact at and near theta = pi (the
        standard formula's sin(th) denominator vanishes there) — a
        full-circle orbit trajectory contains ~180-degree keyframe
        rotations (ADVICE r4 medium)."""
        for axis in ([0, 0, 1.0], [1.0, 0, 0], [0.3, -0.8, 0.52]):
            k = np.asarray(axis) / np.linalg.norm(axis)
            for th in (np.pi, np.pi - 1e-5, np.pi - 1e-3, np.pi - 0.01):
                r = k * th
                R = _rodr(r)
                r2 = _log_so3(R)
                # at exactly pi, r and -r are the same rotation
                err = min(np.linalg.norm(r2 - r), np.linalg.norm(r2 + r))
                assert err < 1e-4, (axis, th, r2)
                np.testing.assert_allclose(_rodr(r2), R, atol=1e-5)

    def test_interpolation_preserves_pi_rotations_at_frac0(self):
        """frac=0 poses must come back bit-exact even when the pose
        rotation is exactly pi (no round-trip corruption)."""
        rv = np.array([[0.0, np.pi, 0.0], [np.pi * 0.9999, 0, 0]])
        tv = np.array([[1.0, 2.0, 3.0], [-1.0, 0.5, 0.25]])
        rv2, tv2 = interpolate_corrections(
            rv, tv, np.zeros(2), np.array([0.1, 0, 0]),
            np.array([0.5, 0, 0]))
        np.testing.assert_array_equal(rv2, rv)
        np.testing.assert_array_equal(tv2, tv)

    def test_masked_median_nan_free(self):
        from sfm_tpu.engine.loop import _masked_median
        vals = jnp.asarray([5.0, 1.0, 9.0, 3.0, 7.0])
        mask = jnp.asarray([True, True, False, True, True])
        # lower median of {1, 3, 5, 7} = 3
        assert float(_masked_median(vals, mask)) == 3.0
        assert float(_masked_median(vals, jnp.ones(5, bool))) == 5.0
        # empty mask: +inf sentinel (callers gate on count >= 10)
        assert not np.isfinite(float(_masked_median(
            vals, jnp.zeros(5, bool))))


class TestScaleFromPairs:
    def _drift(self, rng, n, s, noise=0.0):
        from sfm_tpu.engine.loop import _rodr
        Xo = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                       rng.uniform(4, 9, n)], 1)
        R = _rodr(np.array([0.1, -0.2, 0.05]))
        t = np.array([0.7, -0.3, 1.1])
        # x_old = s * dR x_drift + dt  ->  x_drift = dR^T (x_old - dt)/s
        Xc = (R.T @ ((Xo - t) / s).T).T
        if noise:
            Xc = Xc + rng.normal(0, noise, Xc.shape)
        return jnp.asarray(Xo.astype(np.float32)), \
            jnp.asarray(Xc.astype(np.float32))

    def test_recovers_scale(self, rng):
        from sfm_tpu.engine.loop import _scale_from_pairs
        for s_true in (0.7, 1.0, 1.6):
            Xo, Xc = self._drift(rng, 40, s_true)
            mask = jnp.ones(40, bool)
            s, ok, n = _scale_from_pairs(Xo, Xc, mask)
            assert bool(ok) and int(n) == 40
            assert abs(float(s) - s_true) < 0.02 * s_true

    def test_robust_to_outlier_pairs(self, rng):
        from sfm_tpu.engine.loop import _scale_from_pairs
        Xo, Xc = self._drift(rng, 40, 1.4, noise=0.01)
        Xc = Xc.at[::9].add(jnp.asarray(rng.normal(0, 3.0, (5, 3)),
                                        jnp.float32))   # gross outliers
        s, ok, _ = _scale_from_pairs(Xo, Xc, jnp.ones(40, bool))
        assert bool(ok)
        assert abs(float(s) - 1.4) < 0.1

    def test_gates_fail_closed(self, rng):
        from sfm_tpu.engine.loop import _scale_from_pairs
        # too few pairs -> identity
        Xo, Xc = self._drift(rng, 40, 1.5)
        few = jnp.arange(40) < 4
        s, ok, _ = _scale_from_pairs(Xo, Xc, few)
        assert not bool(ok) and float(s) == 1.0
        # incoherent correspondences -> dispersion gate -> identity
        Xc_junk = Xc[jnp.asarray(np.random.default_rng(5)
                                 .permutation(40))]
        s, ok, _ = _scale_from_pairs(Xo, Xc_junk, jnp.ones(40, bool))
        assert not bool(ok) and float(s) == 1.0


class TestSim3Correction:
    def _drifted_state(self, s_end):
        """A 6-keyframe chain with PROGRESSIVE monocular scale drift:
        stored poses/landmarks shrink toward 1/s_end of truth while the
        stored observations are what the cameras actually saw (projected
        from the TRUE scene) — the classic monocular failure the sim(3)
        correction exists for."""
        import jax.numpy as jnp
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import CameraParams, init_state
        cfg = SfMConfig(max_keypoints=32, max_keyframes=8,
                        max_landmarks=64, image_height=96, image_width=128,
                        pyramid_levels=2, ba_kmax=8)
        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]],
                     np.float32)
        cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5),
                           Kopt=jnp.asarray(K))
        rng = np.random.default_rng(2)
        nk, nl = 6, 24
        X = np.stack([rng.uniform(-2, 2, nl), rng.uniform(-1.5, 1.5, nl),
                      rng.uniform(5, 8, nl)], 1).astype(np.float32)
        c_true = np.stack([np.array([0.45 * k, 0, 0]) for k in range(nk)])
        gamma = 1.0 / np.linspace(1.0, s_end, nk)   # drifted = true*gamma
        landmark = np.full((8, 32), -1, np.int32)
        xy = np.zeros((8, 32, 2), np.float32)
        rvs = np.zeros((8, 3), np.float32)
        tvs = np.zeros((8, 3), np.float32)
        for k in range(nk):
            # stored (drifted) pose: center scaled toward the origin
            c_drift = gamma[k] * c_true[k]
            tvs[k] = -c_drift
            # stored observations: what the TRUE camera saw
            p = X - c_true[k]
            uv = (p[:, :2] / p[:, 2:]) * 100.0 + np.array([64.0, 48.0])
            xy[k, :nl] = uv
            landmark[k, :nl] = np.arange(nl)
        state = init_state(cfg)
        fr = state.kfs.frames._replace(
            landmark=jnp.asarray(landmark), xy=jnp.asarray(xy),
            rvec=jnp.asarray(rvs), tvec=jnp.asarray(tvs),
            kp_valid=jnp.asarray(np.arange(32)[None, :].repeat(8, 0) < nl),
            frame_no=jnp.arange(8, dtype=jnp.int32))
        lms = state.lms._replace(
            valid=jnp.asarray(np.arange(64) < nl),
            xyz=jnp.asarray(np.pad(X / s_end, ((0, 40), (0, 0))
                                   ).astype(np.float32)))
        state = state._replace(
            kfs=state.kfs._replace(
                frames=fr, valid=jnp.asarray(np.arange(8) < nk)),
            lms=lms, prev=jax.tree.map(lambda x: x[nk - 1], fr))
        return cfg, cam, state, c_true, nk

    def _probe(self, c_true, nk, scale):
        import jax.numpy as jnp
        from sfm_tpu.engine.loop import LoopProbe
        return LoopProbe(
            ok=jnp.asarray(True),
            rvec=jnp.zeros(3),
            tvec=jnp.asarray(-c_true[nk - 1].astype(np.float32)),
            n_inliers=jnp.asarray(30), drift=jnp.asarray(1.0),
            links=jnp.full((32,), -1, jnp.int32),
            min_lm_birth=jnp.asarray(0),
            scale=jnp.asarray(np.float32(scale)),
            scale_ok=jnp.asarray(scale != 1.0),
            n_pairs=jnp.asarray(20))

    def test_sim3_beats_se3_on_scale_drift(self):
        """With deliberate progressive scale drift, the sim(3) correction
        (true scale from the pair estimator) must land the chain on the
        ground truth where the SE(3) special case structurally cannot
        (VERDICT r4 item 6)."""
        from sfm_tpu.engine.loop import close_loop
        s_end = 1.5
        errs = {}
        for scale in (s_end, 1.0):
            cfg, cam, state, c_true, nk = self._drifted_state(s_end)
            out = close_loop(cfg, cam, state, nk - 1,
                             self._probe(c_true, nk, scale))
            rv = np.asarray(out.kfs.frames.rvec)[:nk]
            tv = np.asarray(out.kfs.frames.tvec)[:nk]
            cs = np.stack([-_rodr(rv[i]).T @ tv[i] for i in range(nk)])
            errs[scale] = float(np.abs(cs - c_true).max())
        assert errs[s_end] < 0.05, errs
        assert errs[s_end] < errs[1.0] / 3, errs
    def test_recovers_points_from_poses(self):
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import CameraParams, init_state, Frame
        cfg = SfMConfig(max_keypoints=16, max_keyframes=4, max_landmarks=32,
                        image_height=96, image_width=128, pyramid_levels=2,
                        ba_kmax=4)
        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]],
                     np.float32)
        cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5),
                           Kopt=jnp.asarray(K))
        rng = np.random.default_rng(1)
        X = np.stack([rng.uniform(-1, 1, 8), rng.uniform(-0.7, 0.7, 8),
                      rng.uniform(3, 5, 8)], 1).astype(np.float32)
        state = init_state(cfg)
        kfs = state.kfs
        landmark = np.full((4, 16), -1, np.int32)
        xy = np.zeros((4, 16, 2), np.float32)
        rvs = np.zeros((4, 3), np.float32)
        tvs = np.stack([np.array([0.3 * c, 0, 0], np.float32)
                        for c in range(4)])
        for c in range(4):
            p = X + tvs[c]
            uv = (p[:, :2] / p[:, 2:]) * 100.0 + np.array([64.0, 48.0])
            xy[c, :8] = uv
            landmark[c, :8] = np.arange(8)
        fr = kfs.frames._replace(
            landmark=jnp.asarray(landmark), xy=jnp.asarray(xy),
            rvec=jnp.asarray(rvs), tvec=jnp.asarray(tvs),
            kp_valid=jnp.asarray(np.arange(16)[None, :].repeat(4, 0) < 8),
            frame_no=jnp.arange(4, dtype=jnp.int32))
        lms = state.lms._replace(
            valid=jnp.asarray(np.arange(cfg.max_landmarks) < 8),
            xyz=jnp.asarray(np.pad(X + rng.normal(0, 0.5, X.shape),
                                   ((0, 24), (0, 0))).astype(np.float32)))
        state = state._replace(
            kfs=kfs._replace(frames=fr,
                             valid=jnp.ones(4, bool)), lms=lms)
        state2 = retriangulate_landmarks(cfg, cam, state)
        got = np.asarray(state2.lms.xyz)[:8]
        np.testing.assert_allclose(got, X, atol=1e-2)
