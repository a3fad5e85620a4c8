"""Pyramidal LK flow tests: recovers known translations (including
subpixel and multi-pixel via the pyramid), flags divergence, associates
endpoints to detections with the 1 px gate."""

import numpy as np
import jax.numpy as jnp

from sfm_tpu.features.flow import lk_flow, associate_flow_to_features


def texture(rng, h=120, w=160):
    img = rng.normal(0, 1, (h // 4, w // 4))
    img = img.repeat(4, 0).repeat(4, 1)
    # smooth a little for differentiability
    k = np.ones((3, 3)) / 9.0
    from numpy.lib.stride_tricks import sliding_window_view
    pad = np.pad(img, 1, mode="edge")
    img = (sliding_window_view(pad, (3, 3)) * k).sum((-1, -2))
    return (img * 40 + 128).astype(np.float32)


class TestLK:
    def test_recovers_integer_shift(self, rng):
        img0 = texture(rng)
        shift = 6
        img1 = np.roll(img0, (shift, shift), axis=(0, 1))
        pts = rng.uniform([30, 30], [130, 90], (40, 2)).astype(np.float32)
        res = lk_flow(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts),
                      jnp.ones(40, bool))
        v = np.asarray(res.valid)
        assert v.mean() > 0.8
        disp = np.asarray(res.xy)[v] - pts[v]
        np.testing.assert_allclose(np.median(disp, 0), [shift, shift],
                                   atol=0.3)

    def test_recovers_subpixel_shift(self, rng):
        img0 = texture(rng)
        # subpixel shift via linear interp
        a = 0.4
        img1 = (1 - a) * img0 + a * np.roll(img0, 1, axis=1)
        pts = rng.uniform([30, 30], [130, 90], (30, 2)).astype(np.float32)
        res = lk_flow(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts),
                      jnp.ones(30, bool))
        v = np.asarray(res.valid)
        disp = np.asarray(res.xy)[v] - pts[v]
        np.testing.assert_allclose(np.median(disp, 0), [a, 0.0], atol=0.2)

    def test_flat_region_invalid(self, rng):
        img0 = np.full((120, 160), 100.0, np.float32)
        img1 = img0.copy()
        pts = np.array([[60.0, 60.0], [80.0, 50.0]], np.float32)
        res = lk_flow(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts),
                      jnp.ones(2, bool))
        assert not np.asarray(res.valid).any()  # structure matrix singular


class TestAssociation:
    def test_gate_and_dedup(self):
        flow_xy = jnp.asarray([[10.0, 10.0], [10.4, 10.0], [50.0, 50.0]])
        feat_xy = jnp.asarray([[10.2, 10.0], [53.0, 50.0]])
        idx, ok = associate_flow_to_features(
            flow_xy, jnp.ones(3, bool), feat_xy, jnp.ones(2, bool),
            max_dist=1.0)
        idx = np.asarray(idx); ok = np.asarray(ok)
        # both flow 0 and 1 gate to feature 0; the closer one (0: 0.2 vs
        # 1: 0.2) — tie broken to the lower source index
        assert ok.sum() == 1
        assert idx[0] == 0 or idx[1] == 0
        assert not ok[2]  # 3 px away > 1 px gate


class TestFlowAssistedTracking:
    """Engine integration: cfg.track_with_flow wires LK into tracking
    (the reference's disabled alternative path, CSfM.cpp:824)."""

    def test_scan_with_flow_stays_running(self):
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine import SfMEngine, RUNNING
        from render import SpriteScene, strafe_trajectory

        cfg = SfMConfig(
            max_keypoints=192, max_keyframes=8, max_landmarks=1024,
            image_height=240, image_width=320, pyramid_levels=3,
            ransac_hypotheses=64, pnp_hypotheses=32, ba_iterations=6,
            keyframe_min_tracked=15, keyframe_time_lag=6,
            min_init_matches=25, track_with_flow=True)
        K = np.array([[250., 0, 160], [0, 250., 120], [0, 0, 1]], np.float32)
        rng = np.random.default_rng(3)
        scene = SpriteScene(rng)
        rvecs, tvecs = strafe_trajectory(14)
        eng = SfMEngine(K, (240, 320), None, cfg)
        metrics = [eng.add_frame(scene.render(K, rvecs[i], tvecs[i], 240, 320))
                   for i in range(14)]
        assert eng.status == RUNNING
        assert int(metrics[-1]["n_tracked"]) >= 15
        # prev_image tracks the reference frame (step.py invariant)
        assert np.asarray(eng.state.prev_image).shape == (240, 320)
        assert np.asarray(eng.state.prev_image).std() > 1.0
