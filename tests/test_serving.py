"""Streaming scan service test: client streams a synthetic scan over
localhost TCP, tracks, and pulls the colored point cloud."""

import numpy as np

from sfm_tpu.serving import ScanServer, ScanClient
from sfm_tpu.synthetic import SpriteScene, strafe_trajectory


def test_stream_scan_end_to_end(rng):
    K = np.array([[250.0, 0, 160], [0, 250.0, 120], [0, 0, 1]], np.float32)
    scene = SpriteScene(np.random.default_rng(3))
    rvecs, tvecs = strafe_trajectory(12, step=0.06, yaw_rate=0.001)
    with ScanServer() as srv:
        cli = ScanClient("127.0.0.1", srv.port)
        ready = cli.init(240, 320, 250.0, 250.0, 160.0, 120.0,
                         config=dict(max_keypoints=192, max_keyframes=8,
                                     max_landmarks=1024, pyramid_levels=3,
                                     ransac_hypotheses=64,
                                     pnp_hypotheses=32, ba_iterations=6,
                                     keyframe_min_tracked=15,
                                     keyframe_time_lag=6,
                                     min_init_matches=25))
        assert ready["ready"]
        last = None
        for i in range(12):
            frame = scene.render(K, rvecs[i], tvecs[i], 240, 320)
            last = cli.add_frame(frame)
        assert last["status"] == 1
        assert last["n_landmarks"] > 30
        xyz, rgb = cli.get_cloud()
        assert len(xyz) == last["n_landmarks"]
        assert rgb.shape == (len(xyz), 3)
        cli.close()
