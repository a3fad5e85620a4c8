"""Accuracy on imagery the engine's training renderer did not draw
(VERDICT r3 task 4).

``sfm_tpu/raytrace.py`` is an independent ray-casting renderer (true 3D
occluded surfaces, procedural world-space textures, whole-frame lens
distortion via per-pixel model inversion, sensor noise + exposure wobble)
sharing zero code with ``synthetic.py``'s sprite renderer.  The engine
must track an orbital arc over that scene and recover the trajectory —
the CI-sized stand-in for the reference's real-video acceptance workload
(tissuebox.mov, /root/reference/main/main.cpp:39); the flagship-scale run
is benchmarks/bench_independent_accuracy.py.
"""

import numpy as np
import pytest

from sfm_tpu.config import SfMConfig
from sfm_tpu.engine import SfMEngine, RUNNING
from sfm_tpu.raytrace import RayScene, orbit_arc_trajectory, sim3_ate, _rot


CFG = SfMConfig(
    max_keypoints=192, max_keyframes=8, max_landmarks=1024,
    image_height=240, image_width=320, pyramid_levels=3,
    ransac_hypotheses=64, pnp_hypotheses=32, ba_iterations=6,
    keyframe_min_tracked=15, keyframe_time_lag=6, min_init_matches=25)

K = np.array([[250.0, 0, 160.0], [0, 250.0, 120.0], [0, 0, 1]], np.float32)
DIST = [-0.18, 0.05, 0.0008, -0.0006, 0.0]


def test_engine_tracks_raytraced_distorted_scene():
    scene = RayScene(seed=5)
    n = 28
    rvecs, tvecs = orbit_arc_trajectory(n, radius=5.0, arc=0.55)
    eng = SfMEngine(K, (240, 320), DIST, CFG)
    for i in range(n):
        img = scene.render(K, rvecs[i], tvecs[i], 240, 320, d=DIST,
                           noise_std=2.0, frame_no=i)
        m = eng.add_frame(img)
    assert eng.status == RUNNING
    assert int(m["n_landmarks"]) > 40
    traj = eng.get_trajectory()
    kfs = eng.state.kfs
    valid = np.asarray(kfs.valid)
    fns = np.sort(np.asarray(kfs.frames.frame_no)[valid])
    est_c = np.stack([-_rot(traj[i, :3]).T @ traj[i, 3:]
                      for i in range(len(traj))])
    gt_c = np.stack([-_rot(rvecs[f]).T @ tvecs[f] for f in fns])
    ate = sim3_ate(est_c, gt_c)
    extent = np.linalg.norm(gt_c[-1] - gt_c[0])
    assert extent > 1.0            # the arc actually moved
    assert ate < 0.08 * extent, f"ATE {ate:.3f} vs extent {extent:.3f}"
