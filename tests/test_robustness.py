"""Robustness under degradation (VERDICT item 7): photometric noise,
motion blur, and occlusion applied to the synthetic scan, with explicit
ATE and lost-rate gates — replacing the reference's eyeball tolerance of
real-video artifacts (tissuebox.mov, main/main.cpp:39)."""

import numpy as np
import pytest

from sfm_tpu.config import SfMConfig
from sfm_tpu.engine import SfMEngine, RUNNING
from sfm_tpu.synthetic import degrade
from render import SpriteScene, strafe_trajectory, umeyama_ate
from synthetic import rodrigues_np

CFG = SfMConfig(
    max_keypoints=192, max_keyframes=8, max_landmarks=1024,
    image_height=240, image_width=320, pyramid_levels=3,
    ransac_hypotheses=64, pnp_hypotheses=32, ba_iterations=6,
    keyframe_min_tracked=15, keyframe_time_lag=6, min_init_matches=25,
    ba_huber_delta=2.0)  # robust loss (flagship setting; ref uses NULL)

K = np.array([[250., 0, 160], [0, 250., 120], [0, 0, 1]], np.float32)

N_FRAMES = 30


def _scan(degrade_kw):
    rng = np.random.default_rng(3)
    drng = np.random.default_rng(77)
    scene = SpriteScene(rng)
    rvecs, tvecs = strafe_trajectory(N_FRAMES)
    eng = SfMEngine(K, (240, 320), None, CFG)
    statuses = []
    for i in range(N_FRAMES):
        img = scene.render(K, rvecs[i], tvecs[i], 240, 320)
        img = degrade(img, drng, **degrade_kw)
        m = eng.add_frame(img)
        statuses.append(int(m["status"]))
    return eng, np.array(statuses), rvecs, tvecs


def _ate_pct(eng, rvecs, tvecs):
    kfs = eng.state.kfs
    valid = np.asarray(kfs.valid)
    if valid.sum() < 3:
        return np.inf
    fns = np.asarray(kfs.frames.frame_no)[valid]
    rv = np.asarray(kfs.frames.rvec)[valid]
    tv = np.asarray(kfs.frames.tvec)[valid]
    order = np.argsort(fns)
    est = np.stack([-rodrigues_np(rv[i]).T @ tv[i] for i in order])
    gt = np.stack([-rodrigues_np(rvecs[f]).T @ tvecs[f]
                   for f in fns[order]])
    extent = max(float(np.linalg.norm(gt[-1] - gt[0])), 1e-9)
    return 100.0 * umeyama_ate(est, gt) / extent


# bounds: measured (Huber on) noise8=12.6% blur5=4.3% occl=1.2%
# comb=4.0% on this 30-frame scan whose clean ATE is ~2.9% and chaotic
# (see test_engine); gates sit ~50-70% above measured to catch breakage,
# not seed jitter
@pytest.mark.parametrize("name,kw,max_lost,max_ate_pct", [
    ("noise", dict(noise_std=8.0), 0.10, 18.0),
    ("blur", dict(blur_len=5), 0.10, 9.0),
    ("occlusion", dict(occlusion=0.12), 0.10, 5.0),
    ("combined", dict(noise_std=5.0, blur_len=3, occlusion=0.08),
     0.15, 9.0),
])
def test_degraded_scan(name, kw, max_lost, max_ate_pct):
    eng, statuses, rvecs, tvecs = _scan(kw)
    assert eng.status == RUNNING, f"{name}: engine not RUNNING at end"
    # lost-rate gate after bootstrap
    post = statuses[3:]
    lost_rate = float((post != RUNNING).mean())
    assert lost_rate <= max_lost, f"{name}: lost rate {lost_rate:.2f}"
    ate = _ate_pct(eng, rvecs, tvecs)
    assert ate <= max_ate_pct, f"{name}: ATE {ate:.1f}% of extent"
