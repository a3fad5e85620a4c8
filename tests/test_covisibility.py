"""Loop-closure behavior of the covisibility window (VERDICT item 6).

A strafe-out / fast-return trajectory revisits the start region while the
most RECENT keyframes sit mid-path.  With covisibility selection the
mapping pass pairs revisiting keyframes with the EARLIEST keyframes
(highest shared-landmark overlap), creating NEW landmarks observed across
the loop; a pure recency window provably cannot (it never forms those
pairs).  Discriminating signal: YOUNG landmarks (created near loop
closure, kf_alive small) linked from both an early and a late keyframe —
widen_tracks can re-link OLD landmarks but cannot create young
cross-loop ones.

keyframe_track_ratio is raised so keyframes keep inserting on the return
leg: with the reference's 0.9 policy (CSfM.cpp:494) re-entering a dense
map RAISES the tracked count and suppresses keyframes entirely — faithful
behavior, but it would leave the mapping window untested."""

import numpy as np

from sfm_tpu.config import SfMConfig
from sfm_tpu.engine import SfMEngine, RUNNING
from render import SpriteScene

K = np.array([[130., 0, 80], [0, 130., 60], [0, 0, 1]], np.float32)


def fastloop_traj(na=16, step=0.2, back=8):
    """Strafe out na frames, return to the origin in ``back`` fast steps."""
    xs = [step * t for t in range(na)]
    far = xs[-1]
    xs += [far * (1 - (t + 1) / back) for t in range(back)]
    rv = np.zeros((len(xs), 3), np.float32)
    tv = np.stack([[-x, 0.0, 0.0] for x in xs]).astype(np.float32)
    return rv, tv


def _cfg(covis: bool) -> SfMConfig:
    return SfMConfig(
        max_keypoints=128, max_keyframes=24, max_landmarks=1024,
        image_height=120, image_width=160, pyramid_levels=2,
        ransac_hypotheses=32, pnp_hypotheses=16, ba_iterations=3,
        keyframe_min_tracked=10, keyframe_time_lag=2, min_init_matches=15,
        keyframe_track_ratio=10.0,
        mapping_tri_keyframes=2, mapping_reobs_keyframes=2,
        kf_cull_redundancy=1.1,            # keep every keyframe
        mapping_use_covisibility=covis)


def _run_scan(covis: bool) -> SfMEngine:
    rng = np.random.default_rng(11)
    scene = SpriteScene(rng, n_sprites=90)
    rv, tv = fastloop_traj()
    eng = SfMEngine(K, (120, 160), None, _cfg(covis))
    for i in range(len(rv)):
        eng.add_frame(scene.render(K, rv[i], tv[i], 120, 160))
    return eng


def _cross_loop_counts(eng):
    """(all, young): landmarks linked from both an early and a late KF."""
    kfs, lms = eng.state.kfs, eng.state.lms
    valid = np.asarray(kfs.valid)
    fns = np.asarray(kfs.frames.frame_no)
    links = np.asarray(kfs.frames.landmark)
    L = np.asarray(lms.valid).shape[0]
    order = np.argsort(np.where(valid, fns, 10**6))
    nv = int(valid.sum())
    early, late = order[:2], order[nv - 2:nv]

    def seen(rows):
        m = np.zeros(L + 1, bool)
        for r in rows:
            m[np.where(links[r] >= 0, links[r], L)] = True
        m[L] = False
        return m[:L]

    both = seen(early) & seen(late) & np.asarray(lms.valid)
    young = np.asarray(lms.kf_alive) <= 3
    return int(both.sum()), int((both & young).sum())


def test_covisibility_reconnects_loop():
    eng_cov = _run_scan(covis=True)
    assert eng_cov.status == RUNNING
    all_cov, young_cov = _cross_loop_counts(eng_cov)

    eng_rec = _run_scan(covis=False)
    all_rec, young_rec = _cross_loop_counts(eng_rec)

    # covisibility re-triangulates the revisited region against the old
    # keyframes; the recency window creates zero young cross-loop points
    assert young_cov >= 10, f"covisibility made only {young_cov}"
    assert young_rec <= young_cov // 4, (young_cov, young_rec)
    assert all_cov > all_rec, (all_cov, all_rec)
