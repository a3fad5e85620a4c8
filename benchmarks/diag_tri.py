"""Dissect one mapping-pass triangulation on a saved longscan state:
per-pair match counts, epipolar survivors, conflict winners — find where
the new-landmark yield goes to zero (diag_longscan_map.py showed +0 new
after frame ~80 while keyframes keep arriving).

python benchmarks/diag_tri.py  (needs /tmp/longscan_state.npz)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from bench_longscan import LARGE


def main():
    import jax
    import jax.numpy as jnp
    from sfm_tpu.config import SfMConfig
    from sfm_tpu.engine.state import CameraParams
    from sfm_tpu.engine.mapping import _window_slots
    from sfm_tpu.io.checkpoint import load_state
    from sfm_tpu.features.match import match_features
    from sfm_tpu.geometry.triangulate import triangulate_pair, \
        projection_matrix
    from sfm_tpu.geometry.epipolar import fundamental_from_poses, \
        filter_matches_epipolar

    cfg = SfMConfig(**LARGE)
    K = np.array([[525.0, 0, 320.0], [0, 525.0, 240.0], [0, 0, 1]],
                 np.float32)
    cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5), Kopt=jnp.asarray(K))
    state = load_state("/tmp/longscan_state.npz", cfg)
    kfs, lms = state.kfs, state.lms
    fr = kfs.frames
    valid = np.asarray(kfs.valid)
    fns = np.asarray(fr.frame_no)
    new_slot = int(np.argmax(np.where(valid, fns, -1)))
    print(f"newest KF slot {new_slot} frame {fns[new_slot]}; "
          f"valid KFs {valid.sum()}")

    M = min(cfg.mapping_tri_keyframes + 1, cfg.max_keyframes)
    slots, slot_ok = _window_slots(cfg, kfs, new_slot, M,
                                   cfg.max_landmarks)
    slots = np.asarray(slots); slot_ok = np.asarray(slot_ok)
    print("window slots:", slots.tolist(), "frames:",
          fns[slots].tolist(), "ok:", slot_ok.tolist())

    new_f = jax.tree.map(lambda x: x[new_slot], fr)
    tgt_valid = new_f.kp_valid & (new_f.landmark < 0)
    print(f"new KF: {int(np.asarray(new_f.kp_valid).sum())} kp, "
          f"{int(np.asarray(tgt_valid).sum())} unmatched")
    P_new = cam.Kopt @ projection_matrix(new_f.rvec, new_f.tvec)

    for i in range(M):
        old_slot = int(slots[i])
        if not slot_ok[i] or old_slot == new_slot:
            continue
        old_f = jax.tree.map(lambda x: x[old_slot], fr)
        src_valid = old_f.kp_valid & (old_f.landmark < 0)
        res = match_features(
            old_f.desc, old_f.xy, src_valid,
            new_f.desc, new_f.xy, tgt_valid,
            min_radius=cfg.match_min_radius,
            max_radius=cfg.mapping_max_radius,
            max_distance=cfg.match_max_distance, ratio=cfg.match_ratio)
        uv0 = old_f.xy
        uv1 = new_f.xy[jnp.where(res.mask, res.idx, 0)]
        X = triangulate_pair(
            cam.Kopt @ projection_matrix(old_f.rvec, old_f.tvec),
            P_new, uv0, uv1)
        F = fundamental_from_poses(cam.Kopt, old_f.rvec, old_f.tvec,
                                   cam.Kopt, new_f.rvec, new_f.tvec)
        keep = filter_matches_epipolar(
            F, uv0, uv1, X, old_f.rvec, old_f.tvec, new_f.rvec,
            new_f.tvec, cfg.epipolar_max_error, valid=res.mask)
        disp = np.linalg.norm(np.asarray(uv1 - uv0), axis=1)
        disp = disp[np.asarray(res.mask)]
        print(f"pair (slot {old_slot}, frame {fns[old_slot]}): "
              f"src unmatched {int(np.asarray(src_valid).sum())}, "
              f"matches {int(np.asarray(res.mask).sum())}, "
              f"epi-keep {int(np.asarray(keep).sum())}, "
              f"disp px med {np.median(disp) if len(disp) else 0:.0f} "
              f"max {disp.max() if len(disp) else 0:.0f}")


if __name__ == "__main__":
    main()
