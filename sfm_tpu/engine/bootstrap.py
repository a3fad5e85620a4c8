"""Two-view bootstrap (CSfM::init, CSfM.cpp:802-1001).

First frame becomes keyframe 0 at the origin; later frames are matched
against it, both H and F models are fit and scored with the ORB-SLAM
symmetric-transfer scores, the winning model is decomposed (cheirality
vote), matches are triangulated and epipolar-filtered, the map is seeded
with two keyframes, and a full struct+pose BA refines the pair.  Anti-stall:
if bootstrap keeps failing, the reference frame advances
(CSfM.cpp:997-999)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SfMConfig
from ..ba import BAMode, observations_from_keyframes, run_ba
from ..geometry.epipolar import (fundamental_from_poses,
                                 filter_matches_epipolar, homography_score,
                                 fundamental_score, mean_transfer_error,
                                 mean_epipolar_error)
from ..geometry.estimation import estimate_homography
from ..geometry.twoview import (recover_pose_from_essential,
                                recover_pose_from_homography)
from ..features.match import match_features
from ..mapstore import add_landmarks, insert_keyframe, empty_keyframes
from ..ransac import ransac_fundamental
from .state import (SfMState, zero_metrics, CameraParams, RUNNING)


def bootstrap_step(cfg: SfMConfig, cam: CameraParams, state: SfMState,
                   frame) -> tuple:
    """One NOT_INITIALIZED-state step.  Returns (state, metrics)."""
    have_ref = state.frame_count > 0

    def first_frame(state):
        # first frame -> keyframe 0 at origin (CSfM.cpp:810-819)
        kfs, _ = insert_keyframe(state.kfs, frame)
        st = state._replace(prev=frame, kfs=kfs)
        m = zero_metrics()._replace(
            status=st.status, n_detected=jnp.sum(frame.kp_valid),
            n_keyframes=jnp.sum(kfs.valid).astype(jnp.int32))
        return st, m

    def try_init(state):
        key, k_f = jax.random.split(state.key)
        prev, curr = state.prev, frame
        res = match_features(
            prev.desc, prev.xy, prev.kp_valid,
            curr.desc, curr.xy, curr.kp_valid,
            min_radius=cfg.match_min_radius, max_radius=cfg.match_max_radius,
            max_distance=cfg.match_max_distance, ratio=cfg.match_ratio)
        n_matches = jnp.sum(res.mask)
        uv0 = prev.xy
        uv1 = curr.xy[jnp.where(res.mask, res.idx, 0)]
        valid = res.mask

        # H by least squares over all matches (method-0 contract,
        # CSfM.cpp:838-841); F by RANSAC (CSfM.cpp:843)
        H = estimate_homography(uv0, uv1, valid.astype(jnp.float32))
        fres = ransac_fundamental(k_f, uv0, uv1, valid,
                                  n_hypotheses=cfg.ransac_hypotheses,
                                  threshold=cfg.f_inlier_threshold)
        s_h, h_inl = homography_score(H, uv0, uv1, valid,
                                      th=cfg.h_inlier_threshold)
        s_f, f_inl = fundamental_score(fres.model, uv0, uv1, valid,
                                       th=cfg.f_inlier_threshold,
                                       th_score=cfg.h_inlier_threshold)
        r_h = s_h / jnp.maximum(s_h + s_f, 1e-6)
        use_h = r_h > cfg.hf_model_ratio

        Kopt = cam.Kopt
        E = Kopt.T @ fres.model @ Kopt

        def from_h(_):
            return recover_pose_from_homography(
                H, Kopt, Kopt, uv0, uv1, valid & h_inl,
                max_reproj_err=cfg.max_reproj_error)

        def from_f(_):
            return recover_pose_from_essential(
                E, Kopt, Kopt, uv0, uv1, valid & f_inl,
                max_reproj_err=cfg.max_reproj_error)

        rvec, tvec, X, good, n_good = jax.lax.cond(use_h, from_h, from_f, None)

        # epipolar + positive-depth filter on the triangulated set
        F_pose = fundamental_from_poses(Kopt, jnp.zeros(3), jnp.zeros(3),
                                        Kopt, rvec, tvec)
        keep = filter_matches_epipolar(
            F_pose, uv0, uv1, X, jnp.zeros(3), jnp.zeros(3), rvec, tvec,
            cfg.epipolar_max_error, valid=good)

        # the reference additionally gates the chosen model on its mean
        # transfer / epipolar error (CSfM.cpp:871, 894, vs _maxReprErr)
        mean_err = jax.lax.cond(
            use_h,
            lambda: mean_transfer_error(H, uv0, uv1, valid & h_inl),
            lambda: mean_epipolar_error(fres.model, uv0, uv1, valid & f_inl))
        enough = (n_matches >= cfg.min_init_matches) & \
                 (jnp.sum(keep) >= cfg.min_init_matches) & \
                 (mean_err < cfg.max_reproj_error)

        def success(_):
            # seed the map: landmarks from the kept matches, observed by
            # both bootstrap keyframes (CSfM.cpp:948-967)
            lms, ids = add_landmarks(
                state.lms, X, curr.desc[jnp.where(keep, res.idx, 0)],
                keep, jnp.full((keep.shape[0],), 2, jnp.int32),
                colors=curr.color[jnp.where(keep, res.idx, 0)])
            ok = ids >= 0
            # stack the reference-frame descriptors too (the reference adds
            # both views' descriptors, CSfM.cpp:955-961)
            from ..mapstore import add_descriptors
            lms = add_descriptors(lms, jnp.where(ok, ids, -1), prev.desc,
                                  colors=prev.color)
            prev_linked = prev._replace(
                landmark=jnp.where(ok, ids, -1))
            # out-of-range indices for non-kept entries are dropped
            curr_posed = curr._replace(
                rvec=rvec, tvec=tvec,
                landmark=jnp.full_like(curr.landmark, -1).at[
                    jnp.where(ok, res.idx, cfg.max_keypoints)].set(
                        ids, mode="drop"))
            # rebuild keyframe store with the (possibly advanced) reference
            kfs = empty_keyframes(cfg.max_keyframes, cfg.max_keypoints,
                                  cfg.desc_words)
            kfs, _ = insert_keyframe(kfs, prev_linked)
            kfs, _ = insert_keyframe(kfs, curr_posed)
            # pair BA, gauge-fixed on keyframe 0 (CSfM.cpp:970).  Run on
            # COMPACT axes: the pair involves exactly 2 cameras and at
            # most max_keypoints landmarks, while the dense solver
            # materializes a [C, L, 6, 3] coupling — over the full
            # capacities that is 2.4 GB at the 512-KF/64k-lm longscan
            # config (compile-time OOM) and pure waste at any config
            from ..ba.core import compact_ba_problem, scatter_back_landmarks
            kfs2 = kfs._replace(
                frames=jax.tree.map(lambda x: x[:2], kfs.frames),
                valid=kfs.valid[:2])
            obs = observations_from_keyframes(kfs2, lms.valid)
            ba_xyz, ba_lm_free, ba_obs, inv = compact_ba_problem(
                lms.xyz, lms.valid, obs, cfg.max_keypoints)
            cam_free2 = jnp.zeros(2, bool).at[1].set(True)
            rv2, tv2, xyz_c, stats = run_ba(
                Kopt, kfs2.frames.rvec, kfs2.frames.tvec, ba_xyz, ba_obs,
                cam_free=cam_free2, lm_free=ba_lm_free,
                mode=BAMode.STRUCT_AND_POSE, iterations=cfg.ba_iterations,
                lam0=cfg.ba_lambda_init, lam_up=cfg.ba_lambda_up,
                lam_down=cfg.ba_lambda_down, huber_delta=cfg.ba_huber_delta,
                tol=cfg.ba_tol)
            xyz = scatter_back_landmarks(lms.xyz, xyz_c, inv)
            kfs = kfs._replace(frames=kfs.frames._replace(
                rvec=kfs.frames.rvec.at[:2].set(rv2),
                tvec=kfs.frames.tvec.at[:2].set(tv2)))
            lms2 = lms._replace(xyz=xyz, t_alive=lms.t_alive + lms.valid,
                                kf_alive=lms.kf_alive + lms.valid)
            new_prev = curr_posed._replace(rvec=rv2[1], tvec=tv2[1])
            from ..mapstore import representative_descriptors
            st = state._replace(
                status=jnp.asarray(RUNNING, jnp.int32),
                rep_desc=representative_descriptors(lms2),
                prev=new_prev, kfs=kfs, lms=lms2, key=key,
                last_kf_frame_no=curr.frame_no,
                last_kf_tracked=jnp.sum(keep).astype(jnp.int32),
                init_fail_count=jnp.asarray(0, jnp.int32))
            m = zero_metrics()._replace(
                status=st.status, n_detected=jnp.sum(curr.kp_valid),
                n_matches=n_matches.astype(jnp.int32),
                n_inliers=jnp.sum(keep).astype(jnp.int32),
                n_tracked=jnp.sum(keep).astype(jnp.int32),
                n_landmarks=jnp.sum(lms2.valid).astype(jnp.int32),
                n_keyframes=jnp.asarray(2, jnp.int32),
                keyframe_added=jnp.asarray(True),
                rvec=rv2[1], tvec=tv2[1])
            return st, m

        def failure(_):
            # anti-stall: advance the reference frame after repeated
            # failures (CSfM.cpp:997-999)
            fails = state.init_fail_count + 1
            advance = fails > cfg.keyframe_time_lag

            def do_advance(s):
                kfs = empty_keyframes(cfg.max_keyframes, cfg.max_keypoints,
                                      cfg.desc_words)
                kfs, _ = insert_keyframe(kfs, frame)
                return s._replace(prev=frame, kfs=kfs,
                                  init_fail_count=jnp.asarray(0, jnp.int32))

            st = jax.lax.cond(advance, do_advance,
                              lambda s: s._replace(init_fail_count=fails),
                              state)
            st = st._replace(key=key)
            m = zero_metrics()._replace(
                status=st.status, n_detected=jnp.sum(curr.kp_valid),
                n_matches=n_matches.astype(jnp.int32),
                n_keyframes=jnp.sum(st.kfs.valid).astype(jnp.int32))
            return st, m

        return jax.lax.cond(enough, success, failure, None)

    return jax.lax.cond(have_ref, try_init, first_frame, state)
