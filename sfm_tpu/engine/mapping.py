"""Keyframe-rate mapping (CSfM::mapping, CSfM.cpp:109-308) — the throughput
path, run synchronously after keyframe insertion like the reference (which
collapsed ORB-SLAM's mapping thread into addFrame, CSfM.cpp:77-79).

Phases, mirroring §3.4 of SURVEY.md:
 1. new-point triangulation: the new keyframe against every older keyframe
    (the covisibility graph is "all keyframes" in the reference,
    CSfM.cpp:123-126) — a lax.fori_loop carrying the stores, preserving the
    reference's serial leftover-matching semantics;
 2. re-observation: project unlinked landmarks into every keyframe and
    match with a reprojection-guided window (generalizes CSfM.cpp:190-221);
 3. landmark culling (CMap policy) + link clearing;
 4. keyframe culling (CSfM.cpp:708-752);
 5. full-map bundle adjustment, gauge-fixed on the oldest keyframe;
 6. map aging."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SfMConfig
from ..ba import BAMode, observations_from_keyframes, run_ba
from ..features.match import match_features
from ..geometry.camera import project, depths
from ..geometry.epipolar import fundamental_from_poses, filter_matches_epipolar
from ..geometry.triangulate import triangulate_pair
from ..mapstore import (add_landmarks, add_descriptors, clear_links,
                        cull_landmarks, cull_keyframes, kf_view_counts,
                        representative_descriptors, increment_age)
from .state import SfMState, CameraParams


def _triangulate_with_kf(cfg: SfMConfig, cam: CameraParams, state: SfMState,
                         new_slot, old_slot):
    """Match unmatched<->unmatched between the new KF and one older KF,
    triangulate, filter, insert landmarks, link both keyframes
    (CSfM.cpp:138-185)."""
    kfs, lms = state.kfs, state.lms
    fr = kfs.frames
    new_f = jax.tree.map(lambda x: x[new_slot], fr)
    old_f = jax.tree.map(lambda x: x[old_slot], fr)

    src_valid = old_f.kp_valid & (old_f.landmark < 0) & kfs.valid[old_slot]
    tgt_valid = new_f.kp_valid & (new_f.landmark < 0) & kfs.valid[new_slot]
    usable = (old_slot != new_slot) & kfs.valid[old_slot]
    res = match_features(
        old_f.desc, old_f.xy, src_valid & usable,
        new_f.desc, new_f.xy, tgt_valid,
        min_radius=cfg.match_min_radius, max_radius=cfg.mapping_max_radius,
        max_distance=cfg.match_max_distance, ratio=cfg.match_ratio)

    uv0 = old_f.xy
    uv1 = new_f.xy[jnp.where(res.mask, res.idx, 0)]
    P0 = cam.Kopt @ _pmat(old_f.rvec, old_f.tvec)
    P1 = cam.Kopt @ _pmat(new_f.rvec, new_f.tvec)
    X = triangulate_pair(P0, P1, uv0, uv1)
    F = fundamental_from_poses(cam.Kopt, old_f.rvec, old_f.tvec,
                               cam.Kopt, new_f.rvec, new_f.tvec)
    keep = filter_matches_epipolar(
        F, uv0, uv1, X, old_f.rvec, old_f.tvec, new_f.rvec, new_f.tvec,
        cfg.epipolar_max_error, valid=res.mask)

    lms, ids = add_landmarks(lms, X, new_f.desc[jnp.where(keep, res.idx, 0)],
                             keep, jnp.full_like(res.idx, 2),
                             colors=new_f.color[jnp.where(keep, res.idx, 0)])
    lms = add_descriptors(lms, jnp.where(ids >= 0, ids, -1), old_f.desc,
                          colors=old_f.color)
    ok = ids >= 0
    N = cfg.max_keypoints
    old_links = fr.landmark[old_slot].at[
        jnp.where(ok, jnp.arange(N), N)].set(ids, mode="drop")
    new_links = fr.landmark[new_slot].at[
        jnp.where(ok, res.idx, N)].set(ids, mode="drop")
    landmark = fr.landmark.at[old_slot].set(old_links)
    landmark = landmark.at[new_slot].set(new_links)
    kfs = kfs._replace(frames=fr._replace(landmark=landmark))
    return state._replace(kfs=kfs, lms=lms)


def _pmat(rvec, tvec):
    from ..geometry.triangulate import projection_matrix
    return projection_matrix(rvec, tvec)


def _reobserve_in_kf(cfg: SfMConfig, cam: CameraParams, state: SfMState,
                     slot):
    """Project unlinked landmarks into keyframe ``slot`` and match them with
    a reprojection-radius window (CSfM.cpp:190-221's widening, generalized
    to all landmarks)."""
    kfs, lms = state.kfs, state.lms
    fr = kfs.frames
    f = jax.tree.map(lambda x: x[slot], fr)
    L = lms.valid.shape[0]
    linked = f.landmark >= 0
    safe = jnp.where(linked, f.landmark, 0)
    already = jnp.zeros((L,), bool).at[safe].set(linked, mode="drop")
    proj = project(cam.Kopt, f.rvec, f.tvec, lms.xyz)
    depth = depths(f.rvec, f.tvec, lms.xyz)
    H, W = cfg.image_size
    in_img = ((proj[:, 0] >= 0) & (proj[:, 0] < W) &
              (proj[:, 1] >= 0) & (proj[:, 1] < H) & (depth > 0))
    cand = lms.valid & ~already & in_img & kfs.valid[slot]
    rep = state.rep_desc
    res = match_features(
        rep, proj, cand, f.desc, f.xy, f.kp_valid & ~linked,
        min_radius=0.0, max_radius=cfg.max_reproj_error,
        max_distance=cfg.match_max_distance, ratio=cfg.match_ratio,
        window_center0=proj)
    ok = res.mask
    lm_ids = jnp.arange(L, dtype=jnp.int32)
    links = f.landmark.at[
        jnp.where(ok, res.idx, f.landmark.shape[0])].set(lm_ids, mode="drop")
    landmark = fr.landmark.at[slot].set(links)
    lms = add_descriptors(
        lms, jnp.where(ok, lm_ids, -1),
        f.desc[jnp.where(ok, res.idx, 0)],
        colors=f.color[jnp.where(ok, res.idx, 0)])
    kfs = kfs._replace(frames=fr._replace(landmark=landmark))
    return state._replace(kfs=kfs, lms=lms)


def mapping_pass(cfg: SfMConfig, cam: CameraParams, state: SfMState,
                 new_slot) -> SfMState:
    K = cfg.max_keyframes
    L = cfg.max_landmarks

    # 1. triangulate the new keyframe against every older keyframe, serially
    #    (later pairs only see leftovers, as in the reference's loop)
    def tri_body(i, st):
        return jax.lax.cond(
            (i != new_slot) & st.kfs.valid[i],
            lambda s: _triangulate_with_kf(cfg, cam, s, new_slot, i),
            lambda s: s, st)

    state = jax.lax.fori_loop(0, K, tri_body, state)

    # 2. re-observation pass over every keyframe
    def reobs_body(i, st):
        return jax.lax.cond(
            st.kfs.valid[i],
            lambda s: _reobserve_in_kf(cfg, cam, s, i),
            lambda s: s, st)

    state = jax.lax.fori_loop(0, K, reobs_body, state)

    # 3. landmark culling + link clearing (CSfM.cpp:237, 692-706)
    views = kf_view_counts(state.kfs, L)
    lms, tomb = cull_landmarks(
        state.lms, views, min_views=cfg.cull_min_views,
        young_age=cfg.cull_young_kf_age, view_ratio=cfg.cull_view_ratio)
    fr = state.kfs.frames
    landmark = jax.vmap(clear_links, in_axes=(0, None))(fr.landmark, tomb)
    kfs = state.kfs._replace(frames=fr._replace(landmark=landmark))
    prev = state.prev._replace(
        landmark=clear_links(state.prev.landmark, tomb))

    # 4. keyframe culling (CSfM.cpp:245, 708-752)
    kfs, _ = cull_keyframes(
        kfs, L, redundancy=cfg.kf_cull_redundancy,
        min_others=cfg.kf_cull_min_others)

    # 5. full-map BA, gauge-fixed on the oldest keyframe (CSfM.cpp:250-259)
    obs = observations_from_keyframes(kfs, lms.valid)
    oldest = jnp.argmin(jnp.where(kfs.valid, kfs.frames.frame_no, 2**30))
    cam_free = kfs.valid.at[oldest].set(False)
    rv, tv, xyz, stats = run_ba(
        cam.Kopt, kfs.frames.rvec, kfs.frames.tvec, lms.xyz, obs,
        cam_free=cam_free, lm_free=lms.valid,
        mode=BAMode.STRUCT_AND_POSE, iterations=cfg.ba_iterations,
        lam0=cfg.ba_lambda_init, lam_up=cfg.ba_lambda_up,
        lam_down=cfg.ba_lambda_down, huber_delta=cfg.ba_huber_delta,
                tol=cfg.ba_tol)
    kfs = kfs._replace(frames=kfs.frames._replace(rvec=rv, tvec=tv))
    lms = lms._replace(xyz=xyz)

    # 6. age the map in keyframes (CSfM.cpp:304)
    lms = increment_age(lms, 0, 1)
    return state._replace(kfs=kfs, lms=lms, prev=prev,
                          rep_desc=representative_descriptors(lms))
