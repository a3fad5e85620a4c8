"""Driver benchmark: tracking throughput of the flagship engine on one chip.

Runs a synthetic 480x640 scan through the full jitted SLAM step and reports
median per-frame tracking throughput.  Baseline: the reference's implied
operating point is live webcam video on a laptop/phone CPU, ~30 fps
(BASELINE.md; README.md:27, CSfM.cpp:782) — vs_baseline is the multiple of
that rate.  Prints exactly ONE JSON line on stdout."""

import json
import sys
import time

import numpy as np


def main():
    import jax
    # warm-start XLA across runs (compile of the full scan step dominates
    # cold bench time)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import __graft_entry__ as g
    from sfm_tpu.config import SfMConfig
    from sfm_tpu.engine.state import CameraParams, init_state
    from sfm_tpu.engine.step import build_step
    from sfm_tpu.synthetic import SpriteScene, strafe_trajectory

    from sfm_tpu.engine.step import build_video_step

    cfg = SfMConfig(**g.FLAGSHIP)
    K = np.array([[525.0, 0, 320.0], [0, 525.0, 240.0], [0, 0, 1]],
                 np.float32)
    cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5), Kopt=jnp.asarray(K))
    CHUNK = 16
    chunk_step = jax.jit(build_video_step(cfg, cam), donate_argnums=(0,))

    rng = np.random.default_rng(11)
    scene = SpriteScene(rng, n_sprites=260, spread=2.4)
    n_frames = 80
    rvecs, tvecs = strafe_trajectory(n_frames, step=0.06, yaw_rate=0.001)
    frames = np.stack([scene.render(K, rvecs[i], tvecs[i], 480, 640)
                       for i in range(n_frames)])
    chunks = [jnp.asarray(frames[i:i + CHUNK])
              for i in range(0, n_frames, CHUNK)]

    state = init_state(cfg)
    # warmup/compile + bootstrap on the first chunk
    t0 = time.time()
    state, m = chunk_step(state, chunks[0])
    jax.block_until_ready(m)
    print(f"compile+chunk0: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    chunk_kfs = []
    statuses = []
    for ch in chunks[1:]:
        t0 = time.time()
        state, m = chunk_step(state, ch)
        m = jax.block_until_ready(m)
        times.append((time.time() - t0) / ch.shape[0])
        chunk_kfs.append(int(np.asarray(m.keyframe_added).sum()))
        statuses.extend(np.asarray(m.status).tolist())

    # pure-tracking measurement: with keyframe_time_lag=10 nearly every
    # 16-frame chunk of the main trajectory inserts a keyframe (and thus
    # times a mapping+BA pass too), so measure RUNNING-state tracking on
    # keyframe-free chunks.  The camera zig-zags laterally around the final
    # pose with a CONSTANT 0.03 m/frame step: at the scene's 4-7 m depths
    # that is 2.3-3.9 px/frame of flow — inside the [1.5, 40] px matching
    # window every frame (the old 0.002-step version sat BELOW the 1.5 px
    # min-motion gate, so "pure tracking" actually timed the lost/reloc
    # ramp — the round-2 75/128 regression's second half).  The wrap
    # between repeats also steps by 0.03, so every frame tracks.
    base_r, base_t = rvecs[-1], tvecs[-1]
    zig = np.array([1, 2, 3, 2, 1, 0, -1, -2, -3, -2, -1, 0, 1, 2, 3, 2],
                   np.float32) * 0.03
    jitter = jnp.asarray(np.stack([
        scene.render(K, base_r, base_t - np.array([zig[i], 0, 0],
                                                  np.float32), 480, 640)
        for i in range(CHUNK)]))
    # suppress keyframe insertion during the timed chunks: the track-ratio
    # policy (tracked < 0.9x the last keyframe's enriched link count)
    # correctly keeps firing while the zig-zag revisits the same view, but
    # a mapping+BA pass inside a timed chunk would contaminate the pure-
    # tracking number.  Zeroing the reference count makes 'losing' false
    # for every timed frame; the engine is otherwise untouched.
    state = state._replace(last_kf_tracked=jnp.asarray(0, jnp.int32))
    pure_times = []
    pure_statuses = []
    for _ in range(4):
        t0 = time.time()
        state, m = chunk_step(state, jitter)
        m = jax.block_until_ready(m)
        pure_times.append((time.time() - t0) / CHUNK)
        if int(np.asarray(m.keyframe_added).sum()):
            print("warning: keyframe fired in pure-tracking chunk",
                  file=sys.stderr)
        pure_statuses.extend(np.asarray(m.status).tolist())
    statuses.extend(pure_statuses)
    # a silent robustness regression must never ship inside a green fps
    # number (VERDICT round 2): every timed frame must be RUNNING
    n_pure_run = int((np.array(pure_statuses) == 1).sum())
    if n_pure_run < len(pure_statuses):
        print(f"BENCH INVALID: only {n_pure_run}/{len(pure_statuses)} "
              "timed pure-tracking frames RUNNING — the fps below would "
              "time the lost/reloc branch, not tracking", file=sys.stderr)
        raise SystemExit(1)

    statuses = np.array(statuses)
    times = np.array(times)
    chunk_kfs = np.array(chunk_kfs)
    n_kf = int(chunk_kfs.sum())
    track_ms = float(np.median(pure_times))
    amort_ms = float(np.mean(times))
    # per-mapping-pass cost from main-chunk time differences (chunks with
    # more/fewer keyframes); the timed zig-zag chunks are NOT a valid
    # baseline — their per-frame tracking cost differs (larger live map)
    map_ms = 0.0
    with_kf = times[chunk_kfs > 0]
    without_kf = times[chunk_kfs == 0]
    if len(with_kf) and len(without_kf):
        map_ms = max(0.0, (np.mean(with_kf) - np.mean(without_kf))
                     * CHUNK / max(chunk_kfs[chunk_kfs > 0].mean(), 1))
    fps = 1.0 / track_ms
    n_run = int((statuses == 1).sum())
    print(f"running frames: {n_run}/{len(statuses)}, keyframes: {n_kf}, "
          f"tracking {track_ms*1000:.2f} ms/frame, amortized "
          f"{amort_ms*1000:.2f} ms/frame ({1/amort_ms:.1f} fps), "
          f"mapping pass ~{map_ms*1000:.0f} ms", file=sys.stderr)

    # accuracy: sim(3)-aligned ATE of the keyframe trajectory vs ground truth
    from sfm_tpu.synthetic import umeyama_ate
    from sfm_tpu.np_geometry import rodrigues_np
    kf_valid = np.asarray(state.kfs.valid)
    # only main-trajectory keyframes have ground truth (the timed zig-zag
    # phase is keyframe-suppressed, but guard the lookup anyway)
    kf_valid = kf_valid & (np.asarray(state.kfs.frames.frame_no) < n_frames)
    if kf_valid.sum() >= 3:
        fns = np.asarray(state.kfs.frames.frame_no)[kf_valid]
        rv = np.asarray(state.kfs.frames.rvec)[kf_valid]
        tv = np.asarray(state.kfs.frames.tvec)[kf_valid]
        order = np.argsort(fns)
        est_c = np.stack([-rodrigues_np(rv[i]).T @ tv[i] for i in order])
        gt_c = np.stack([-rodrigues_np(rvecs[f]).T @ tvecs[f]
                         for f in fns[order]])
        ate = umeyama_ate(est_c, gt_c)
        extent = float(np.linalg.norm(gt_c[-1] - gt_c[0]))
        print(f"ATE {ate:.4f} over {extent:.2f} trajectory extent "
              f"({100*ate/max(extent,1e-9):.2f}%)", file=sys.stderr)

    baseline_fps = 30.0  # reference implied live-video rate on CPU
    print(json.dumps({
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
