"""Desktop CLI (main/main.cpp replacement): frames in -> PLY point cloud out.

The reference hard-codes the video path and iPhone 6s intrinsics
(main/main.cpp:39-52); here everything is a flag.  Landmark color export
fixes the reference's never-filled ``colour`` output (CSfM.cpp:798-800).

Usage:
    python -m sfm_tpu.cli scan --input frames_dir/ --output cloud.ply \
        --fx 525 --fy 525 --cx 320 --cy 240 [--dist k1 k2 p1 p2 k3] \
        [--checkpoint state.npz] [--resume state.npz] [--metrics out.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def cmd_scan(args) -> int:
    import jax.numpy as jnp
    from .config import SfMConfig
    from .engine import SfMEngine
    from .io import open_source, PointCloud, save_state, load_state
    from .guidance import init_guidance, update_guidance

    src = open_source(args.input)
    first = next(iter(src))
    h, w = first[0].shape

    cfg = SfMConfig(image_height=h, image_width=w,
                    max_keypoints=args.max_keypoints,
                    max_keyframes=args.max_keyframes,
                    max_landmarks=args.max_landmarks,
                    pnp_solver=args.pnp_solver,
                    feature_dtype=args.feature_dtype,
                    track_with_flow=args.flow)
    K = np.array([[args.fx, 0, args.cx], [0, args.fy, args.cy], [0, 0, 1]],
                 np.float32)
    eng = SfMEngine(K, (h, w), args.dist, cfg)
    if args.resume:
        eng.state = load_state(args.resume, cfg)

    gstate = init_guidance(cfg)
    gout = None
    metrics_f = open(args.metrics, "w") if args.metrics else None
    writer = None
    if args.video:
        from .viz import Y4MWriter, overlay_frame
        from .np_geometry import rodrigues_np
        writer = Y4MWriter(args.video, width=w, height=h)
    # throughput mode: --chunk batches frames through the deferred-mapping
    # chunked step (one device call per chunk, mapping dispatched after) —
    # only when nothing needs per-frame host state (overlay/guidance)
    chunked = args.chunk > 1 and writer is None and not args.guidance
    if args.chunk > 1 and not chunked:
        print("--chunk ignored: per-frame mode required for "
              "--video/--guidance", file=sys.stderr)
    chunk_n = min(args.chunk, cfg.keyframe_time_lag)
    buf = []

    n = 0
    t0 = time.time()

    def flush_chunk():
        nonlocal n
        if not buf:
            return
        real = len(buf)
        frames = buf if real == chunk_n else \
            buf + [buf[-1]] * (chunk_n - real)
        # pad a partial tail to the full chunk shape (repeat last frame):
        # an odd-shaped final chunk would force a fresh XLA compile of the
        # whole chunked step for a handful of frames.  Padded duplicates
        # are near-zero-motion frames (no keyframe, negligible map effect)
        # and their metrics are dropped below.
        ms = eng.add_frames(np.stack(frames))[:real]
        buf.clear()
        if metrics_f:
            for mm in ms:
                metrics_f.write(json.dumps(
                    {k: (v.tolist() if hasattr(v, "tolist") else v)
                     for k, v in mm.items()}) + "\n")
        n += real

    if chunked:
        for gray, rgb in src:
            buf.append(gray)
            if args.max_frames and n + len(buf) >= args.max_frames:
                del buf[args.max_frames - n:]   # honor --max-frames exactly
                break
            if len(buf) == chunk_n:
                flush_chunk()
        flush_chunk()
    for gray, rgb in ([] if chunked else src):
        m = eng.add_frame(gray)
        if rgb is not None and int(m["status"]) == 1 and args.guidance:
            gstate, gout = update_guidance(
                cfg, gstate, jnp.asarray(rgb.astype(np.float32)),
                eng.state.lms.xyz, eng.state.lms.valid,
                eng.cam.Kopt, eng.state.prev.rvec, eng.state.prev.tvec)
        if writer is not None:
            # overlay: detections + reprojected map points + guidance bbox
            # (the reference's always-on debug view, CSfM.cpp:91-104)
            from .viz import overlay_frame
            from .np_geometry import rodrigues_np
            reproj = reproj_mask = None
            if int(m["status"]) == 1:
                lms_xyz = np.asarray(eng.state.lms.xyz)
                lms_valid = np.asarray(eng.state.lms.valid)
                R = rodrigues_np(np.asarray(eng.state.prev.rvec))
                t = np.asarray(eng.state.prev.tvec)
                camp = lms_xyz @ R.T + t
                z = np.maximum(camp[:, 2], 1e-6)
                Kopt = np.asarray(eng.cam.Kopt)
                reproj = (camp[:, :2] / z[:, None]) @ Kopt[:2, :2].T \
                    + Kopt[:2, 2]
                reproj_mask = lms_valid & (camp[:, 2] > 0)
            writer.write(overlay_frame(
                gray, m, reproj_xy=reproj, reproj_mask=reproj_mask,
                kp_xy=np.asarray(eng.state.prev.xy_dist),
                kp_mask=np.asarray(eng.state.prev.kp_valid),
                guidance=gout if args.guidance else None))
        if metrics_f:
            metrics_f.write(json.dumps(
                {k: (v.tolist() if hasattr(v, "tolist") else v)
                 for k, v in m.items()}) + "\n")
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    if writer is not None:
        writer.close()
    dt = time.time() - t0
    print(f"processed {n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.1f} fps), "
          f"status={eng.status}", file=sys.stderr)

    if metrics_f:
        metrics_f.close()
    if args.checkpoint:
        save_state(args.checkpoint, eng.state)

    pts, colors = eng.get_reconstruction()
    cloud = PointCloud(pts, colors)
    cloud.center().scale(args.scale)
    cloud.write_ply(args.output)
    print(f"wrote {len(pts)} points to {args.output}", file=sys.stderr)
    return 0


def cmd_tum(args) -> int:
    """Run a TUM RGB-D sequence (monocular) and report sim(3) ATE — the
    BASELINE.json accuracy configs (fr3/teddy, fr2/desk)."""
    import numpy as np
    from .config import SfMConfig
    from .engine import SfMEngine
    from .io.tum import TUMSequence, TUM_INTRINSICS, ate_sim3
    from .np_geometry import rodrigues_np

    seq = TUMSequence(args.seq)
    intr = TUM_INTRINSICS[args.camera]
    first = next(seq.frames())
    h, w = first[1].shape
    cfg = SfMConfig(image_height=h, image_width=w,
                    max_keypoints=args.max_keypoints,
                    max_keyframes=args.max_keyframes,
                    max_landmarks=args.max_landmarks)
    K = np.array([[intr["fx"], 0, intr["cx"]],
                  [0, intr["fy"], intr["cy"]], [0, 0, 1]], np.float32)
    eng = SfMEngine(K, (h, w), intr.get("dist"), cfg)
    kf_ts = {}
    n = 0
    for ts, gray, rgb in seq.frames():
        m = eng.add_frame(gray)
        if bool(m["keyframe_added"]):
            kf_ts[int(eng.state.frame_count) - 1] = ts
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    out = {"frames": n, "status": eng.status,
           "n_keyframes": int(np.asarray(eng.state.kfs.valid).sum()),
           "n_landmarks": int(np.asarray(eng.state.lms.valid).sum())}
    if seq.gt_ts is not None and out["n_keyframes"] >= 3:
        valid = np.asarray(eng.state.kfs.valid)
        fns = np.asarray(eng.state.kfs.frames.frame_no)[valid]
        rv = np.asarray(eng.state.kfs.frames.rvec)[valid]
        tv = np.asarray(eng.state.kfs.frames.tvec)[valid]
        order = np.argsort(fns)
        ts_arr = np.array([kf_ts.get(int(f), seq.rgb[min(int(f),
                           len(seq.rgb) - 1)][0]) for f in fns[order]])
        gt_c = seq.gt_positions_at(ts_arr)
        est_c = np.stack([-rodrigues_np(rv[i]).T @ tv[i] for i in order])
        out["ate_m"] = round(ate_sim3(est_c, gt_c), 4)
    print(json.dumps(out))
    return 0


def cmd_info(args) -> int:
    from .io import read_ply
    xyz, rgb = read_ply(args.input)
    print(json.dumps({
        "n_points": int(len(xyz)),
        "has_color": rgb is not None,
        "bbox_min": xyz.min(0).tolist() if len(xyz) else None,
        "bbox_max": xyz.max(0).tolist() if len(xyz) else None,
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sfm_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("scan", help="run a scan: frames -> PLY")
    ps.add_argument("--input", required=True,
                    help="frame source: image dir, .npy/.npz, or .y4m")
    ps.add_argument("--output", required=True, help="output .ply path")
    ps.add_argument("--fx", type=float, required=True)
    ps.add_argument("--fy", type=float, required=True)
    ps.add_argument("--cx", type=float, required=True)
    ps.add_argument("--cy", type=float, required=True)
    ps.add_argument("--dist", type=float, nargs="*", default=None,
                    help="distortion k1 k2 p1 p2 [k3]")
    ps.add_argument("--scale", type=float, default=500.0,
                    help="output volume scale (ref: scaleVolume(500))")
    ps.add_argument("--max-keypoints", type=int, default=512)
    ps.add_argument("--max-keyframes", type=int, default=32)
    ps.add_argument("--max-landmarks", type=int, default=8192)
    ps.add_argument("--max-frames", type=int, default=0)
    ps.add_argument("--pnp-solver", choices=["dlt", "p3p"], default="dlt",
                    help="PnP minimal solver (p3p: 3-pt Grunert, tolerates"
                         " lower inlier ratios)")
    ps.add_argument("--feature-dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="dense detector/descriptor compute dtype")
    ps.add_argument("--checkpoint", default=None,
                    help="save engine state npz at the end")
    ps.add_argument("--resume", default=None,
                    help="resume engine state npz before scanning")
    ps.add_argument("--metrics", default=None,
                    help="write per-frame metrics JSONL")
    ps.add_argument("--chunk", type=int, default=1,
                    help="batch N frames per device call (throughput "
                    "mode via the deferred-mapping chunked step; capped "
                    "at the keyframe lag; incompatible with "
                    "--video/--guidance)")
    ps.add_argument("--flow", action="store_true",
                    help="flow-assisted tracking: LK-track features whose "
                         "descriptor match failed (blur/low-texture recall)")
    ps.add_argument("--guidance", action="store_true",
                    help="run scan-guidance segmentation on color frames")
    ps.add_argument("--video", default=None,
                    help="write a debug overlay video (.y4m) — the "
                         "reference's startVideoOutput equivalent")
    ps.set_defaults(fn=cmd_scan)

    pi = sub.add_parser("info", help="inspect a PLY file")
    pi.add_argument("--input", required=True)
    pi.set_defaults(fn=cmd_info)

    pt = sub.add_parser("tum", help="run a TUM sequence and report ATE")
    pt.add_argument("--seq", required=True, help="TUM sequence directory")
    pt.add_argument("--camera", default="fr3", choices=["fr1", "fr2", "fr3"])
    pt.add_argument("--max-keypoints", type=int, default=512)
    pt.add_argument("--max-keyframes", type=int, default=32)
    pt.add_argument("--max-landmarks", type=int, default=8192)
    pt.add_argument("--max-frames", type=int, default=0)
    pt.set_defaults(fn=cmd_tum)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
