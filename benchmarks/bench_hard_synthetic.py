"""Hard-synthetic accuracy gate (VERDICT round 2 item 10): an accuracy
number on imagery the engine's own mapping model did not draw cleanly.

The flagship scan rendered through a radial-tangential lens model
(k1=-0.25 — the engine must undistort, the CFrame.cpp:169 contract) and
then degraded per frame with photometric noise, horizontal motion blur
and a roaming occluder (sfm_tpu.synthetic.degrade).  Every bench before
this ran d=0 and clean frames; this is the closest in-container stand-in
for the reference's tissuebox.mov acceptance workload
(/root/reference/main/main.cpp:39) while no real dataset is mounted.

Prints one JSON line with the sim(3)-aligned keyframe ATE as a % of
trajectory extent, and exits nonzero if the scan loses tracking or the
ATE exceeds the 1.5% CI gate (tests/test_engine.py flagship gate).

python benchmarks/bench_hard_synthetic.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


DIST = [-0.25, 0.07, 0.001, -0.0005, 0.0]


def main(n_frames=80):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import __graft_entry__ as g
    from sfm_tpu.engine import SfMEngine
    from sfm_tpu.np_geometry import rodrigues_np
    from sfm_tpu.synthetic import (SpriteScene, degrade, strafe_trajectory,
                                   umeyama_ate)

    cfg = g._flagship_cfg()  # platform guard: Pallas BA off when not on TPU
    K = np.array([[525.0, 0, 320.0], [0, 525.0, 240.0], [0, 0, 1]],
                 np.float32)
    rng = np.random.default_rng(11)
    deg_rng = np.random.default_rng(42)
    scene = SpriteScene(rng, n_sprites=260, spread=2.4)
    rvecs, tvecs = strafe_trajectory(n_frames, step=0.06, yaw_rate=0.001)

    print("rendering degraded distorted frames...", file=sys.stderr)
    frames = []
    for i in range(n_frames):
        img = scene.render(K, rvecs[i], tvecs[i], 480, 640, dist=DIST)
        img = degrade(img, deg_rng, noise_std=6.0, blur_len=5,
                      occlusion=0.03)
        frames.append(img.astype(np.float32))

    eng = SfMEngine(K, (480, 640), DIST, cfg)
    t0 = time.time()
    statuses = []
    for i, f in enumerate(frames):
        m = eng.add_frame(f)
        statuses.append(int(m["status"]))
        if i == 0:
            print(f"compile+frame0: {time.time() - t0:.1f}s",
                  file=sys.stderr)
    n_run = int((np.array(statuses) == 1).sum())
    print(f"running frames: {n_run}/{n_frames}, "
          f"landmarks {int(m['n_landmarks'])}, "
          f"keyframes {int(m['n_keyframes'])}", file=sys.stderr)

    traj = eng.get_trajectory()
    kfs = eng.state.kfs
    valid = np.asarray(kfs.valid)
    fns = np.sort(np.asarray(kfs.frames.frame_no)[valid])
    est_c = np.stack([-rodrigues_np(traj[i, :3]).T @ traj[i, 3:]
                      for i in range(len(traj))])
    gt_c = np.stack([-rodrigues_np(rvecs[f]).T @ tvecs[f] for f in fns])
    ate = umeyama_ate(est_c, gt_c)
    extent = float(np.linalg.norm(gt_c[-1] - gt_c[0]))
    pct = 100 * ate / max(extent, 1e-9)
    print(f"ATE {ate:.4f} over {extent:.2f} extent ({pct:.2f}%)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "hard_synthetic_ate_pct",
        "value": round(pct, 3),
        "unit": "% of trajectory extent (distorted+noise+blur+occlusion)",
        "vs_baseline": round(pct / 1.5, 3),  # vs the 1.5% CI gate
    }))
    ok = (np.array(statuses[-40:]) == 1).all() and pct < 1.5
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
