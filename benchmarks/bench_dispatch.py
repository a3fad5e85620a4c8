"""Quantify host->device dispatch overhead over the dev tunnel and how the
video-chunk size amortizes it.  Informs the bench.py CHUNK choice."""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import __graft_entry__ as g
from sfm_tpu.config import SfMConfig
from sfm_tpu.engine.state import CameraParams, init_state
from sfm_tpu.engine.step import build_video_step
from sfm_tpu.synthetic import SpriteScene, strafe_trajectory


def main():
    # 1. bare dispatch latency: tiny jitted op, timed solo
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(f(x))
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(x))
        print(f"tiny dispatch: {(time.time()-t0)*1000:.1f} ms")

    # 2. video-step chunk scaling
    cfg = SfMConfig(**g.FLAGSHIP)
    K = np.array([[525.0, 0, 320.0], [0, 525.0, 240.0], [0, 0, 1]],
                 np.float32)
    cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5), Kopt=jnp.asarray(K))
    rng = np.random.default_rng(11)
    scene = SpriteScene(rng, n_sprites=260, spread=2.4)
    n_frames = 128
    rvecs, tvecs = strafe_trajectory(n_frames, step=0.03, yaw_rate=0.001)
    frames = np.stack([scene.render(K, rvecs[i], tvecs[i], 480, 640)
                       for i in range(n_frames)])

    for CHUNK in (16, 64):
        chunk_step = jax.jit(build_video_step(cfg, cam), donate_argnums=(0,))
        chunks = [jnp.asarray(frames[i:i + CHUNK])
                  for i in range(0, n_frames, CHUNK)]
        state = init_state(cfg)
        t0 = time.time()
        state, m = chunk_step(state, chunks[0])
        jax.block_until_ready(m)
        print(f"CHUNK={CHUNK}: compile+chunk0 {time.time()-t0:.1f}s",
              flush=True)
        times = []
        kfs = []
        for ch in chunks[1:]:
            t0 = time.time()
            state, m = chunk_step(state, ch)
            jax.block_until_ready(m)
            times.append((time.time() - t0) / ch.shape[0])
            kfs.append(int(np.asarray(m.keyframe_added).sum()))
        times = np.array(times)
        kfs = np.array(kfs)
        pure = times[kfs == 0] if (kfs == 0).any() else times
        print(f"CHUNK={CHUNK}: per-frame ms {1000*times}", flush=True)
        print(f"CHUNK={CHUNK}: pure-tracking median "
              f"{1000*np.median(pure):.2f} ms/frame "
              f"({1/np.median(pure):.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
