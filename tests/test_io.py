"""I/O tests: PLY roundtrip (native C++ path + numpy fallback), cloud
transforms, frame sources, checkpoint/resume, CLI end-to-end."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from sfm_tpu.io import (PointCloud, read_ply, open_source, NpyStackSource,
                        Y4MSource, save_state, load_state)
from sfm_tpu.io import ply as ply_mod


class TestPly:
    def test_roundtrip_with_colors(self, rng, tmp_path):
        xyz = rng.normal(0, 1, (500, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (500, 3)).astype(np.uint8)
        p = str(tmp_path / "c.ply")
        PointCloud(xyz, rgb).write_ply(p)
        x2, c2 = read_ply(p)
        np.testing.assert_allclose(x2, xyz, atol=1e-6)
        np.testing.assert_array_equal(c2, rgb)

    def test_roundtrip_no_colors(self, rng, tmp_path):
        xyz = rng.normal(0, 1, (100, 3)).astype(np.float32)
        p = str(tmp_path / "n.ply")
        PointCloud(xyz).write_ply(p)
        x2, c2 = read_ply(p)
        np.testing.assert_allclose(x2, xyz, atol=1e-6)
        assert c2 is None

    def test_numpy_fallback_matches_native(self, rng, tmp_path):
        xyz = rng.normal(0, 1, (50, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (50, 3)).astype(np.uint8)
        p1 = str(tmp_path / "a.ply")
        p2 = str(tmp_path / "b.ply")
        PointCloud(xyz, rgb).write_ply(p1)
        lib = ply_mod._lib
        ply_mod._lib = None
        old_path = ply_mod._LIB_PATH
        ply_mod._LIB_PATH = "/nonexistent.so"
        try:
            PointCloud(xyz, rgb).write_ply(p2)
        finally:
            ply_mod._lib = lib
            ply_mod._LIB_PATH = old_path
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_center_scale(self, rng):
        xyz = rng.normal(5, 1, (200, 3)).astype(np.float32)
        c = PointCloud(xyz.copy()).center()
        np.testing.assert_allclose(c.xyz.mean(0), 0, atol=1e-3)
        c.scale(500.0)
        assert abs(np.abs(c.xyz).max() - 500.0) < 0.5

    def test_add_points(self, rng):
        c = PointCloud()
        c.add_points(np.ones((3, 3)), np.full((3, 3), 7))
        c.add_points(np.zeros((2, 3)), np.zeros((2, 3)))
        assert c.xyz.shape == (5, 3)
        assert c.colors.shape == (5, 3)


class TestFrameSources:
    def test_npy_stack(self, rng, tmp_path):
        stack = rng.integers(0, 255, (4, 32, 48)).astype(np.uint8)
        p = str(tmp_path / "v.npy")
        np.save(p, stack)
        frames = list(open_source(p))
        assert len(frames) == 4
        assert frames[0][0].shape == (32, 48)
        assert frames[0][0].dtype == np.float32

    def test_y4m(self, rng, tmp_path):
        w, h = 32, 16
        p = str(tmp_path / "v.y4m")
        with open(p, "wb") as f:
            f.write(b"YUV4MPEG2 W32 H16 F25:1 Ip A1:1 C420\n")
            for _ in range(3):
                f.write(b"FRAME\n")
                f.write(rng.integers(0, 255, h * w).astype(np.uint8).tobytes())
                f.write(np.full(2 * (h // 2) * (w // 2), 128,
                                np.uint8).tobytes())
        frames = list(open_source(p))
        assert len(frames) == 3
        gray, rgb = frames[0]
        assert gray.shape == (16, 32)
        assert rgb.shape == (16, 32, 3)
        # neutral chroma -> rgb ~= gray in all channels
        np.testing.assert_allclose(rgb[..., 0], gray, atol=1.0)

    def test_image_dir(self, rng, tmp_path):
        from PIL import Image
        for i in range(3):
            arr = rng.integers(0, 255, (20, 30, 3)).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / f"f{i:03d}.png")
        frames = list(open_source(str(tmp_path)))
        assert len(frames) == 3
        assert frames[0][0].shape == (20, 30)
        assert frames[0][1].shape == (20, 30, 3)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import init_state
        import jax
        cfg = SfMConfig(max_keypoints=32, max_keyframes=4, max_landmarks=64,
                        image_height=48, image_width=64)
        st = init_state(cfg)
        st = st._replace(frame_count=st.frame_count + 5)
        p = str(tmp_path / "ck.npz")
        save_state(p, st)
        st2 = load_state(p, cfg)
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self, tmp_path):
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import init_state
        cfg = SfMConfig(max_keypoints=32, max_keyframes=4, max_landmarks=64,
                        image_height=48, image_width=64)
        p = str(tmp_path / "ck.npz")
        save_state(p, init_state(cfg))
        cfg2 = SfMConfig(max_keypoints=64, max_keyframes=4, max_landmarks=64,
                         image_height=48, image_width=64)
        with pytest.raises(ValueError):
            load_state(p, cfg2)


class TestCLI:
    def test_scan_end_to_end(self, tmp_path):
        from sfm_tpu.synthetic import SpriteScene, strafe_trajectory
        rng = np.random.default_rng(3)
        scene = SpriteScene(rng)
        K = np.array([[250., 0, 160], [0, 250., 120], [0, 0, 1]], np.float32)
        rv, tv = strafe_trajectory(14, step=0.06, yaw_rate=0.001)
        stack = np.stack([scene.render(K, rv[i], tv[i], 240, 320)
                          for i in range(14)]).astype(np.uint8)
        vid = str(tmp_path / "scan.npy")
        np.save(vid, stack)
        out = str(tmp_path / "cloud.ply")
        met = str(tmp_path / "m.jsonl")
        ck = str(tmp_path / "state.npz")

        from sfm_tpu.cli import main
        rc = main(["scan", "--input", vid, "--output", out,
                   "--fx", "250", "--fy", "250", "--cx", "160",
                   "--cy", "120", "--max-keypoints", "192",
                   "--max-keyframes", "8", "--max-landmarks", "1024",
                   "--metrics", met, "--checkpoint", ck])
        assert rc == 0
        xyz, _ = read_ply(out)
        assert len(xyz) > 30
        assert abs(np.abs(xyz).max() - 500.0) < 1.0  # scaled volume
        lines = [json.loads(l) for l in open(met)]
        assert len(lines) == 14
        assert lines[-1]["status"] == 1
        assert os.path.exists(ck)


class TestEngineCheckpointMethods:
    def test_engine_save_load_resume(self, tmp_path):
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine import SfMEngine
        from sfm_tpu.synthetic import SpriteScene, strafe_trajectory
        rng = np.random.default_rng(3)
        scene = SpriteScene(rng)
        K = np.array([[250., 0, 160], [0, 250., 120], [0, 0, 1]], np.float32)
        rv, tv = strafe_trajectory(12, step=0.06, yaw_rate=0.001)
        cfg = SfMConfig(max_keypoints=192, max_keyframes=8,
                        max_landmarks=1024, image_height=240,
                        image_width=320, pyramid_levels=3,
                        ransac_hypotheses=64, pnp_hypotheses=32,
                        ba_iterations=6, keyframe_min_tracked=15,
                        keyframe_time_lag=6, min_init_matches=25)
        eng = SfMEngine(K, (240, 320), None, cfg)
        for i in range(6):
            eng.add_frame(scene.render(K, rv[i], tv[i], 240, 320))
        ck = str(tmp_path / "scan.npz")
        eng.save(ck)
        # resume into a fresh engine and continue the scan
        eng2 = SfMEngine(K, (240, 320), None, cfg)
        eng2.load(ck)
        assert eng2.status == eng.status
        for i in range(6, 12):
            m = eng2.add_frame(scene.render(K, rv[i], tv[i], 240, 320))
        assert int(m["status"]) == 1
        assert int(m["n_landmarks"]) > 30


def test_native_y4m_matches_python_reader(tmp_path, rng):
    """The C++ frame source (prefetch-threaded demux + YUV conversion)
    must reproduce the pure-Python Y4MSource bit-for-bit."""
    from sfm_tpu.viz import Y4MWriter
    from sfm_tpu.io.video import Y4MSource, NativeY4MSource

    path = str(tmp_path / "clip.y4m")
    wri = Y4MWriter(path, 64, 48, fps=25, scale=1.0)
    frames = [rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
              for _ in range(5)]
    for fr in frames:
        wri.write(fr)
    wri.close()

    try:
        native = list(NativeY4MSource(path, prefetch=2))
    except RuntimeError:
        import pytest
        pytest.skip("native runtime not built")
    ref = list(Y4MSource(path))
    assert len(native) == len(ref) == 5
    for (g_n, c_n), (g_r, c_r) in zip(native, ref):
        np.testing.assert_array_equal(g_n, g_r)
        np.testing.assert_array_equal(c_n, c_r)
