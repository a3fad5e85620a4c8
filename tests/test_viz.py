"""Debug visualization tests: overlay drawing and the Y4M video writer
(roundtrip through the Y4M frame source)."""

import numpy as np

from sfm_tpu.viz import (draw_points, draw_line, draw_rotated_rect,
                         overlay_frame, Y4MWriter)
from sfm_tpu.io.video import Y4MSource


class TestDrawing:
    def test_draw_points_and_mask(self):
        img = np.zeros((40, 60), np.float32)
        xy = np.array([[10, 10], [50, 30], [200, 200]])
        out = draw_points(img, xy, (255, 0, 0), 1,
                          mask=np.array([True, False, True]))
        assert (out[10, 10] == [255, 0, 0]).all()
        assert (out[30, 50] == 0).all()        # masked out
        assert out.shape == (40, 60, 3)        # out-of-bounds ignored

    def test_draw_line(self):
        img = np.zeros((40, 60), np.float32)
        out = draw_line(img, (5, 5), (20, 20), (0, 255, 0))
        assert (out[12, 12] == [0, 255, 0]).all()

    def test_rotated_rect(self):
        img = np.zeros((60, 80), np.float32)
        out = draw_rotated_rect(img, (40, 30),
                                np.array([[1.0, 0.0], [0.0, 1.0]]),
                                (15, 10))
        assert (out[20, 40] == [255, 128, 0]).all()  # top edge
        assert (out[30, 25] == [255, 128, 0]).all()  # left edge

    def test_overlay_status_band(self):
        img = np.zeros((40, 60), np.float32)
        out = overlay_frame(img, {"status": 1})
        assert (out[0, :] == [0, 200, 0]).all()
        out = overlay_frame(img, {"status": 2})
        assert (out[0, :] == [255, 0, 0]).all()


class TestY4MWriter:
    def test_roundtrip(self, rng, tmp_path):
        path = str(tmp_path / "debug.y4m")
        w = Y4MWriter(path, width=64, height=48, fps=25, scale=0.5)
        frames = [rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
                  for _ in range(3)]
        for f in frames:
            w.write(f)
        w.close()
        back = list(Y4MSource(path))
        assert len(back) == 3
        gray, rgb = back[0]
        assert gray.shape == (24, 32)   # 0.5x scale
        # grayscale content preserved within YUV roundtrip error
        ref = frames[0][::2, ::2].astype(np.float32)
        ref_gray = 0.299 * ref[..., 0] + 0.587 * ref[..., 1] + 0.114 * ref[..., 2]
        assert np.abs(gray - ref_gray).mean() < 4.0
