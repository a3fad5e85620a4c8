"""Scan-guidance tests: hull mask geometry, histogram back-projection
segmentation of a colored object, EMA stability, bbox orientation."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import SfMConfig
from sfm_tpu.guidance import (init_guidance, update_guidance, hull_mask,
                              rgb_to_hs, GuidanceState)

CFG = SfMConfig(image_height=240, image_width=320)


class TestHullMask:
    def test_square_hull(self):
        pts = jnp.asarray([[10.0, 10.0], [50.0, 10.0], [50.0, 40.0],
                           [10.0, 40.0]])
        m = np.asarray(hull_mask(pts, jnp.ones(4, bool), 60, 80))
        assert m[25, 30] and m[11, 11] and m[39, 49]
        assert not m[5, 5] and not m[50, 70]

    def test_needs_three_points(self):
        pts = jnp.asarray([[10.0, 10.0], [50.0, 40.0]])
        m = np.asarray(hull_mask(pts, jnp.ones(2, bool), 60, 80))
        assert not m.any()

    def test_invalid_points_ignored(self):
        pts = jnp.asarray([[10.0, 10.0], [50.0, 10.0], [30.0, 40.0],
                           [500.0, 500.0]])
        valid = jnp.asarray([True, True, True, False])
        m = np.asarray(hull_mask(pts, valid, 60, 80))
        assert m[20, 30]
        assert not m[55, 75]


class TestColor:
    def test_rgb_to_hs_known_values(self):
        rgb = jnp.asarray([[255.0, 0.0, 0.0], [0.0, 255.0, 0.0],
                           [0.0, 0.0, 255.0], [128.0, 128.0, 128.0]])
        h, s = rgb_to_hs(rgb)
        np.testing.assert_allclose(np.asarray(h), [0.0, 120.0, 240.0, 0.0],
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(s), [1.0, 1.0, 1.0, 0.0],
                                   atol=1e-3)


class TestGuidance:
    def _scene(self):
        """A red object in the image center, blue background; landmarks
        projecting onto the object."""
        rgb = np.zeros((240, 320, 3), np.float32)
        rgb[..., 2] = 200.0                      # blue background
        rgb[80:160, 120:200, :] = 0.0
        rgb[80:160, 120:200, 0] = 220.0          # red object
        K = jnp.asarray([[200.0, 0, 160], [0, 200.0, 120], [0, 0, 1]])
        # landmarks at z=2 projecting into the object region
        us = np.linspace(125, 195, 8)
        vs = np.linspace(85, 155, 8)
        uu, vv = np.meshgrid(us, vs)
        x = (uu - 160) / 200.0 * 2.0
        y = (vv - 120) / 200.0 * 2.0
        xyz = np.stack([x.ravel(), y.ravel(), np.full(64, 2.0)], -1)
        return rgb, K, jnp.asarray(xyz.astype(np.float32))

    def test_segments_object(self):
        rgb, K, xyz = self._scene()
        st = init_guidance(CFG)
        st, out = update_guidance(CFG, st, jnp.asarray(rgb), xyz,
                                  jnp.ones(64, bool), K,
                                  jnp.zeros(3), jnp.zeros(3))
        ds = CFG.guidance_downscale
        mask = np.asarray(out.mask)
        # object region segmented, background not
        assert mask[120 // ds:150 // ds, 130 // ds:190 // ds].mean() > 0.5
        assert mask[:60 // ds, :].mean() < 0.05
        # bbox center near the object center (160, 120)
        c = np.asarray(out.bbox_center)
        assert abs(c[0] - 160) < 15 and abs(c[1] - 120) < 15
        # centroid is the landmark centroid
        np.testing.assert_allclose(np.asarray(out.centroid),
                                   np.asarray(xyz).mean(0), atol=1e-2)

    def test_ema_hist_stable_across_frames(self):
        rgb, K, xyz = self._scene()
        st = init_guidance(CFG)
        for _ in range(3):
            st, out = update_guidance(CFG, st, jnp.asarray(rgb), xyz,
                                      jnp.ones(64, bool), K,
                                      jnp.zeros(3), jnp.zeros(3))
        assert bool(st.initialized)
        assert float(jnp.max(st.hist)) > 0.1

    def test_jittable(self):
        rgb, K, xyz = self._scene()
        st = init_guidance(CFG)
        f = jax.jit(lambda s, im: update_guidance(
            CFG, s, im, xyz, jnp.ones(64, bool), K,
            jnp.zeros(3), jnp.zeros(3)))
        st, out = f(st, jnp.asarray(rgb))
        assert np.asarray(out.mask).shape == (60, 80)
