"""Distributed-without-a-cluster tests (SURVEY.md §4.4): real shard_map /
collective code on 8 virtual CPU devices; golden-value parity between the
single-device solver and the sharded solver."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import pytest

from sfm_tpu.ba import Observations, run_ba, total_cost
from sfm_tpu.parallel import partition_observations, build_dist_ba
from test_ba import make_ba_scene


def make_mesh(n, axis="map"):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, (axis,))


class TestDistBA:
    def _scene(self, rng, n_cams=4, n_pts=64):
        return make_ba_scene(rng, n_cams=n_cams, n_pts=n_pts)

    def test_parity_with_single_device(self, rng):
        K, rvec, tvec, X, obs = self._scene(rng)
        rv0 = rvec + 0.01
        X0 = X + 0.03
        cam_free = jnp.ones(4, bool).at[0].set(False)
        lm_free = jnp.ones(64, bool)

        # single-device reference
        rv_s, tv_s, X_s, stats_s = run_ba(
            K, rv0, tvec, X0, obs, cam_free=cam_free, lm_free=lm_free,
            iterations=12)

        # sharded over 4 virtual devices
        mesh = make_mesh(4)
        obs_sh, shard_size = partition_observations(obs, 64, 4, 128)
        dist = build_dist_ba(mesh, "map", n_cams=4, shard_size=shard_size,
                             iterations=12)
        rv_d, tv_d, X_d, stats_d = dist(K, rv0, tvec, X0, obs_sh,
                                        cam_free, lm_free)
        # identical LM trajectory -> near-identical result
        np.testing.assert_allclose(np.asarray(rv_d), np.asarray(rv_s),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(X_d), np.asarray(X_s),
                                   atol=1e-3)
        assert abs(float(stats_d.final_cost) - float(stats_s.final_cost)) \
            < 1e-2 * max(float(stats_s.final_cost), 1.0)

    def test_converges_on_8_devices(self, rng):
        K, rvec, tvec, X, obs = self._scene(rng, n_cams=6, n_pts=160)
        rv0 = rvec.at[1:].add(0.02)  # keep the gauge camera at ground truth
        X0 = X + 0.05
        cam_free = jnp.ones(6, bool).at[0].set(False)
        lm_free = jnp.ones(160, bool)
        mesh = make_mesh(8)
        obs_sh, shard_size = partition_observations(obs, 160, 8, 256)
        dist = build_dist_ba(mesh, "map", n_cams=6, shard_size=shard_size,
                             iterations=15)
        rv_d, tv_d, X_d, stats = dist(K, rv0, tvec, X0, obs_sh,
                                      cam_free, lm_free)
        assert float(stats.final_cost) < 1e-2 * float(stats.initial_cost)
        np.testing.assert_allclose(np.asarray(rv_d), np.asarray(rvec),
                                   atol=5e-3)

    def test_partition_preserves_observations(self, rng):
        K, rvec, tvec, X, obs = self._scene(rng)
        obs_sh, shard_size = partition_observations(obs, 64, 4, 128)
        assert shard_size == 16
        # every original observation appears exactly once, with local index
        total = int(np.asarray(obs_sh.w).sum())
        assert total == int(np.asarray(obs.w).sum())
        for s in range(4):
            w = np.asarray(obs_sh.w)[s] > 0
            assert (np.asarray(obs_sh.lm_idx)[s][w] < shard_size).all()


class TestMultiScan:
    def test_batched_independent_scans(self, rng):
        # two identical scans + one divergent scan stay independent
        import sys
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import CameraParams, init_state
        from sfm_tpu.parallel import (init_batched_state, build_batched_step,
                                      shard_batched_state)
        from render import SpriteScene, strafe_trajectory

        cfg = SfMConfig(max_keypoints=96, max_keyframes=4, max_landmarks=256,
                        image_height=120, image_width=160, pyramid_levels=2,
                        ransac_hypotheses=32, pnp_hypotheses=16,
                        ba_iterations=3, keyframe_min_tracked=10,
                        keyframe_time_lag=4, min_init_matches=15)
        K = np.array([[130., 0, 80], [0, 130., 60], [0, 0, 1]], np.float32)
        cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5),
                           Kopt=jnp.asarray(K))
        B = 4
        states = init_batched_state(cfg, B)
        mesh = make_mesh(4, axis="scan")
        states = shard_batched_state(states, mesh, "scan")
        step = jax.jit(build_batched_step(cfg, cam))

        scenes = [SpriteScene(np.random.default_rng(10 + b), n_sprites=80)
                  for b in range(B)]
        rv, tv = strafe_trajectory(6, step=0.08)
        for i in range(6):
            imgs = np.stack([s.render(K, rv[i], tv[i], 120, 160)
                             for s in scenes])
            states, metrics = step(states, jnp.asarray(imgs))
        status = np.asarray(metrics.status)
        # batches evolve independently; all should at least have detected
        # features and most should be running
        assert (np.asarray(metrics.n_detected) > 20).all()
        assert (status == 1).sum() >= 2


class TestMultiScanDriver:
    def test_bucketed_mapping_dispatch(self, rng):
        import jax.numpy as jnp
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import CameraParams
        from sfm_tpu.parallel.multiscan import MultiScanDriver
        from render import SpriteScene, strafe_trajectory

        cfg = SfMConfig(max_keypoints=96, max_keyframes=4, max_landmarks=256,
                        image_height=120, image_width=160, pyramid_levels=2,
                        ransac_hypotheses=32, pnp_hypotheses=16,
                        ba_iterations=3, keyframe_min_tracked=10,
                        keyframe_time_lag=4, min_init_matches=15,
                        mapping_tri_keyframes=2, mapping_reobs_keyframes=2)
        K = np.array([[130., 0, 80], [0, 130., 60], [0, 0, 1]], np.float32)
        cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5),
                           Kopt=jnp.asarray(K))
        B = 3
        drv = MultiScanDriver(cfg, cam, batch=B, bucket=2)
        scenes = [SpriteScene(np.random.default_rng(20 + b), n_sprites=80)
                  for b in range(B)]
        rv, tv = strafe_trajectory(10, step=0.08)
        for i in range(10):
            imgs = np.stack([s.render(K, rv[i], tv[i], 120, 160)
                             for s in scenes])
            m = drv.step(jnp.asarray(imgs))
        status = np.asarray(m.status)
        assert (status == 1).sum() >= 2
        # pending slots always cleared after dispatch
        assert (np.asarray(drv.states.pending_map_slot) == -1).all()
        # mapping ran: keyframes accumulated beyond the bootstrap pair
        assert np.asarray(m.n_keyframes).max() >= 3

    def test_chunked_stepping(self, rng):
        """step_chunk (the throughput mode: T frames per device call) must
        bootstrap, track and map the fleet like per-frame stepping."""
        import jax.numpy as jnp
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import CameraParams
        from sfm_tpu.parallel.multiscan import MultiScanDriver
        from render import SpriteScene, strafe_trajectory

        cfg = SfMConfig(max_keypoints=96, max_keyframes=4, max_landmarks=256,
                        image_height=120, image_width=160, pyramid_levels=2,
                        ransac_hypotheses=32, pnp_hypotheses=16,
                        ba_iterations=3, keyframe_min_tracked=10,
                        keyframe_time_lag=4, min_init_matches=15,
                        mapping_tri_keyframes=2, mapping_reobs_keyframes=2)
        K = np.array([[130., 0, 80], [0, 130., 60], [0, 0, 1]], np.float32)
        cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5),
                           Kopt=jnp.asarray(K))
        B, T = 3, 4
        drv = MultiScanDriver(cfg, cam, batch=B, bucket=2)
        scenes = [SpriteScene(np.random.default_rng(20 + b), n_sprites=80)
                  for b in range(B)]
        rv, tv = strafe_trajectory(12, step=0.08)
        for c in range(3):
            imgs = np.stack([
                np.stack([s.render(K, rv[c * T + i], tv[c * T + i], 120, 160)
                          for s in scenes])
                for i in range(T)])                     # [T, B, H, W]
            m = drv.step_chunk(jnp.asarray(imgs))
        status = np.asarray(drv.states.status)
        assert (status == 1).sum() >= 2
        assert (np.asarray(drv.states.pending_map_slot) == -1).all()
        assert np.asarray(m.n_keyframes).max() >= 3

    def test_uint8_staging_matches_f32(self, rng):
        """Fleet frames may be staged uint8 (4x less HBM; the driver casts
        on device).  Integer-valued frames must produce identical engine
        state either way."""
        import jax
        import jax.numpy as jnp
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import CameraParams
        from sfm_tpu.parallel.multiscan import MultiScanDriver
        from render import SpriteScene, strafe_trajectory

        cfg = SfMConfig(max_keypoints=96, max_keyframes=4, max_landmarks=256,
                        image_height=120, image_width=160, pyramid_levels=2,
                        ransac_hypotheses=32, pnp_hypotheses=16,
                        ba_iterations=3, keyframe_min_tracked=10,
                        keyframe_time_lag=4, min_init_matches=15,
                        mapping_tri_keyframes=2, mapping_reobs_keyframes=2)
        K = np.array([[130., 0, 80], [0, 130., 60], [0, 0, 1]], np.float32)
        cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5),
                           Kopt=jnp.asarray(K))
        B, T = 2, 4
        scenes = [SpriteScene(np.random.default_rng(20 + b), n_sprites=80)
                  for b in range(B)]
        rv, tv = strafe_trajectory(8, step=0.08)
        chunks = [np.stack([
            np.stack([np.floor(s.render(K, rv[c * T + i], tv[c * T + i],
                                        120, 160))
                      for s in scenes]) for i in range(T)])
            for c in range(2)]                          # integer-valued f32
        out = []
        for dtype in (np.float32, np.uint8):
            drv = MultiScanDriver(cfg, cam, batch=B, bucket=2)
            for ch in chunks:
                drv.step_chunk(jnp.asarray(ch.astype(dtype)))
            out.append(jax.device_get(drv.states))
        f32_state, u8_state = out
        np.testing.assert_array_equal(np.asarray(u8_state.status),
                                      np.asarray(f32_state.status))
        np.testing.assert_allclose(np.asarray(u8_state.prev.tvec),
                                   np.asarray(f32_state.prev.tvec),
                                   atol=1e-6)

    def test_rgb_fleet_runs_guidance(self, rng):
        """An RGB fleet gets per-scan scan-guidance outputs from the
        tracking-only step (VERDICT r4 missing #4: fleet_tracking_only
        used to no-op guidance)."""
        import jax.numpy as jnp
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import CameraParams
        from sfm_tpu.parallel.multiscan import MultiScanDriver
        from render import SpriteScene, strafe_trajectory

        cfg = SfMConfig(max_keypoints=96, max_keyframes=4, max_landmarks=256,
                        image_height=120, image_width=160, pyramid_levels=2,
                        ransac_hypotheses=32, pnp_hypotheses=16,
                        ba_iterations=3, keyframe_min_tracked=10,
                        keyframe_time_lag=4, min_init_matches=15,
                        mapping_tri_keyframes=2, mapping_reobs_keyframes=2)
        K = np.array([[130., 0, 80], [0, 130., 60], [0, 0, 1]], np.float32)
        cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5),
                           Kopt=jnp.asarray(K))
        B = 2
        drv = MultiScanDriver(cfg, cam, batch=B, bucket=2)
        scenes = [SpriteScene(np.random.default_rng(20 + b), n_sprites=80)
                  for b in range(B)]
        rv, tv = strafe_trajectory(10, step=0.08)
        for i in range(10):
            imgs = np.stack([s.render(K, rv[i], tv[i], 120, 160, rgb=True)
                             for s in scenes])        # [B, H, W, 3]
            m = drv.step(jnp.asarray(imgs))
        assert (np.asarray(m.status) == 1).sum() >= 1
        # guidance produced a nonzero oriented bbox for running scans
        ext = np.asarray(m.guid_bbox_extent)
        run = np.asarray(m.status) == 1
        assert (ext[run].max(axis=1) > 0).any()

    def test_fleet_loop_probe_and_injected_closure(self, rng):
        """probe_loops: the vmapped probe is a no-op on a healthy fleet,
        and an injected detection corrects ONLY the targeted scan (write-
        back isolation) while logging the closure."""
        import jax
        import jax.numpy as jnp
        from sfm_tpu.config import SfMConfig
        from sfm_tpu.engine.state import CameraParams
        from sfm_tpu.engine.loop import LoopProbe
        from sfm_tpu.parallel.multiscan import MultiScanDriver
        from render import SpriteScene, strafe_trajectory

        cfg = SfMConfig(max_keypoints=96, max_keyframes=4, max_landmarks=256,
                        image_height=120, image_width=160, pyramid_levels=2,
                        ransac_hypotheses=32, pnp_hypotheses=16,
                        ba_iterations=3, keyframe_min_tracked=10,
                        keyframe_time_lag=4, min_init_matches=15,
                        mapping_tri_keyframes=2, mapping_reobs_keyframes=2,
                        loop_min_inliers=10, loop_min_drift=0.01)
        K = np.array([[130., 0, 80], [0, 130., 60], [0, 0, 1]], np.float32)
        cam = CameraParams(K=jnp.asarray(K), d=jnp.zeros(5),
                           Kopt=jnp.asarray(K))
        B = 3
        drv = MultiScanDriver(cfg, cam, batch=B, bucket=2)
        scenes = [SpriteScene(np.random.default_rng(20 + b), n_sprites=80)
                  for b in range(B)]
        rv, tv = strafe_trajectory(10, step=0.08)
        for i in range(10):
            imgs = np.stack([s.render(K, rv[i], tv[i], 120, 160)
                             for s in scenes])
            drv.step(jnp.asarray(imgs))
        assert (np.asarray(drv.states.status) == 1).sum() >= 2

        # healthy fleet: the real vmapped probe detects nothing
        assert drv.probe_loops() == []
        assert drv.loop_closures == []

        # inject a detection for scan 1 only: PnP pose = its newest KF
        # pose nudged sideways (drift beyond the gate)
        before = jax.device_get(drv.states)
        fns = np.where(np.asarray(before.kfs.valid),
                       np.asarray(before.kfs.frames.frame_no), -1)
        slots = fns.argmax(axis=1)
        tgt = 1
        rv_t = np.asarray(before.kfs.frames.rvec)[tgt, slots[tgt]]
        tv_t = np.asarray(before.kfs.frames.tvec)[tgt, slots[tgt]]
        N = cfg.max_keypoints
        mk = lambda x: jnp.asarray(np.stack([np.asarray(x, np.float32)] * B))
        probes = LoopProbe(
            ok=jnp.asarray([False, True, False]),
            rvec=mk(rv_t), tvec=mk(tv_t + np.array([0.05, 0, 0])),
            n_inliers=jnp.full((B,), 20, jnp.int32),
            drift=jnp.full((B,), 0.05, jnp.float32),
            links=jnp.full((B, N), -1, jnp.int32),
            min_lm_birth=jnp.zeros((B,), jnp.int32),
            scale=jnp.ones((B,), jnp.float32),
            scale_ok=jnp.zeros((B,), bool),
            n_pairs=jnp.zeros((B,), jnp.int32))
        closed = drv.probe_loops(probes=probes, slots=jnp.asarray(slots))
        assert len(closed) == 1 and closed[0][0] == tgt
        assert drv.loop_closures == closed
        after = jax.device_get(drv.states)
        # untouched scans are bit-identical
        for i in (0, 2):
            np.testing.assert_array_equal(
                np.asarray(after.kfs.frames.tvec)[i],
                np.asarray(before.kfs.frames.tvec)[i])
        # the corrected scan's poses moved
        assert np.abs(np.asarray(after.kfs.frames.tvec)[tgt]
                      - np.asarray(before.kfs.frames.tvec)[tgt]).max() \
            > 1e-4


class TestDistLargeBA:
    def test_parity_with_single_device_large(self, rng):
        import jax.numpy as jnp
        from sfm_tpu.ba.large import build_tables, run_large_ba
        from sfm_tpu.parallel.dist_large_ba import (partition_tables,
                                                    build_dist_large_ba)
        K, rvec, tvec, X, obs = make_ba_scene(rng, n_cams=4, n_pts=64)
        rv0 = rvec.at[1:].add(0.01)
        X0 = X + 0.03
        cam_free = jnp.ones(4, bool).at[0].set(False)
        lm_free = jnp.ones(64, bool)

        tables = build_tables(obs, 4, 64, nmax=64, kmax=4)
        rv_s, tv_s, X_s, st_s = run_large_ba(
            K, rv0, tvec, X0, tables, cam_free=cam_free, lm_free=lm_free,
            iterations=10, cg_iterations=40, tol=0.0)

        mesh = make_mesh(4)
        tabs, shard_size = partition_tables(obs, 4, 64, 4, nmax=64, kmax=4)
        dist = build_dist_large_ba(mesh, "map", n_cams=4,
                                   shard_size=shard_size,
                                   iterations=10, cg_iterations=40)
        rv_d, tv_d, X_d, st_d = dist(K, rv0, tvec, X0, tabs, cam_free,
                                     lm_free)
        assert float(st_d.final_cost) < 1e-2
        np.testing.assert_allclose(np.asarray(rv_d), np.asarray(rv_s),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(X_d), np.asarray(X_s),
                                   atol=5e-3)

    def test_8_shard_convergence(self, rng):
        import jax.numpy as jnp
        from sfm_tpu.ba import Observations
        from sfm_tpu.parallel.dist_large_ba import (partition_tables,
                                                    build_dist_large_ba)
        from synthetic import rodrigues_np, project_np, DEFAULT_K
        n_cams, n_pts = 10, 320
        K = DEFAULT_K
        X = np.stack([rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts),
                      rng.uniform(6, 12, n_pts)], 1).astype(np.float32)
        cam_idx, lm_idx, uvs, rvs, tvs = [], [], [], [], []
        for c in range(n_cams):
            rv = rng.uniform(-0.02, 0.02, 3).astype(np.float32)
            tv = np.array([0.2 * c, 0, 0], np.float32)
            rvs.append(rv); tvs.append(tv)
            sel = rng.choice(n_pts, 160, replace=False)
            uv = project_np(K, rodrigues_np(rv), tv, X[sel]).astype(np.float32)
            cam_idx.append(np.full(160, c)); lm_idx.append(sel); uvs.append(uv)
        obs = Observations(
            jnp.asarray(np.concatenate(cam_idx).astype(np.int32)),
            jnp.asarray(np.concatenate(lm_idx).astype(np.int32)),
            jnp.asarray(np.concatenate(uvs)), jnp.ones(n_cams * 160))
        mesh = make_mesh(8)
        tabs, shard_size = partition_tables(obs, n_cams, n_pts, 8,
                                            nmax=160, kmax=8)
        dist = build_dist_large_ba(mesh, "map", n_cams=n_cams,
                                   shard_size=shard_size,
                                   iterations=10, cg_iterations=30)
        rv0 = jnp.asarray(np.stack(rvs)).at[1:].add(0.01)
        X0 = jnp.asarray(X) + jnp.asarray(
            rng.normal(0, 0.05, X.shape).astype(np.float32))
        cam_free = jnp.ones(n_cams, bool).at[0].set(False)
        rv, tv, Xf, st = dist(K, rv0, jnp.asarray(np.stack(tvs)), X0, tabs,
                              cam_free, jnp.ones(n_pts, bool))
        assert float(st.final_cost) < 1e-3 * float(st.initial_cost)
        np.testing.assert_allclose(np.asarray(rv), np.stack(rvs), atol=2e-3)
