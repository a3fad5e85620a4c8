"""Parity tests for the fused Pallas linearization (ba/linearize_pallas.py)
against the XLA dual-layout path, in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.ba.large import (ObsTables, build_tables, run_large_ba,
                              _blocks_lm_major, _blocks_cam_major)
from sfm_tpu.ba.linearize_pallas import (build_lin_tables, fused_blocks,
                                         damped_vinv_tiled)
from sfm_tpu.ba.schur_pallas import SchurPlan, unpack_lm_tiles
from sfm_tpu.ba.core import inv3_sym, _damp
from sfm_tpu.geometry.rotations import exp_so3
from test_ba import make_ba_scene


def _xla_linearize(K, rvec, tvec, X, tables, cam_free_f, lm_free_f,
                   huber_delta=0.0):
    R = exp_so3(rvec)
    r_l, A_l, B_l, rw_l, w_l = _blocks_lm_major(
        K, R, tvec, X, tables, cam_free_f, lm_free_f, huber_delta)
    r_c, A_c, B_c, rw_c, w_c = _blocks_cam_major(
        K, R, tvec, X, tables, cam_free_f, lm_free_f, huber_delta)
    U = jnp.sum(A_c[..., :, None] * A_c[..., None, :], axis=(1, 2))
    g_cam = -jnp.sum(A_c * rw_c[..., None], axis=(1, 2))
    V = jnp.sum(B_l[..., :, None] * B_l[..., None, :], axis=(1, 2))
    g_lm = -jnp.sum(B_l * rw_l[..., None], axis=(1, 2))
    W_l = jnp.sum(A_l[..., :, None] * B_l[..., None, :], axis=2)
    cost = jnp.sum(jnp.sum(r_l * r_l, -1) * w_l)
    return U, V, W_l, g_cam, g_lm, cost


def _run_fused(K, rvec, tvec, X, tables, n_cams, cam_free_f, lm_free_f,
               tile=16, huber_delta=0.0, plan=None):
    kw = {}
    if plan is not None:
        kw = dict(base=plan.base, window=plan.window,
                  pad_width=plan.pad_width)
    lt = build_lin_tables(tables.lm_cam, tables.lm_uv, tables.lm_w,
                          n_cams, tile=tile, **kw)
    R = exp_so3(rvec)
    return fused_blocks(K, R, tvec, X, lm_free_f, cam_free_f, lt,
                        huber_delta=huber_delta, interpret=True), lt


class TestFusedLinearize:
    def _check(self, rng, huber_delta=0.0, use_plan=False, free_mask=False,
               n_cams=5, n_pts=70, kmax=4):
        K, rvec, tvec, X, obs = make_ba_scene(rng, n_cams=n_cams,
                                              n_pts=n_pts)
        rvec = rvec.at[1:].add(0.01)
        X = X + 0.02
        tables = build_tables(obs, n_cams, n_pts, nmax=128, kmax=kmax)
        cam_free_f = jnp.ones(n_cams)
        lm_free_f = jnp.ones(n_pts)
        if free_mask:
            cam_free_f = cam_free_f.at[0].set(0.0)
            lm_free_f = lm_free_f.at[::7].set(0.0)
        plan = None
        if use_plan:
            plan = SchurPlan(tables.lm_cam, tables.lm_w, n_cams, tile=16)
            perm = jnp.asarray(plan.perm)
            tables = ObsTables(
                lm_cam=tables.lm_cam[perm], lm_uv=tables.lm_uv[perm],
                lm_w=tables.lm_w[perm], cam_lm=tables.cam_lm,
                cam_uv=tables.cam_uv, cam_w=tables.cam_w)
            X = X[perm]
            lm_free_f = lm_free_f[perm]

        U_x, V_x, W_x, gc_x, gl_x, cost_x = _xla_linearize(
            K, rvec, tvec, X, tables, cam_free_f, lm_free_f, huber_delta)
        (wt, vg_t, U_f, gc_f, cost_f), lt = _run_fused(
            K, rvec, tvec, X, tables, n_cams, cam_free_f, lm_free_f,
            huber_delta=huber_delta, plan=plan)

        # tolerances scale with the matrix norm: the bf16x3 one-hot dots
        # carry ~1e-7 relative error of the LARGEST element, which shows
        # up as larger relative error on small cancelling entries
        def close(a, b):
            a, b = np.asarray(a), np.asarray(b)
            tol = 1e-5 * max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=tol)

        close(U_f, U_x)
        close(gc_f, gc_x)
        np.testing.assert_allclose(float(cost_f), float(cost_x), rtol=1e-5)
        # V rows 0..8 / g rows 9..11 of vg_t
        L = n_pts
        V_f = unpack_lm_tiles(vg_t[:, :9], L).reshape(L, 3, 3)
        g_f = unpack_lm_tiles(vg_t[:, 9:12], L)
        close(V_f, V_x)
        close(g_f, gl_x)
        # wt layout: wt[iT, c, k*8+r, j] = W[iT*tile+j, k, r, c]
        kmax = tables.lm_cam.shape[1]
        W_f = np.zeros((L, kmax, 6, 3), np.float32)
        wt_n = np.asarray(wt)
        tile = lt.tile
        for l in range(L):
            iT, j = l // tile, l % tile
            for k in range(kmax):
                for r in range(6):
                    for c in range(3):
                        W_f[l, k, r, c] = wt_n[iT, c, k * 8 + r, j]
        close(W_f, W_x)

    def test_parity_plain(self, rng):
        self._check(rng)

    def test_parity_huber_freemask(self, rng):
        self._check(rng, huber_delta=1.5, free_mask=True)

    def test_parity_with_plan(self, rng):
        self._check(rng, use_plan=True)

    def test_parity_kmax16(self, rng):
        """The engine default is ba_kmax=16: every landmark here is seen
        by 12 cameras, so observation slots 8..11 are live.  Catches the
        8-row cams BlockSpec clamp (ADVICE round 2, high: slots >= 8 read
        row 7's camera and corrupt U/g_cam/cost)."""
        self._check(rng, n_cams=12, n_pts=40, kmax=16)

    def test_parity_kmax16_with_plan(self, rng):
        self._check(rng, n_cams=12, n_pts=40, kmax=16, use_plan=True)

    def test_damped_vinv_tiled(self, rng):
        L = 37
        Vs = rng.normal(0, 1, (L, 3, 3)).astype(np.float32)
        V = np.einsum("lab,lcb->lac", Vs, Vs) + np.eye(3, dtype=np.float32)
        from sfm_tpu.ba.schur_pallas import pack_lm_tiles
        vg_t = pack_lm_tiles(jnp.asarray(V.reshape(L, 9)), 16, pad_rows=16)
        lam = 0.37
        got_t = damped_vinv_tiled(vg_t, lam)
        got = unpack_lm_tiles(got_t[:, :9], L).reshape(L, 3, 3)
        want = inv3_sym(_damp(jnp.asarray(V), lam))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestFusedSolver:
    def test_solver_parity(self, rng):
        """run_large_ba with fused_linearize matches the XLA-linearize
        Pallas path on a small problem (interpret mode)."""
        n_cams, n_pts = 4, 60
        K, rvec, tvec, X, obs = make_ba_scene(rng, n_cams=n_cams,
                                              n_pts=n_pts)
        # perturb only the FREE cameras (2+): cams 0/1 are frozen below
        # and must stay at their true poses for zero cost to be reachable
        rv0 = rvec.at[2:].add(0.01)
        X0 = X + 0.03
        # fix TWO cameras: one pins the pose gauge, the second the
        # monocular scale gauge (else both solvers reach equally valid
        # optima that differ by a global scale)
        cam_free = jnp.ones(n_cams, bool).at[0].set(False).at[1].set(False)
        lm_free = jnp.ones(n_pts, bool)
        tables = build_tables(obs, n_cams, n_pts, nmax=64, kmax=4)
        plan = SchurPlan(tables.lm_cam, tables.lm_w, n_cams, tile=16)
        kw = dict(cam_free=cam_free, lm_free=lm_free, iterations=10,
                  cg_iterations=30, pallas_matvec=True, pallas_tile=16,
                  pallas_interpret=True, schur_plan=plan)
        rv_a, tv_a, X_a, st_a = run_large_ba(K, rv0, tvec, X0, tables, **kw)
        rv_b, tv_b, X_b, st_b = run_large_ba(K, rv0, tvec, X0, tables,
                                             fused_linearize=True, **kw)
        assert float(st_b.final_cost) < 1e-2
        np.testing.assert_allclose(np.asarray(rv_b), np.asarray(rv_a),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(X_b), np.asarray(X_a),
                                   atol=1e-2)
