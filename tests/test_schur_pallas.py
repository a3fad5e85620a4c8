"""Parity tests for the fused Pallas implicit-Schur matvec
(sfm_tpu/ba/schur_pallas.py) against the plain-XLA one-hot formulation,
run in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_tpu.ba.large import build_tables, run_large_ba
from sfm_tpu.ba.residuals import Observations
from sfm_tpu.ba.schur_pallas import SchurOperator, pack_lm_tiles, \
    unpack_lm_tiles


def _random_problem(rng, C=7, L=41, kmax=3):
    lm_cam = rng.integers(0, C, (L, kmax)).astype(np.int32)
    W = rng.normal(0, 1, (L, kmax, 6, 3)).astype(np.float32)
    # zero out some slots like table padding does
    dead = rng.random((L, kmax)) < 0.3
    W[dead] = 0.0
    Vs = rng.normal(0, 1, (L, 3, 3)).astype(np.float32)
    Vinv = np.einsum("lab,lcb->lac", Vs, Vs) + np.eye(3, dtype=np.float32)
    x = rng.normal(0, 1, (C, 6)).astype(np.float32)
    g = rng.normal(0, 1, (L, 3)).astype(np.float32)
    return lm_cam, W, Vinv, x, g


def _reference(lm_cam, W, Vinv, x, g):
    t = np.einsum("lkab,lka->lb", W.transpose(0, 1, 3, 2).transpose(
        0, 1, 3, 2), x[lm_cam])          # [L,3] = sum_k W^T x
    t = np.einsum("lkab,lkb->lka", W.transpose(0, 1, 3, 2), x[lm_cam]).sum(1)
    z = np.einsum("lab,lb->la", Vinv, t + g)
    y = np.zeros_like(x)
    L, kmax = lm_cam.shape
    for l in range(L):
        for k in range(kmax):
            y[lm_cam[l, k]] += W[l, k] @ z[l]
    return y, z


def test_pack_unpack_roundtrip(rng):
    arr = rng.normal(0, 1, (37, 5)).astype(np.float32)
    tiled = pack_lm_tiles(jnp.asarray(arr), 16)
    assert tiled.shape == (3, 5, 16)
    back = unpack_lm_tiles(tiled, 37)
    np.testing.assert_array_equal(np.asarray(back), arr)


def test_schur_operator_parity(rng):
    lm_cam, W, Vinv, x, g = _random_problem(rng)
    y_ref, z_ref = _reference(lm_cam, W, Vinv, x, g)

    op = SchurOperator(jnp.asarray(W), jnp.asarray(lm_cam), tile=16,
                       interpret=True)
    op.set_vinv(jnp.asarray(Vinv))

    # matvec direction (g = 0)
    y0, _ = _reference(lm_cam, W, Vinv, x, np.zeros_like(g))
    got = np.asarray(op.w_vinv_wt_x(jnp.asarray(x)))
    np.testing.assert_allclose(got, y0, rtol=2e-4, atol=2e-4)

    # rhs direction (x = 0)
    y1, _ = _reference(lm_cam, W, Vinv, np.zeros_like(x), g)
    got = np.asarray(op.w_vinv_g(jnp.asarray(g), x.shape[0]))
    np.testing.assert_allclose(got, y1, rtol=2e-4, atol=2e-4)

    # back-substitution: Vinv (g - W^T d)
    _, z2 = _reference(lm_cam, W, Vinv, -x, g)
    got = np.asarray(op.back_substitute(jnp.asarray(g), jnp.asarray(x)))
    np.testing.assert_allclose(got, z2, rtol=2e-4, atol=2e-4)


def test_schur_operator_parity_kmax16(rng):
    """kmax > 8: the packed cams table has kmax rows and the kernel block
    must span them all — a fixed 8-row block clamps slots 8..15 onto row 7
    and applies the wrong camera (ADVICE round 2, high)."""
    lm_cam, W, Vinv, x, g = _random_problem(rng, C=20, L=30, kmax=16)
    op = SchurOperator(jnp.asarray(W), jnp.asarray(lm_cam), tile=16,
                       interpret=True)
    op.set_vinv(jnp.asarray(Vinv))
    y_ref, z_ref = _reference(lm_cam, W, Vinv, x, np.zeros_like(g))
    got = np.asarray(op.w_vinv_wt_x(jnp.asarray(x)))
    np.testing.assert_allclose(got, y_ref, rtol=2e-4, atol=2e-4)
    _, z2 = _reference(lm_cam, W, Vinv, -x, g)
    got = np.asarray(op.back_substitute(jnp.asarray(g), jnp.asarray(x)))
    np.testing.assert_allclose(got, z2, rtol=2e-4, atol=2e-4)


def _tiny_ba_problem(rng, n_cams=5, n_lms=60, obs_per_lm=3):
    X = np.stack([rng.uniform(-2, 2, n_lms), rng.uniform(-2, 2, n_lms),
                  rng.uniform(4, 8, n_lms)], 1).astype(np.float32)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], np.float32)
    cam_t = np.stack([np.linspace(-1, 1, n_cams), np.zeros(n_cams),
                      np.zeros(n_cams)], 1).astype(np.float32)
    base = rng.integers(0, n_cams - obs_per_lm + 1, n_lms)
    lm_idx = np.repeat(np.arange(n_lms), obs_per_lm).astype(np.int32)
    cam_idx = (base[:, None] + np.arange(obs_per_lm)[None, :]) \
        .reshape(-1).astype(np.int32)
    p = X[lm_idx] + cam_t[cam_idx]
    uv = (p[:, :2] / p[:, 2:]) * 100.0 + np.array([64.0, 48.0])
    obs = Observations(jnp.asarray(cam_idx), jnp.asarray(lm_idx),
                       jnp.asarray(uv.astype(np.float32)),
                       jnp.ones(len(cam_idx), jnp.float32))
    nmax = int(np.bincount(cam_idx, minlength=n_cams).max())
    tables = build_tables(obs, n_cams, n_lms, nmax=nmax, kmax=obs_per_lm)
    rv0 = jnp.zeros((n_cams, 3)).at[1:].add(0.01)
    tv0 = jnp.asarray(cam_t)
    X0 = jnp.asarray(X + rng.normal(0, 0.02, X.shape).astype(np.float32))
    cam_free = jnp.ones(n_cams, bool).at[0].set(False)
    lm_free = jnp.ones(n_lms, bool)
    return K, rv0, tv0, X0, tables, cam_free, lm_free


def test_run_large_ba_pallas_converges(rng):
    K, rv0, tv0, X0, tables, cam_free, lm_free = _tiny_ba_problem(rng)
    # exact mode (bf16x3 splits reproduce f32): kernel-correctness parity
    rv, tv, X, stats = run_large_ba(
        jnp.asarray(K), rv0, tv0, X0, tables, cam_free=cam_free,
        lm_free=lm_free, iterations=6, cg_iterations=10, tol=0.0,
        pallas_matvec=True, pallas_tile=16, pallas_precision="bf16x3",
        pallas_interpret=True)
    assert float(stats.final_cost) < 1e-2 * float(stats.initial_cost)
    # matches the plain-XLA path's result
    rv2, tv2, X2, stats2 = run_large_ba(
        jnp.asarray(K), rv0, tv0, X0, tables, cam_free=cam_free,
        lm_free=lm_free, iterations=6, cg_iterations=10, tol=0.0)
    np.testing.assert_allclose(np.asarray(tv), np.asarray(tv2),
                               rtol=1e-3, atol=1e-3)
    # the performance default (bf16 camera-vector operand) perturbs CG
    # search directions only — it must still converge to the same cost
    # basin (LM accept/reject uses exact f32 costs)
    _, _, _, stats_b = run_large_ba(
        jnp.asarray(K), rv0, tv0, X0, tables, cam_free=cam_free,
        lm_free=lm_free, iterations=6, cg_iterations=10, tol=0.0,
        pallas_matvec=True, pallas_tile=16, pallas_interpret=True)
    assert float(stats_b.final_cost) < 1e-2 * float(stats_b.initial_cost)


def test_schur_operator_windowed_parity(rng):
    """Windowed plan (camera-locality sort) must be exact: same apply
    results as the full-window operator, on a problem WITH locality."""
    from sfm_tpu.ba.schur_pallas import SchurPlan
    C, L, kmax = 23, 57, 3
    base_cam = rng.integers(0, C - kmax + 1, L)
    lm_cam = (base_cam[:, None] + np.arange(kmax)[None, :]).astype(np.int32)
    W = rng.normal(0, 1, (L, kmax, 6, 3)).astype(np.float32)
    lm_w = np.ones((L, kmax), np.float32)
    dead = rng.random((L, kmax)) < 0.2
    W[dead] = 0.0
    Vs = rng.normal(0, 1, (L, 3, 3)).astype(np.float32)
    Vinv = np.einsum("lab,lcb->lac", Vs, Vs) + np.eye(3, dtype=np.float32)
    x = rng.normal(0, 1, (C, 6)).astype(np.float32)
    g = rng.normal(0, 1, (L, 3)).astype(np.float32)
    y_ref, _ = _reference(lm_cam, W, Vinv, x, np.zeros_like(g))

    plan = SchurPlan(lm_cam, lm_w, C, tile=16)
    p = plan.perm
    op = SchurOperator(jnp.asarray(W[p]), jnp.asarray(lm_cam[p]), tile=16,
                       interpret=True, base=plan.base, window=plan.window,
                       pad_width=plan.pad_width)
    op.set_vinv(jnp.asarray(Vinv[p]))
    got = np.asarray(op.w_vinv_wt_x(jnp.asarray(x)))
    np.testing.assert_allclose(got, y_ref, rtol=2e-4, atol=2e-4)
    # back-substitution returns landmark-major (permuted) order
    _, z_ref = _reference(lm_cam, W, Vinv, -x, g)
    got_z = np.asarray(op.back_substitute(jnp.asarray(g[p]),
                                          jnp.asarray(x)))
    np.testing.assert_allclose(got_z, z_ref[p], rtol=2e-4, atol=2e-4)


def test_run_large_ba_with_plan(rng):
    """End-to-end: run_large_ba with a SchurPlan equals the no-plan
    pallas path and converges (permutation round-trips xyz)."""
    from sfm_tpu.ba.schur_pallas import SchurPlan
    K, rv0, tv0, X0, tables, cam_free, lm_free = _tiny_ba_problem(rng)
    plan = SchurPlan(tables.lm_cam, tables.lm_w, 5, tile=16)
    assert plan.window <= plan.pad_width
    rv, tv, X, stats = run_large_ba(
        jnp.asarray(K), rv0, tv0, X0, tables, cam_free=cam_free,
        lm_free=lm_free, iterations=6, cg_iterations=10, tol=0.0,
        pallas_matvec=True, pallas_tile=16, pallas_precision="bf16x3",
        pallas_interpret=True, schur_plan=plan)
    assert float(stats.final_cost) < 1e-2 * float(stats.initial_cost)
    rv2, tv2, X2, _ = run_large_ba(
        jnp.asarray(K), rv0, tv0, X0, tables, cam_free=cam_free,
        lm_free=lm_free, iterations=6, cg_iterations=10, tol=0.0,
        pallas_matvec=True, pallas_tile=16, pallas_precision="bf16x3",
        pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(tv), np.asarray(tv2),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X2),
                               rtol=1e-2, atol=1e-2)
