"""Component attribution for the large-BA LM iteration: linearize vs one
CG matvec vs preconditioner.  Loops each on-device via lax.scan with a salt
so XLA cannot hoist."""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from sfm_tpu.ba import Observations
from sfm_tpu.ba.core import inv3_sym, _damp
from sfm_tpu.ba.large import build_tables, _blocks_in_layout, _lm_self, \
    _cam_self
from sfm_tpu.geometry.rotations import exp_so3

REPS = 20


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.time()
    out = jax.block_until_ready(fn_j(*args))
    dt = (time.time() - t0) * 1000.0 / REPS
    print(f"{name:28s} {dt:8.3f} ms/call")
    return dt


def main(n_cams=1000, n_lms=100_000, obs_per_lm=6):
    rng = np.random.default_rng(0)
    X = np.stack([rng.uniform(-50, 50, n_lms), rng.uniform(-10, 10, n_lms),
                  rng.uniform(20, 60, n_lms)], 1).astype(np.float32)
    K = np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]], np.float32)
    cam_t = np.stack([np.linspace(-40, 40, n_cams),
                      np.zeros(n_cams), np.zeros(n_cams)], 1).astype(np.float32)
    base = rng.integers(0, n_cams - obs_per_lm, n_lms)
    lm_idx = np.repeat(np.arange(n_lms), obs_per_lm).astype(np.int32)
    cam_idx = (base[:, None] + np.arange(obs_per_lm)[None, :]).reshape(-1)
    cam_idx = cam_idx.astype(np.int32)
    p = X[lm_idx] + cam_t[cam_idx]
    uv = (p[:, :2] / p[:, 2:]) * 525.0 + np.array([320.0, 240.0])
    obs = Observations(jnp.asarray(cam_idx), jnp.asarray(lm_idx),
                       jnp.asarray(uv.astype(np.float32)),
                       jnp.ones(len(cam_idx), jnp.float32))
    nmax = int(np.bincount(cam_idx, minlength=n_cams).max())
    tables = build_tables(obs, n_cams, n_lms, nmax=nmax, kmax=obs_per_lm)
    print(f"C={n_cams} L={n_lms} kmax={obs_per_lm} nmax={nmax}",
          file=sys.stderr)

    C, L = n_cams, n_lms
    rvec = jnp.zeros((C, 3)).at[1:].add(0.002)
    tvec = jnp.asarray(cam_t)
    xyz = jnp.asarray(X)
    Kj = jnp.asarray(K)
    cam_free_f = jnp.ones(C, jnp.float32)
    lm_free_f = jnp.ones(L, jnp.float32)
    lam = jnp.float32(1e-3)

    def linearize(rvec, tvec, xyz):
        R = exp_so3(rvec)
        r_l, A_l, B_l, rw_l, w_l = _blocks_in_layout(
            Kj, R, tvec, xyz, tables.lm_cam, _lm_self(L, tables.lm_cam),
            tables.lm_uv, tables.lm_w, cam_free_f, lm_free_f, 0.0)
        r_c, A_c, B_c, rw_c, w_c = _blocks_in_layout(
            Kj, R, tvec, xyz, _cam_self(C, tables.cam_lm), tables.cam_lm,
            tables.cam_uv, tables.cam_w, cam_free_f, lm_free_f, 0.0)
        U = jnp.einsum("cjia,cjib->cab", A_c, A_c)
        g_cam = -jnp.einsum("cjia,cji->ca", A_c, rw_c)
        V = jnp.einsum("lkia,lkib->lab", B_l, B_l)
        g_lm = -jnp.einsum("lkia,lki->la", B_l, rw_l)
        W_l = jnp.einsum("lkia,lkib->lkab", A_l, B_l)
        W_c = jnp.einsum("cjia,cjib->cjab", A_c, B_c)
        cost = jnp.sum(jnp.sum(r_l * r_l, -1) * w_l)
        return (U, V, W_l, W_c, g_cam, g_lm), cost

    def lin_loop(rv):
        def body(c, _):
            blocks, cost = linearize(rv + c, tvec, xyz)
            return cost * 0, cost
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("linearize", lin_loop, rvec)

    blocks, cost = jax.jit(linearize)(rvec, tvec, xyz)
    U, V, W_l, W_c, g_cam, g_lm = jax.block_until_ready(blocks)
    Vinv = inv3_sym(_damp(V, lam))

    def matvec(x):
        Ux = jnp.einsum("cab,cb->ca", _damp(U, lam), x)
        x_at = x[tables.lm_cam]
        t = jnp.einsum("lkab,lka->lb", W_l, x_at)
        z = jnp.einsum("lab,lb->la", Vinv, t)
        z_at = z[tables.cam_lm]
        y = jnp.einsum("cjab,cjb->ca", W_c, z_at)
        return Ux - y

    def mv_loop(x0):
        def body(c, _):
            y = matvec(x0 + c)
            return jnp.sum(y) * 0, y[0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("matvec (full)", mv_loop, g_cam)

    def wl_half(x0):
        def body(c, _):
            x_at = (x0 + c)[tables.lm_cam]
            t = jnp.einsum("lkab,lka->lb", W_l, x_at)
            return jnp.sum(t) * 0, t[0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("  W_l^T x (lm-major)", wl_half, g_cam)

    z0 = jnp.einsum("lab,lb->la", Vinv,
                    jnp.einsum("lkab,lka->lb", W_l, g_cam[tables.lm_cam]))

    def wc_half(z):
        def body(c, _):
            z_at = (z + c)[tables.cam_lm]
            y = jnp.einsum("cjab,cjb->ca", W_c, z_at)
            return jnp.sum(y) * 0, y[0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("  W_c z (cam-major)", wc_half, z0)

    def vinv_loop(t):
        def body(c, _):
            z = jnp.einsum("lab,lb->la", Vinv, t + c)
            return jnp.sum(z) * 0, z[0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("  Vinv t", vinv_loop, g_lm)

    def gather_l(x0):
        def body(c, _):
            x_at = (x0 + c)[tables.lm_cam]
            return jnp.sum(x_at) * 0, x_at[0, 0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("  gather x[lm_cam]", gather_l, g_cam)

    def gather_c(z):
        def body(c, _):
            z_at = (z + c)[tables.cam_lm]
            return jnp.sum(z_at) * 0, z_at[0, 0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("  gather z[cam_lm]", gather_c, z0)

    def inv6_loop(u):
        def body(c, _):
            M = jnp.linalg.inv(u + c + 1e-6 * jnp.eye(6))
            return jnp.sum(M) * 0, M[0, 0, 0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("precond inv6 [C,6,6]", inv6_loop, _damp(U, lam))

    def vinv3_loop(v):
        def body(c, _):
            M = inv3_sym(_damp(v + c, lam))
            return jnp.sum(M) * 0, M[0, 0, 0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("Vinv build [L,3,3]", vinv3_loop, V)

    # one-hot MXU formulations (candidate production path)
    E_idx = tables.lm_cam

    def onehot_t(x0):
        def body(c, _):
            E = (E_idx[..., None] ==
                 jnp.arange(n_cams, dtype=jnp.int32)).astype(jnp.float32)
            t = jnp.einsum("lkab,lkc,ca->lb", W_l, E, x0 + c)
            return jnp.sum(t) * 0, t[0, 0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("  onehot W_l^T x", onehot_t, g_cam)

    def onehot_y(z):
        def body(c, _):
            E = (E_idx[..., None] ==
                 jnp.arange(n_cams, dtype=jnp.int32)).astype(jnp.float32)
            y = jnp.einsum("lkab,lb,lkc->ca", W_l, z + c, E)
            return jnp.sum(y) * 0, y[0, 0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("  onehot W z scatter", onehot_y, z0)

    def onehot_matvec(x0):
        def body(c, _):
            x = x0 + c
            E = (E_idx[..., None] ==
                 jnp.arange(n_cams, dtype=jnp.int32)).astype(jnp.float32)
            Ux = jnp.einsum("cab,cb->ca", _damp(U, lam), x)
            t = jnp.einsum("lkab,lkc,ca->lb", W_l, E, x)
            z = jnp.einsum("lab,lb->la", Vinv, t)
            y = jnp.einsum("lkab,lb,lkc->ca", W_l, z, E)
            return jnp.sum(y) * 0, (Ux - y)[0, 0]
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[1]
    timed("matvec (onehot full)", onehot_matvec, g_cam)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
