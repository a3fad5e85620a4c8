"""Microbench of the fused Pallas Schur matvec kernel vs the XLA one-hot
coupling ops, at the large-BA operating shapes.  Times one apply
(t -> z -> y) and the XLA equivalent."""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from sfm_tpu.ba.schur_pallas import SchurOperator
from sfm_tpu.ba.large import make_coupling_ops, ObsTables


def timed(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) * 1000.0 / reps
    print(f"{name:36s} {dt:8.3f} ms")
    return out


def main(C=1000, L=100_000, kmax=6, tile=256):
    rng = np.random.default_rng(0)
    lm_cam = (rng.integers(0, C - kmax, L)[:, None]
              + np.arange(kmax)[None, :]).astype(np.int32)
    W = rng.normal(0, 1, (L, kmax, 6, 3)).astype(np.float32)
    Vinv = np.broadcast_to(np.eye(3, dtype=np.float32), (L, 3, 3)).copy()
    x = rng.normal(0, 1, (C, 6)).astype(np.float32)

    Wj = jnp.asarray(W)
    lmj = jnp.asarray(lm_cam)
    Vj = jnp.asarray(Vinv)
    xj = jnp.asarray(x)

    # pallas operator (pack cost measured separately)
    def make_op():
        op = SchurOperator(Wj, lmj, tile=tile)
        op.set_vinv(Vj)
        return op.wt, op.cams_t, op.vinv_t

    wt, cams_t, vinv_t = timed("pack (W + Vinv + cams)", jax.jit(make_op))
    op = SchurOperator(Wj, lmj, tile=tile)
    op.set_vinv(Vj)
    op.wt, op.cams_t, op.vinv_t = wt, cams_t, vinv_t

    timed("pallas apply (closure args)",
          jax.jit(lambda v: op.w_vinv_wt_x(v)), xj)

    # raw kernels on pre-packed explicit args (the real solver's shape:
    # everything is a traced value, not a closed-over constant)
    from sfm_tpu.ba.schur_pallas import schur_gather, schur_scatter
    xp = jax.block_until_ready(jax.jit(op._pad_x)(xj))

    def raw(cams_t, wt, vinv_t, g_t, x_pad):
        z_t = schur_gather(cams_t, wt, vinv_t, g_t, x_pad, kmax=kmax)
        return schur_scatter(cams_t, wt, z_t, kmax=kmax,
                             n_cams_pad=x_pad.shape[1])

    timed("raw gather+scatter (explicit args)", jax.jit(raw),
          op.cams_t, op.wt, op.vinv_t, op._zeros_g, xp)

    # canonical-layout copies of the packed tables (host roundtrip):
    # isolates device-layout effects of the pack transpose
    canon = [jnp.asarray(np.asarray(a))
             for a in (op.cams_t, op.wt, op.vinv_t, op._zeros_g, xp)]
    timed("raw gather+scatter (canonical layout)", jax.jit(raw), *canon)

    # XLA one-hot path
    tabs = ObsTables(lm_cam=lmj, lm_uv=None, lm_w=None, cam_lm=None,
                     cam_uv=None, cam_w=None)
    wT_x, w_z, _ = make_coupling_ops(tabs, C)

    def xla_apply(x):
        t = wT_x(Wj, x)
        z = jnp.einsum("lab,lb->la", Vj, t)
        return w_z(Wj, None, z)

    timed("xla one-hot apply", jax.jit(xla_apply), xj)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
