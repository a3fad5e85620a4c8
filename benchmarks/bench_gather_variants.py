"""Microbenchmark: strategies for the large-BA table gathers on TPU.

The implicit-Schur matvec needs x_at = x[lm_cam] with x [C,6] and
lm_cam [L,kmax] (and the symmetric z[cam_lm]).  XLA's row gather of a
skinny [C,6] operand measures ~3.5 GB/s effective — this script races
alternatives to pick the production formulation.
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

REPS = 20


def timed(name, fn, *args):
    try:
        fn_j = jax.jit(fn)
        out = jax.block_until_ready(fn_j(*args))
        t0 = time.time()
        out = jax.block_until_ready(fn_j(*args))
        dt = (time.time() - t0) * 1000.0 / REPS
        print(f"{name:36s} {dt:8.3f} ms/call")
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return float("inf")


def loop(body):
    def fn(x, *rest):
        def b(c, _):
            out = body(x + c, *rest)
            return (out.reshape(-1)[0] * 0).astype(x.dtype), out.reshape(-1)[0]
        return jax.lax.scan(b, jnp.asarray(0, x.dtype), None, length=REPS)[1]
    return fn


def main(C=1000, L=100_000, kmax=6):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, C, (L, kmax)).astype(np.int32))
    idx_sorted = jnp.asarray(np.sort(np.asarray(idx), axis=0))
    W = jnp.asarray(rng.normal(size=(L, kmax, 6, 3)).astype(np.float32))

    print(f"C={C} L={L} kmax={kmax}", file=sys.stderr)

    # 1. plain row gather (current production)
    timed("x[idx]", loop(lambda x_: x_[idx]), x)

    # 2. flat take
    timed("take(flat)", loop(
        lambda x_: jnp.take(x_, idx.reshape(-1), axis=0)), x)

    # 3. one-hot matmul f32
    def onehot_f32(x_):
        E = (idx[..., None] == jnp.arange(C, dtype=jnp.int32)).astype(jnp.float32)
        return jnp.einsum("lkc,ca->lka", E, x_)
    timed("one-hot f32 matmul", onehot_f32 and loop(onehot_f32), x)

    # 4. one-hot bf16 matmul
    def onehot_bf16(x_):
        E = (idx[..., None] == jnp.arange(C, dtype=jnp.int32)).astype(jnp.bfloat16)
        return jnp.einsum("lkc,ca->lka", E, x_.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    timed("one-hot bf16 matmul", loop(onehot_bf16), x)

    # 5. fused one-hot einsum straight into the W contraction
    def onehot_fused(x_):
        E = (idx[..., None] == jnp.arange(C, dtype=jnp.int32)).astype(jnp.float32)
        return jnp.einsum("lkab,lkc,ca->lb", W, E, x_)
    timed("one-hot fused W einsum", loop(onehot_fused), x)

    # 6. padded operand: x embedded in [C, 128] rows
    xpad = jnp.zeros((C, 128), jnp.float32).at[:, :6].set(x)
    timed("x128[idx][..., :6]", loop(
        lambda x_: x_[idx][..., :6]), xpad)

    # 7. gather padded to 8 lanes
    xpad8 = jnp.zeros((C, 8), jnp.float32).at[:, :6].set(x)
    timed("x8[idx][..., :6]", loop(lambda x_: x_[idx][..., :6]), xpad8)

    # 8. sorted indices (locality)
    timed("x[idx_sorted]", loop(lambda x_: x_[idx_sorted]), x)

    # 9. transposed operand gather on lanes: xT [6, C] -> take along axis 1
    xT = x.T  # [6, C]
    def lane_gather(xT_):
        # out[a, l, k] = xT[a, idx[l,k]]
        return jnp.take(xT_, idx.reshape(-1), axis=1)
    timed("take(xT, axis=1)", loop(lane_gather), xT)

    # 10. full matvec half via camera-major broadcast (no gather at all):
    # q[c,j] = W_c[c,j]^T x[c] — the broadcast direction for reference
    nmax = (L * kmax) // C
    Wc = jnp.asarray(rng.normal(size=(C, nmax, 6, 3)).astype(np.float32))
    timed("broadcast einsum (no gather)", loop(
        lambda x_: jnp.einsum("cjab,ca->cjb", Wc, x_)), x)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
