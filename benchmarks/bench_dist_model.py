"""Measure the inputs of the distributed-BA scaling model (VERDICT round 2
item 8): single-chip wall time of one implicit-Schur CG application and
one fused linearization at the POD operating point's per-shard sizes
(BASELINE: 5k keyframes / 1M landmarks, landmark-sharded over N chips,
camera poses replicated).

Per CG iteration the only cross-shard traffic is one psum of the [C, 6]
f32 partial (24*C bytes); per LM iteration, linearization adds one psum
of U [C,6,6] + g_cam [C,6] + cost (168*C + 4 bytes).  Everything else is
shard-local (parallel/dist_large_ba.py:103-127).  Combining the measured
shard-local compute with an ICI all-reduce model yields the predicted
scaling-efficiency curve recorded in docs/DIST_BA_SCALING.md.

python benchmarks/bench_dist_model.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from sfm_tpu.ba.linearize_pallas import (build_lin_tables, fused_blocks,
                                         damped_vinv_tiled)
from sfm_tpu.ba.schur_pallas import SchurOperator, SchurPlan, pack_lm_tiles
from sfm_tpu.geometry.rotations import exp_so3

C = 5120            # pod config: ~5k keyframes, replicated
KMAX = 8
TILE = 2048


def make_shard(rng, L):
    """A shard-local synthetic problem with realistic camera locality:
    each landmark is seen by KMAX consecutive cameras around a home
    camera proportional to its index (serpentine-scan structure).  The
    landmark-major tables are constructed directly (every landmark has
    exactly KMAX observations) — build_lm_tables_device is general
    scatter machinery and takes minutes at this scale on one chip."""
    home = (np.arange(L) * (C - KMAX) // L).astype(np.int32)
    lm_cam = home[:, None] + np.arange(KMAX)[None, :].astype(np.int32)
    lm_uv = rng.uniform(0, 640, (L, KMAX, 2)).astype(np.float32)
    lm_w = np.ones((L, KMAX), np.float32)
    return lm_cam, lm_uv, lm_w


def bench_shard(L):
    rng = np.random.default_rng(0)
    t0 = time.time()
    lm_cam, lm_uv, lm_w = make_shard(rng, L)
    print(f"L={L}: tables built in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    K = jnp.asarray(np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]],
                             np.float32))
    rvec = jnp.asarray(rng.normal(0, 0.05, (C, 3)).astype(np.float32))
    tvec = jnp.asarray(rng.normal(0, 0.5, (C, 3)).astype(np.float32))
    xyz = jnp.asarray(np.stack([rng.uniform(-5, 5, L), rng.uniform(-5, 5, L),
                                rng.uniform(5, 10, L)], 1).astype(np.float32))
    plan = SchurPlan(lm_cam, lm_w, C, tile=TILE)
    perm = plan.perm
    lt = build_lin_tables(jnp.asarray(lm_cam[perm]),
                          jnp.asarray(lm_uv[perm]),
                          jnp.asarray(lm_w[perm]), C, tile=TILE,
                          base=plan.base, window=plan.window,
                          pad_width=plan.pad_width)
    R = exp_so3(rvec)
    ones_c, ones_l = jnp.ones(C), jnp.ones(L)
    print(f"L={L}: plan built in {time.time()-t0:.1f}s "
          f"(window {plan.window})", file=sys.stderr, flush=True)

    xyz_p = xyz[jnp.asarray(perm)]

    @jax.jit
    def lin(salt):
        # the salt chains reps so a lazy/deduping executor cannot skip any
        return fused_blocks(K, R, tvec, xyz_p + salt, ones_l, ones_c, lt)

    t0 = time.time()
    wt, vg_t, U, g_cam, cost = jax.block_until_ready(lin(0.0))
    _ = np.asarray(cost)
    print(f"L={L}: linearize compiled+run in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    # timing note (round 4): on the tunneled device, block_until_ready
    # does NOT reliably force execution — a small d2h fetch INSIDE the
    # timed region does, and reps must be CHAINED so a lazy executor
    # cannot collapse them.  Without this the loop measured ~25 ms/op
    # for every problem size (the tunnel's round trip, not compute).
    REPS = 20
    t0 = time.time()
    c = cost * 0.0
    for _ in range(REPS):
        out = lin(c * 1e-30)
        c = out[4]
    _ = np.asarray(c)             # forces the queued chain
    t_lin = (time.time() - t0) / REPS

    op = SchurOperator.from_packed(
        wt, lt.cams_t, lt.base_t, L=L, kmax=KMAX, tile=TILE,
        window=lt.window, pad_width=lt.pad_width)
    op.vinv_t = damped_vinv_tiled(vg_t, 1e-3)
    x = jnp.asarray(rng.normal(0, 1, (C, 6)).astype(np.float32))

    @jax.jit
    def apply(x):
        return op.w_vinv_wt_x(x)

    t0 = time.time()
    y = jax.block_until_ready(apply(x))
    _ = np.asarray(y[0, :2])
    print(f"L={L}: apply compiled+run in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for _ in range(20):
        y = apply(y * 1e-3)       # chained reps (see linearize note)
    _ = np.asarray(y[0, :2])      # forces the queued chain
    t_apply = (time.time() - t0) / 20
    print(f"L={L:8d}: linearize {t_lin*1e3:7.2f} ms, "
          f"CG apply {t_apply*1e3:6.2f} ms, window {plan.window}",
          flush=True)
    return t_lin, t_apply


def main():
    sizes = [int(a) for a in sys.argv[1:]] or \
        [65536, 131072, 262144, 524288, 1048576]
    results = {}
    for L in sizes:
        results[L] = bench_shard(L)
        print(json.dumps({str(k): v for k, v in results.items()}),
              file=sys.stderr, flush=True)  # partial results survive kills

    # scaling model: per CG iter, T(N) = t_apply(L_tot/N) + t_allreduce
    # ICI all-reduce of 24*C bytes: latency-dominated at this size.
    # Public v5e ICI: ~45 GB/s/link usable, ring all-reduce moves
    # 2*(N-1)/N * payload per link; add ~5 us/hop latency.
    L_tot = 1048576
    payload = 24 * C
    print("\npredicted scaling efficiency (CG phase, 1M landmarks):")
    t1, _ = None, None
    for N in (1, 2, 4, 8, 16):
        Ls = L_tot // N
        t_apply = results[min(results, key=lambda k: abs(k - Ls))][1]
        t_comm = 0.0 if N == 1 else \
            2 * (N - 1) / N * payload / 45e9 + 5e-6 * np.log2(N)
        tN = t_apply + t_comm
        if N == 1:
            t1 = tN
        eff = t1 / (tN * N) * (L_tot / (Ls * N)) * N  # = t1 / tN / N * N
        eff = t1 / (N * tN / N)  # speedup = t1/tN vs ideal N
        speedup = t1 / tN
        print(f"  N={N:2d}: shard L={Ls:8d}, apply {t_apply*1e3:6.2f} ms, "
              f"comm {t_comm*1e6:6.1f} us, speedup {speedup:5.2f}x, "
              f"efficiency {100*speedup/N:5.1f}%")


if __name__ == "__main__":
    main()
