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

    import functools
    from sfm_tpu.ba.linearize_pallas import LinTables

    @functools.partial(jax.jit, static_argnames=("kmax", "tile", "window",
                                                 "pad_width"))
    def lin_fn(salt, xyz_p, base_t, cams_t, uvw_t, *, kmax, tile, window,
               pad_width):
        # big arrays passed as ARGUMENTS: closed-over device constants are
        # serialized into the tunnel's remote-compile request (HTTP 413
        # above ~250 MB of tables); the salt chains reps so a lazy/deduping
        # executor cannot skip any
        lt2 = LinTables(base_t, cams_t, uvw_t, kmax, tile, window,
                        pad_width)
        return fused_blocks(K, R, tvec, xyz_p + salt, ones_l, ones_c, lt2)

    def lin(salt):
        return lin_fn(salt, xyz_p, lt.base_t, lt.cams_t, lt.uvw_t,
                      kmax=lt.kmax, tile=lt.tile, window=lt.window,
                      pad_width=lt.pad_width)

    # timing notes:
    #  - (round 4) on the tunneled device, block_until_ready does NOT
    #    reliably force execution — a small d2h fetch INSIDE the timed
    #    region does, and reps must be CHAINED so a lazy executor cannot
    #    collapse them (unchained loops measured the ~25 ms tunnel RTT
    #    for every problem size).
    #  - (round 5) the WARMUP must be one untimed rep of the EXACT timed
    #    loop body.  Round 4 warmed with lin(0.0) (Python float) and then
    #    timed lin(c * 1e-30) (device scalar) — a different jit signature,
    #    so the full ~30-60 s pallas recompile landed inside the timed
    #    loop and read as "~303 ms linearize" at every pod shard size.
    #    Clean-timed, the same kernel runs in single-digit ms
    #    (benchmarks/bench_linearize_variants.py).
    #  - (round 5) the tunneled chip is SHARED: a contended batch reads
    #    10-100x slow.  Time several batches and take the min — the
    #    uncontended capability (matching how a dedicated pod would run).
    REPS = 10
    t0 = time.time()
    c = jnp.asarray(0.0)
    out = lin(c * 1e-30)
    c = out[4] * 0.0
    _ = np.asarray(c)
    print(f"L={L}: linearize compiled+run in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    batches = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(REPS):
            out = lin(c * 1e-30)
            c = out[4]
        _ = np.asarray(c)         # forces the queued chain
        batches.append((time.time() - t0) / REPS)
    t_lin = min(batches)
    wt, vg_t = out[0], out[1]

    vinv_t = damped_vinv_tiled(vg_t, 1e-3)
    x = jnp.asarray(rng.normal(0, 1, (C, 6)).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("window", "pad_width"))
    def apply_fn(x, wt, vinv_t, cams_t, base_t, *, window, pad_width):
        # array args, not closure constants (see lin_fn's 413 note)
        op = SchurOperator.from_packed(
            wt, cams_t, base_t, L=L, kmax=KMAX, tile=TILE,
            window=window, pad_width=pad_width)
        op.vinv_t = vinv_t
        return op.w_vinv_wt_x(x)

    def apply(x):
        return apply_fn(x, wt, vinv_t, lt.cams_t, lt.base_t,
                        window=lt.window, pad_width=lt.pad_width)

    # warmup = one untimed rep of the exact loop body (see linearize note)
    t0 = time.time()
    y = apply(x * 1e-3)
    _ = np.asarray(y[0, :2])
    print(f"L={L}: apply compiled+run in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    batches = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(20):
            y = apply(y * 1e-3)   # chained reps (see linearize note)
        _ = np.asarray(y[0, :2])  # forces the queued chain
        batches.append((time.time() - t0) / 20)
    t_apply = min(batches)
    print(f"L={L:8d}: linearize {t_lin*1e3:7.2f} ms, "
          f"CG apply {t_apply*1e3:6.2f} ms, window {plan.window}",
          flush=True)
    return t_lin, t_apply


def main():
    record = "--record" in sys.argv
    sizes = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or \
        [65536, 131072, 262144, 524288, 1048576]
    results = {}
    for L in sizes:
        results[L] = bench_shard(L)
        print(json.dumps({str(k): v for k, v in results.items()}),
              file=sys.stderr, flush=True)  # partial results survive kills

    # scaling model over the FULL LM iteration:
    #   T_LM(N) = t_lin(L/N) + cg * (t_apply(L/N) + comm_cg) + comm_lin
    # comm_cg: ring all-reduce of 24*C bytes (the [C,6] psum per CG iter);
    # comm_lin: one fused 216*C-byte all-reduce (U + g_cam + rhs vectors).
    # Public v5e ICI: ~45 GB/s/link usable, ring all-reduce moves
    # 2*(N-1)/N * payload per link; add ~5 us/hop latency.
    L_tot = 1048576
    CG = 12
    print(f"\npredicted scaling efficiency (full LM iteration, cg={CG}, "
          "1M landmarks):")
    t1 = None
    for N in (1, 2, 4, 8, 16):
        Ls = L_tot // N
        t_lin, t_apply = results[min(results, key=lambda k: abs(k - Ls))]

        def ring(payload):
            return 0.0 if N == 1 else \
                2 * (N - 1) / N * payload / 45e9 + 5e-6 * np.log2(N)

        tN = t_lin + CG * (t_apply + ring(24 * C)) + ring(216 * C)
        if N == 1:
            t1 = tN
        speedup = t1 / tN
        print(f"  N={N:2d}: shard L={Ls:8d}, lin {t_lin*1e3:6.2f} + "
              f"{CG}x apply {t_apply*1e3:5.2f} ms, comm "
              f"{(CG*ring(24*C)+ring(216*C))*1e6:6.1f} us -> "
              f"T_LM {tN*1e3:7.2f} ms, speedup {speedup:5.2f}x, "
              f"efficiency {100*speedup/N:5.1f}%")

    if record and 1048576 in results and 524288 in results:
        from bench import _record
        t_lin1, t_app1 = results[1048576]
        t_lin2, t_app2 = results[524288]
        t1 = t_lin1 + CG * t_app1
        comm2 = CG * (2 * 0.5 * 24 * C / 45e9 + 5e-6) \
            + (2 * 0.5 * 216 * C / 45e9 + 5e-6)
        t2 = t_lin2 + CG * t_app2 + comm2
        _record(
            "ba_pod", "pod-scale BA (BASELINE scaling config, single-chip "
            "LM iteration + ICI model)",
            f"{t1*1e3:.1f} ms/LM-iter at C=5120, L=1M, 8M obs on ONE "
            f"chip; modeled N=2 efficiency {100*t1/t2/2:.0f}%",
            "fused Pallas linearize + implicit-Schur windowed apply, "
            f"cg={CG}; measured min-of-5-batches on the tunneled chip "
            "(shared-chip contention excluded); comm = HLO-verified "
            "24C/216C-byte all-reduces over a 45 GB/s ICI ring model "
            "(docs/DIST_BA_SCALING.md)",
            source="python benchmarks/bench_dist_model.py --record")


if __name__ == "__main__":
    main()
