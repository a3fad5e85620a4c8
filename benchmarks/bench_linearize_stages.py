"""Stage attribution of fused_blocks at the pod shard shape: kernel only,
+window gather/combine, +U unpack, +input packing.

python benchmarks/bench_linearize_stages.py [L]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from sfm_tpu.ba.linearize_pallas import (build_lin_tables, linearize_fused,
                                         window_gather, window_combine,
                                         fused_blocks, _SYM6)
from sfm_tpu.ba.schur_pallas import SchurPlan, pack_lm_tiles
from sfm_tpu.geometry.rotations import exp_so3

C = 5120
KMAX = 8
TILE = 2048


def timeit(fn, salt0, extract, reps=10):
    """Chained-rep timing.  The warmup is ONE UNTIMED REP OF THE EXACT
    LOOP BODY — any op difference (even Python-float vs device-scalar)
    pushes a compile into the first timed rep (the round-4 artifact)."""
    s = salt0 * 0.0
    out = fn(s * 1e-30)
    s = extract(out) * 0.0
    _ = np.asarray(s)                     # compile + first run
    # min over batches: the tunneled chip is shared — a contended batch
    # reads 10-100x slow; the min is the uncontended capability
    batches = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(reps):
            out = fn(s * 1e-30)
            s = extract(out)
        _ = np.asarray(s)
        batches.append((time.time() - t0) / reps)
    return min(batches), sorted(batches)[len(batches) // 2]


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    rng = np.random.default_rng(0)
    home = (np.arange(L) * (C - KMAX) // L).astype(np.int32)
    lm_cam = home[:, None] + np.arange(KMAX)[None, :].astype(np.int32)
    lm_uv = rng.uniform(0, 640, (L, KMAX, 2)).astype(np.float32)
    lm_w = np.ones((L, KMAX), np.float32)
    plan = SchurPlan(lm_cam, lm_w, C, tile=TILE)
    perm = plan.perm
    lt = build_lin_tables(jnp.asarray(lm_cam[perm]), jnp.asarray(lm_uv[perm]),
                          jnp.asarray(lm_w[perm]), C, tile=TILE,
                          base=plan.base, window=plan.window,
                          pad_width=plan.pad_width)
    K = jnp.asarray(np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]],
                             np.float32))
    rvec = jnp.asarray(rng.normal(0, 0.05, (C, 3)).astype(np.float32))
    tvec = jnp.asarray(rng.normal(0, 0.5, (C, 3)).astype(np.float32))
    xyz = jnp.asarray(np.stack([rng.uniform(-5, 5, L), rng.uniform(-5, 5, L),
                                rng.uniform(5, 10, L)], 1).astype(
                                    np.float32))[jnp.asarray(perm)]
    R = exp_so3(rvec)
    ones_c, ones_l = jnp.ones(C), jnp.ones(L)
    kvals = jnp.stack([K[0, 0], K[1, 1], K[0, 1], K[0, 2],
                       K[1, 2], 0.0, 0.0, 0.0]).reshape(1, 8)
    xyzf = jnp.concatenate([xyz, ones_l[:, None]], axis=1)
    xyzf_t = pack_lm_tiles(xyzf, lt.tile, pad_rows=8)
    packed = jnp.concatenate([R.reshape(C, 9), tvec, ones_c[:, None]], 1)
    campk = jnp.pad(packed, ((0, lt.pad_width - C), (0, 3))).T
    campw_t = window_gather(campk, lt)

    @jax.jit
    def kernel_only(salt):
        wt, vg, acc = linearize_fused(
            kvals + salt, lt.cams_t, lt.uvw_t, xyzf_t, campw_t,
            kmax=lt.kmax, window=lt.window)
        return vg[0, 0, 0]

    @jax.jit
    def with_combine(salt):
        wt, vg, acc = linearize_fused(
            kvals + salt, lt.cams_t, lt.uvw_t, xyzf_t, campw_t,
            kmax=lt.kmax, window=lt.window)
        camacc = window_combine(acc, lt)
        return camacc[0, 0] + vg[0, 0, 0]

    @jax.jit
    def with_unpack(salt):
        wt, vg, acc = linearize_fused(
            kvals + salt, lt.cams_t, lt.uvw_t, xyzf_t, campw_t,
            kmax=lt.kmax, window=lt.window)
        camacc = window_combine(acc, lt)
        U = jnp.zeros((C, 6, 6), jnp.float32)
        for idx, (p, q) in enumerate(_SYM6):
            U = U.at[:, p, q].set(camacc[idx, :C])
            if p != q:
                U = U.at[:, q, p].set(camacc[idx, :C])
        g_cam = camacc[21:27, :C].T
        return U[0, 0, 0] + g_cam[0, 0] + vg[0, 0, 0]

    @jax.jit
    def full(salt):
        wt, vg, U, g_cam, cost = fused_blocks(
            K, R, tvec, xyz + salt, ones_l, ones_c, lt)
        return cost

    z = jnp.asarray(0.0)
    for name, fn in [("kernel", kernel_only), ("kernel+combine", with_combine),
                     ("kernel+comb+unpack", with_unpack), ("full", full)]:
        mn, med = timeit(fn, z, lambda s: s)
        print(f"  {name:20s}: min {mn*1e3:8.2f} ms   median {med*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
