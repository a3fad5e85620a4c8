"""Microbench: Pallas dynamic-slice patch extraction vs the
bilinear-selection matmul path, at the fleet's vmapped flagship shapes.

Usage: python benchmarks/bench_patch_extract.py [batch] [n_kp]"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main(batch=64, n_kp=512):
    from sfm_tpu.features.descriptor import _patches_matmul
    from sfm_tpu.features.patches_pallas import extract_patches_pallas

    Hc, Wc = 480, 1200
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.uniform(0, 255, (batch, Hc, Wc))
                         .astype(np.float32)).astype(jnp.bfloat16)
    cx = jnp.asarray(rng.uniform(24, Wc - 24, (batch, n_kp))
                     .astype(np.float32))
    cy = jnp.asarray(rng.uniform(24, Hc - 24, (batch, n_kp))
                     .astype(np.float32))

    fns = {
        "matmul": jax.jit(jax.vmap(_patches_matmul)),
        "pallas": jax.jit(jax.vmap(extract_patches_pallas)),
    }
    outs = {}
    for name, fn in fns.items():
        t0 = time.time()
        out = jax.block_until_ready(fn(canvas, cx, cy))
        print(f"{name}: compile+run {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for _ in range(10):
            out = jax.block_until_ready(fn(canvas, cx, cy))
        print(f"{name}: {(time.time()-t0)/10*1e3:8.2f} ms "
              f"(B={batch}, N={n_kp})", file=sys.stderr)
        outs[name] = np.asarray(out, np.float32)
    err = np.abs(outs["matmul"] - outs["pallas"]).max()
    print(f"max |matmul - pallas| = {err:.3f} (bf16 canvas quantum ~1.0)",
          file=sys.stderr)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
