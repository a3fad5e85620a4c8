"""Isolate the cost centers of the fused Schur kernel: E-generation,
gather-direction matmuls, scatter-direction matmuls, precision.  Each
variant runs the same [nT] grid over the same inputs."""

import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, L, kmax, TL = 1024, 100_352, 6, 256
nT = L // TL


def run_variant(name, kernel, extra_outs=()):
    rng = np.random.default_rng(0)
    cams = jnp.asarray(
        rng.integers(0, C, (nT, 8, TL)).astype(np.int32))
    wt = jnp.asarray(rng.normal(0, 1, (nT, 112, TL)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (8, C)).astype(np.float32))

    f = pl.pallas_call(
        kernel,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 112, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
    )
    g = jax.jit(lambda a, b, c: f(a, b, c))
    out = jax.block_until_ready(g(cams, wt, x))
    t0 = time.time()
    for _ in range(20):
        out = jax.block_until_ready(g(cams, wt, x))
    print(f"{name:44s} {(time.time()-t0)*1000/20:8.3f} ms")


def k_baseline(cams_ref, wt_ref, x_ref, y_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)
    y_ref[0, 0:TL] += wt_ref[0, 0, :]


def k_egen_only(cams_ref, wt_ref, x_ref, y_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)
    acc = jnp.zeros((TL,), jnp.float32)
    for k in range(kmax):
        cam_k = cams_ref[0, k, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (C, TL), 0)
        ekT = (col == cam_k[None, :]).astype(jnp.float32)
        acc = acc + jnp.sum(ekT, axis=0)
    y_ref[0, 0:TL] += acc


def _k_dots(prec, both, cams_ref, wt_ref, x_ref, y_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)
    acc = None
    for k in range(kmax):
        cam_k = cams_ref[0, k, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (C, TL), 0)
        ekT = (col == cam_k[None, :]).astype(jnp.float32)
        xg = jnp.dot(x_ref[:], ekT, precision=prec,
                     preferred_element_type=jnp.float32)   # [8, TL]
        if both:
            q = xg * wt_ref[0, k:k + 1, :]
            back = jax.lax.dot_general(
                q, ekT, (((1,), (1,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)        # [8, C]
            acc = back if acc is None else acc + back
        else:
            acc = xg if acc is None else acc + xg
    if acc.shape[-1] == TL:
        y_ref[:, 0:TL] += acc
    else:
        y_ref[:] += acc


def main():
    run_variant("baseline (DMA only)", k_baseline)
    run_variant("e-gen only", k_egen_only)
    for prec, nm in ((jax.lax.Precision.DEFAULT, "default"),
                     (jax.lax.Precision.HIGHEST, "highest")):
        run_variant(f"gather dots ({nm})",
                    functools.partial(_k_dots, prec, False))
        run_variant(f"gather+scatter dots ({nm})",
                    functools.partial(_k_dots, prec, True))


if __name__ == "__main__":
    main()
