"""Bisect the fused Schur kernel cost by splitting it into a gather pass
(t = W^T x, z = Vinv(t+g)) and a scatter pass (y += W z), timing each and
variants with pieces disabled."""

import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Cp, L, kmax, TL = 1024, 100_352, 6, 256
nT = L // TL
K8 = kmax * 8
prec = jax.lax.Precision.HIGHEST


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(20):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:40s} {(time.time()-t0)*1000/20:8.3f} ms")
    return out


def _ekT(cams_ref, k):
    cam_k = cams_ref[0, k, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (Cp, TL), 0)
    return (col == cam_k[None, :]).astype(jnp.float32)


def gather_kernel(use_w, use_vinv, cams_ref, wt_ref, vinv_ref, g_ref, x_ref,
                  z_ref):
    xgs = [jnp.dot(x_ref[:], _ekT(cams_ref, k), precision=prec,
                   preferred_element_type=jnp.float32) for k in range(kmax)]
    if not use_w:
        acc = xgs[0]
        for k in range(1, kmax):
            acc = acc + xgs[k]
        z_ref[0, :, :] = acc
        return
    xga = jnp.concatenate(xgs, axis=0)
    t = [jnp.sum(wt_ref[0, c, :, :] * xga, axis=0) + g_ref[0, c, :]
         for c in range(3)]
    if not use_vinv:
        z_ref[0, 0, :] = t[0]
        z_ref[0, 1, :] = t[1]
        z_ref[0, 2, :] = t[2]
        return
    for a in range(3):
        acc = vinv_ref[0, a * 3 + 0, :] * t[0]
        acc = acc + vinv_ref[0, a * 3 + 1, :] * t[1]
        acc = acc + vinv_ref[0, a * 3 + 2, :] * t[2]
        z_ref[0, a, :] = acc


def scatter_kernel(use_w, cams_ref, wt_ref, z_ref, y_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)
    if use_w:
        q_all = (wt_ref[0, 0, :, :] * z_ref[0, 0:1, :]
                 + wt_ref[0, 1, :, :] * z_ref[0, 1:2, :]
                 + wt_ref[0, 2, :, :] * z_ref[0, 2:3, :])
    acc = None
    for k in range(kmax):
        q = q_all[k * 8:(k + 1) * 8, :] if use_w else \
            jnp.broadcast_to(z_ref[0, :, :][0:8], (8, TL))
        c = jax.lax.dot_general(q, _ekT(cams_ref, k),
                                (((1,), (1,)), ((), ())), precision=prec,
                                preferred_element_type=jnp.float32)
        acc = c if acc is None else acc + c
    y_ref[:] += acc


def make_gather(use_w, use_vinv):
    return pl.pallas_call(
        functools.partial(gather_kernel, use_w, use_vinv),
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, K8, TL), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nT, 8, TL), jnp.float32),
    )


def make_scatter(use_w):
    return pl.pallas_call(
        functools.partial(scatter_kernel, use_w),
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, K8, TL), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, Cp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Cp), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    cams = jnp.asarray(rng.integers(0, 1000, (nT, 8, TL)).astype(np.int32))
    wt = jnp.asarray(rng.normal(0, 1, (nT, 3, K8, TL)).astype(np.float32))
    vinv = jnp.asarray(rng.normal(0, 1, (nT, 16, TL)).astype(np.float32))
    g = jnp.zeros((nT, 8, TL), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (8, Cp)).astype(np.float32))

    z = timed("gather (dots only)",
              jax.jit(make_gather(False, False)), cams, wt, vinv, g, x)
    timed("gather (+W mult/rowsum)",
          jax.jit(make_gather(True, False)), cams, wt, vinv, g, x)
    z = timed("gather full (+vinv)",
              jax.jit(make_gather(True, True)), cams, wt, vinv, g, x)
    timed("scatter full",
          jax.jit(make_scatter(True)), cams, wt, z)
    timed("gather+scatter chained", jax.jit(
        lambda c, w, v, gg, xx: make_scatter(True)(
            c, w, make_gather(True, True)(c, w, v, gg, xx))),
        cams, wt, vinv, g, x)




def module_check():
    """Same data, but through sfm_tpu.ba.schur_pallas's jitted wrappers."""
    sys.path.insert(0, "/root/repo")
    from sfm_tpu.ba.schur_pallas import schur_gather, schur_scatter
    rng = np.random.default_rng(0)
    cams = jnp.asarray(rng.integers(0, 1000, (nT, 8, TL)).astype(np.int32))
    wt = jnp.asarray(rng.normal(0, 1, (nT, 3, K8, TL)).astype(np.float32))
    vinv = jnp.asarray(rng.normal(0, 1, (nT, 16, TL)).astype(np.float32))
    g = jnp.zeros((nT, 8, TL), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (8, Cp)).astype(np.float32))

    def raw(c, w, v, gg, xx):
        z = schur_gather(c, w, v, gg, xx, kmax=kmax)
        return schur_scatter(c, w, z, kmax=kmax, n_cams_pad=Cp)

    timed("module gather+scatter (bisect data)", jax.jit(raw),
          cams, wt, vinv, g, x)


if __name__ == "__main__":
    main()
    module_check()
