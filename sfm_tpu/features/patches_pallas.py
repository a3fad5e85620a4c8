"""Pallas TPU kernel: subpixel patch extraction — NEGATIVE RESULT, kept
as evidence (benchmarks/bench_patch_extract.py; docs/BENCH_NOTES.md).

The XLA path (descriptor._patches_matmul) extracts every keypoint's
33x33 patch with two bilinear-SELECTION matmuls whose FLOPs scale with
N * PATCH * Hc * Wc — the MXU cannot exploit the 2-nonzeros-per-row
structure.  The hope here was that VMEM dynamic slices (canvas resident,
one [34, 34] slice + 4-tap lerp per keypoint) would beat it.  They do
not: Mosaic requires 8-aligned sublane and 128-aligned lane slice
starts, and after the aligned-window + dynamic-lane-rotate + 8-way
row-predication workaround the kernel measures ~32 ms at the 64-scan
fleet shape vs ~13 ms for the selection-matmul path (round 4).  The
engine does NOT use this module; descriptor.py keeps the matmuls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .descriptor import PATCH, PATCH_RADIUS

_KP_TILE = 128


def _extract_kernel(x0_ref, y0_ref, fx_ref, fy_ref, canvas_ref, out_ref):
    """Extracts every patch in one kernel invocation (gridless: under
    vmap the batch axis becomes the whole grid).  x0/y0 (SMEM int32) are
    the pre-clamped top-left corners of each [PATCH+1, PATCH+1] window;
    fx/fy (SMEM f32) the subpixel fractions."""
    n = x0_ref.shape[0]  # keypoints per grid step (_KP_TILE)
    ROWS = 48    # 8-aligned row window covering row offset 7 + 34 rows
    LANES = 256  # 128-aligned lane window covering lane offset + 34 cols

    def body(k, carry):
        x0 = x0_ref[k, 0]
        y0 = y0_ref[k, 0]
        # Mosaic requires dynamic slice starts 8-aligned in sublanes and
        # 128-aligned in lanes: load an aligned [48, 256] window, rotate
        # the lane offset away (dynamic lane roll is supported), and peel
        # the row offset with 8 predicated static-slice branches
        ya = pl.multiple_of((y0 // 8) * 8, 8)
        xa = pl.multiple_of((x0 // 128) * 128, 128)
        off_y = y0 - ya
        off_x = x0 - xa
        raw48 = canvas_ref[pl.ds(ya, ROWS), pl.ds(xa, LANES)]
        # dynamic lane rotate requires 32-bit data on this Mosaic
        raw48 = raw48.astype(jnp.float32)
        raw48 = pltpu.roll(raw48, -off_x, 1)[:, :PATCH + 1]
        fx = fx_ref[k, 0]
        fy = fy_ref[k, 0]
        for r in range(8):
            @pl.when(off_y == r)
            def _(r=r):
                raw = raw48[r:r + PATCH + 1]
                top = (1.0 - fx) * raw[:PATCH, :PATCH] \
                    + fx * raw[:PATCH, 1:]
                bot = (1.0 - fx) * raw[1:, :PATCH] + fx * raw[1:, 1:]
                patch = (1.0 - fy) * top + fy * bot
                out_ref[pl.ds(k, 1)] = patch[None]
        return carry

    jax.lax.fori_loop(0, n, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def extract_patches_pallas(canvas_s: jnp.ndarray, cx: jnp.ndarray,
                           cy: jnp.ndarray, interpret: bool = False
                           ) -> jnp.ndarray:
    """Subpixel-centered patches [N, PATCH, PATCH] f32 from the smoothed
    canvas [Hc, Wc].  Drop-in for descriptor._patches_matmul (coordinates
    are clamped so even garbage positions of invalid keypoints slice
    in-bounds)."""
    Hc, Wc = canvas_s.shape
    N = cx.shape[0]
    pad = (-N) % _KP_TILE
    if pad:
        cx = jnp.pad(cx, (0, pad))
        cy = jnp.pad(cy, (0, pad))
    Np = cx.shape[0]
    # pad lanes so every 128-aligned 256-lane window is in bounds
    Wp = ((Wc - 1) // 128 + 2) * 128
    canvas_s = jnp.pad(canvas_s, ((0, 0), (0, Wp - Wc)))
    fcx = jnp.floor(cx)
    fcy = jnp.floor(cy)
    x0 = jnp.clip(fcx.astype(jnp.int32) - PATCH_RADIUS, 0, Wc - PATCH - 1)
    # clamp so the 8-aligned 48-row window stays in bounds:
    # y0 <= Hc-41 implies (y0//8)*8 <= Hc-48
    y0 = jnp.clip(fcy.astype(jnp.int32) - PATCH_RADIUS, 0, Hc - PATCH - 8)
    fx = (cx - fcx).astype(jnp.float32)
    fy = (cy - fcy).astype(jnp.float32)

    sspec = pl.BlockSpec((_KP_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _extract_kernel,
        grid=(Np // _KP_TILE,),
        in_specs=[
            sspec, sspec, sspec, sspec,
            pl.BlockSpec((Hc, Wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_KP_TILE, PATCH, PATCH),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, PATCH, PATCH), jnp.float32),
        interpret=interpret,
    )(x0[:, None], y0[:, None], fx[:, None], fy[:, None], canvas_s)
    return out[:N]
