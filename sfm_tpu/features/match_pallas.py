"""Pallas TPU kernel: fused Hamming matching.

The XLA path (match.py) materializes the [N_src, N_tgt] distance matrix in
HBM, then masks and reduces it.  For map-scale matching (8k-16k landmarks
against 512 detections, every frame) that is tens of MB of HBM traffic per
call.  This kernel fuses popcount-matmul distance computation, the motion
window, and the running best/second-best reduction in VMEM: source tiles
stream through the MXU against all target descriptors and only [N_src]
best/second/argmin vectors ever reach HBM.

The kernel returns (best_idx, best_dist, second_dist); the cheap [N_src]
postprocessing (ratio test, absolute threshold, best-per-target dedup)
stays in XLA where it fuses fine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bits import unpack_bits

_SRC_TILE = 256


_KEY_SCALE = 16384.0  # Hamming dist <= 512 and rows < 16384: exact in f32


def _matcher_kernel(bits_s_ref, xy_s_ref, valid_s_ref,
                    bits_t_ref, xy_t_T_ref, valid_t_row_ref, pop_t_row_ref,
                    params_ref,
                    best_ref, second_ref, idx_ref, per_tgt_ref):
    """One grid step matches a _SRC_TILE block of sources against ALL
    targets (targets fit VMEM: 512 x 512 bits = 128 KB as f32 bitplanes).
    Target coordinates/validity arrive pre-transposed as row vectors
    (Mosaic does not transpose narrow/bool vectors).

    Also emits this tile's per-target winner key:
    key = dist * _KEY_SCALE + tile_local_row for sources that pass the
    ratio/threshold tests and whose argmin is that target — the
    lexicographic (dist, row) minimum reproduces match.py's
    keep-best-per-target dedup without any scatter/gather postprocessing
    (scatter-min over 8k sources serializes on TPU, ~1 ms/call).  Keys
    are per-TILE outputs min-reduced in XLA with the tile row offset
    added there: no cross-step accumulator and no pl.program_id, both of
    which break under vmap (the batch axis is prepended to the grid)."""
    bits_s = bits_s_ref[:]                 # [TS, B] {0,1} f32
    bits_t = bits_t_ref[:]                 # [NT, B]
    # Hamming distance: |a| + |b| - 2 a.b — one MXU matmul per tile
    # (f32 bitplanes: Mosaic on this libtpu rejects bf16 tpu.matmul
    # operands — "Bad lhs type"; the XLA-path matcher uses bf16)
    pop_s = jnp.sum(bits_s, axis=1, keepdims=True)          # [TS, 1]
    pop_t_row = pop_t_row_ref[0:1, :]                       # [1, NT]
    inner = jax.lax.dot_general(
        bits_s, bits_t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [TS, NT]
    dist = pop_s + pop_t_row - 2.0 * inner

    # motion window + validity mask
    min_r2 = params_ref[0]
    max_r2 = params_ref[1]
    dx = xy_s_ref[:, 0:1] - xy_t_T_ref[0:1, :]              # [TS, NT]
    dy = xy_s_ref[:, 1:2] - xy_t_T_ref[1:2, :]
    d2 = dx * dx + dy * dy
    feasible = (d2 >= min_r2) & (d2 <= max_r2)
    feasible &= (valid_s_ref[:] > 0) & (valid_t_row_ref[0:1, :] > 0)
    dist = jnp.where(feasible, dist, 1e9)

    # best + second-best along targets
    best = jnp.min(dist, axis=1)
    idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist_wo = jnp.where(cols == idx[:, None], 1e9, dist)
    second = jnp.min(dist_wo, axis=1)

    best_ref[:] = best[:, None]
    second_ref[:] = second[:, None]
    idx_ref[:] = idx[:, None]

    # per-target winner key of THIS tile (tile-local row in the key)
    max_d = params_ref[2]
    ratio = params_ref[3]
    ok = (best <= max_d) & (best < ratio * second)
    ts = dist.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0) \
        .astype(jnp.float32)                                  # [TS, 1]
    key = best[:, None] * _KEY_SCALE + rows                   # [TS, 1]
    contrib = jnp.where((cols == idx[:, None]) & ok[:, None],
                        key, jnp.float32(1e12))               # [TS, NT]
    tile_min = jnp.min(contrib, axis=0, keepdims=True)        # [1, NT]
    # output row-padded to 8 (Mosaic block-shape minimum)
    per_tgt_ref[:] = jnp.broadcast_to(tile_min, per_tgt_ref.shape)


@partial(jax.jit, static_argnames=("interpret",))
def hamming_match_tiles(desc_s, xy_s, valid_s, desc_t, xy_t, valid_t,
                        min_radius, max_radius, window_center_s=None,
                        max_distance=1e9, ratio=1.0,
                        interpret: bool = False):
    """Fused best/second/argmin Hamming matching.

    desc_* packed uint32 [N, W]; returns (best_idx [Ns], best [Ns],
    second [Ns], per_tgt_key [Nt]).  Sources are padded to a _SRC_TILE
    multiple.  per_tgt_key[t] is the minimum (dist * _KEY_SCALE +
    global_row) over sources whose argmin is t and that pass the
    max_distance/ratio tests (>= 1e12 if none)."""
    ns = desc_s.shape[0]
    nt = desc_t.shape[0]
    bits_s = unpack_bits(desc_s)
    bits_t = unpack_bits(desc_t)
    centers = xy_s if window_center_s is None else window_center_s

    pad = (-ns) % _SRC_TILE
    if pad:
        bits_s = jnp.pad(bits_s, ((0, pad), (0, 0)))
        centers = jnp.pad(centers, ((0, pad), (0, 0)))
        valid_s = jnp.pad(valid_s, (0, pad))
    n_pad = bits_s.shape[0]
    params = jnp.asarray([min_radius * min_radius, max_radius * max_radius,
                          max_distance, ratio], jnp.float32)
    n_tiles = n_pad // _SRC_TILE

    grid = (n_tiles,)
    best, second, idx, per_tgt = pl.pallas_call(
        _matcher_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_SRC_TILE, bits_s.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SRC_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SRC_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, bits_t.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, nt), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((_SRC_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SRC_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SRC_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nt), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((8 * n_tiles, nt), jnp.float32),
        ],
        interpret=interpret,
    )(bits_s, centers, valid_s.astype(jnp.float32)[:, None],
      bits_t, xy_t.T, valid_t.astype(jnp.float32)[None, :],
      jnp.sum(unpack_bits(desc_t), axis=1)[None, :], params)
    # lexicographic (dist, global_row) min across tiles: keys carry the
    # tile-LOCAL row, so add each tile's row offset before reducing
    offs = (jnp.arange(n_tiles, dtype=jnp.float32) * _SRC_TILE)[:, None]
    per_tgt = jnp.min(per_tgt[::8] + offs, axis=0)
    return (idx[:ns, 0], best[:ns, 0], second[:ns, 0], per_tgt)


def match_features_pallas(desc0, xy0, valid0, desc1, xy1, valid1, *,
                          min_radius=0.0, max_radius=1e9,
                          max_distance=90.0, ratio=0.8,
                          window_center0=None, interpret=False):
    """Drop-in replacement for match.match_features using the fused kernel
    for the distance/argmin core AND the keep-best-per-target dedup (the
    per-target winner key accumulates inside the kernel; postprocessing
    is one elementwise pass plus a single [Nt]-table gather)."""
    from .match import MatchResult

    idx, best, second, per_tgt = hamming_match_tiles(
        desc0, xy0, valid0, desc1, xy1, valid1,
        min_radius, max_radius, window_center0,
        max_distance=max_distance, ratio=ratio, interpret=interpret)
    ok = (best <= max_distance) & (best < ratio * second) & valid0
    n = valid0.shape[0]
    key = best * _KEY_SCALE + jnp.arange(n, dtype=jnp.float32)
    ok = ok & (key == per_tgt[idx])
    return MatchResult(idx=jnp.where(ok, idx, -1),
                       dist=jnp.where(ok, best, 1e9),
                       mask=ok)
