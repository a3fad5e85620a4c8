"""Pallas fused matvec for the implicit-Schur reduced camera system.

The large-BA CG loop (ba/large.py, run_large_ba) spends its time in the
coupling contractions
    t[l] = sum_k  W[l,k]^T x[cam(l,k)]          (gather   direction)
    y[c] = sum_{l,k: cam(l,k)=c} W[l,k] z[l]    (scatter  direction)
per CG iteration.  The XLA one-hot-einsum formulation materializes the
[L, kmax, C] one-hot operand in HBM (~2.4 GB per matvec at the 1k-camera /
100k-landmark operating point); the gather formulation serializes on row
gathers.  These kernels walk landmark tiles, keep the per-camera vectors
x [8, Cp] / accumulator y [8, Cp] resident in VMEM, and build the one-hot
operands as in-VMEM iota-compares feeding the MXU — they never touch HBM.

The apply is TWO pallas calls (gather -> z, then scatter), not one fused
kernel: Mosaic stack-allocates every intermediate for the whole kernel
body, so a single kernel holding 2*kmax one-hot [Cp, TL] temporaries sits
at the scoped-VMEM ceiling and serializes (~26 ms/apply measured); the
split halves the live set and runs the same math in ~0.1 ms
(benchmarks/bench_schur_bisect.py).

One apply serves all three uses in the solver (signs chosen by the
caller):
    CG matvec:   S x     = damp(U) x - y(x, g=0)
    CG rhs:      rhs     = g_cam    - y(0, g=g_lm)
    back-subst.: d_lm    = z(-d_cam, g=g_lm)   (gather pass only)

Layout rule (benchmarks/bench_schur_variants.py): every block's
second-to-minor dim and every in-kernel sublane slice offset must be a
multiple of 8, or Mosaic falls off the vector path.  All per-landmark
tables therefore pad their row groups to 8:
    wt    [nT, 3, kmax*8, TL]  wt[i, c, k*8+r, j] = W[iTL+j, k, r, c]
                               (r in 0..5 real block rows, 6..7 zero)
    cams  [nT, max(kmax,8), TL]  int32  camera index per (landmark, k) slot
    vinvt [nT, 16, TL]         rows a*3+b of the 3x3 inverse, 9..15 zero
    gt    [nT, 8,  TL]         rows 0..2 real
    x     [8, Cp]              rows 0..5 real; Cp = C padded to lanes
Padding observations carry zero W blocks (weights are folded into W at
linearization), so no masking is needed in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_lm_tiles(arr: jnp.ndarray, tile: int, pad_rows: int = 0
                  ) -> jnp.ndarray:
    """[L, d] (or [L, ...] flattened) -> [nT, max(d, pad_rows), TL] with
    zero padding of both the landmark axis and the row axis."""
    L = arr.shape[0]
    Lp = _round_up(L, tile)
    flat = arr.reshape(L, -1)
    d = max(flat.shape[1], pad_rows)
    flat = jnp.pad(flat, ((0, Lp - L), (0, d - flat.shape[1])))
    return flat.reshape(Lp // tile, tile, d).transpose(0, 2, 1)


def unpack_lm_tiles(tiled: jnp.ndarray, L: int, d: int = None) -> jnp.ndarray:
    """[nT, d_pad, tile] -> [L, d]."""
    nT, dp, tile = tiled.shape
    out = tiled.transpose(0, 2, 1).reshape(nT * tile, dp)[:L]
    return out if d is None else out[:, :d]


def _ekT(cams_ref, k, Cp, dtype=jnp.float32):
    """One-hot [Cp, TL] for the tile's k-th camera column, built in VMEM.
    Exact in bf16 too (entries are 0/1)."""
    cam_k = cams_ref[0, k, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (Cp, cam_k.shape[0]), 0)
    return (col == cam_k[None, :]).astype(dtype)


def _bf16_split3(x):
    """x (f32) as three bf16 terms whose sum reproduces x to ~f32
    accuracy.  Against an exactly-representable bf16 operand (our 0/1
    one-hots), 3 bf16 MXU passes then equal one f32 HIGHEST dot at half
    the passes (HIGHEST splits BOTH operands: 6 passes)."""
    x0 = x.astype(jnp.bfloat16)
    r1 = x - x0.astype(jnp.float32)
    x1 = r1.astype(jnp.bfloat16)
    x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1, x2


def _onehot_dot(dense, ekT_bf16, precision: str, transpose: bool):
    """dense [8, K] @ one-hot, at the requested effective precision.
    transpose=False: dense [8, Cp] @ ekT [Cp, TL] -> [8, TL]
    transpose=True:  dense [8, TL] x ekT [Cp, TL] contracted on TL -> [8, Cp]
    """
    dims = (((1,), (1,)), ((), ())) if transpose else (((1,), (0,)), ((), ()))
    if precision == "highest":
        return jax.lax.dot_general(
            dense, ekT_bf16.astype(jnp.float32), dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    # NOTE: bf16 operand dots need an explicit DEFAULT precision — the
    # package sets jax_default_matmul_precision=float32 globally, and
    # Mosaic rejects fp32 contract precision on bf16 operands
    if precision == "bf16":
        return jax.lax.dot_general(
            dense.astype(jnp.bfloat16), ekT_bf16, dims,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
    # bf16x3: exact f32 via 3 one-sided bf16 splits
    acc = None
    for part in _bf16_split3(dense):
        term = jax.lax.dot_general(part, ekT_bf16, dims,
                                   precision=jax.lax.Precision.DEFAULT,
                                   preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _gather_kernel(kmax: int, Cp: int, precision: str,
                   cams_ref, wt_ref, vinv_ref, g_ref, x_ref, z_ref):
    """z = Vinv (W^T x + g) for one landmark tile.

    The k loop is a lax.fori_loop, NOT a Python unroll: Mosaic
    stack-allocates every straight-line intermediate for the whole body,
    so an unrolled loop holds kmax one-hot [Cp, TL] temporaries (~6 MB)
    and throttles when the kernel is embedded in a large program; the
    fori_loop body's allocations are reused across iterations."""

    def body(k, t):
        ekT = _ekT(cams_ref, k, Cp, jnp.bfloat16)
        xg = _onehot_dot(x_ref[:], ekT, precision, False)    # [8, TL]
        w_k = wt_ref[0, :, pl.ds(k * 8, 8), :]               # [3, 8, TL]
        return t + jnp.sum(w_k * xg[None, :, :], axis=1)     # [3, TL]

    t0 = g_ref[0, 0:3, :]
    t = jax.lax.fori_loop(0, kmax, body, t0)
    for a in range(3):
        acc = vinv_ref[0, a * 3 + 0, :] * t[0]
        acc = acc + vinv_ref[0, a * 3 + 1, :] * t[1]
        acc = acc + vinv_ref[0, a * 3 + 2, :] * t[2]
        z_ref[0, a, :] = acc


def _scatter_kernel(kmax: int, Cp: int, precision: str,
                    cams_ref, wt_ref, z_ref, y_ref):
    """y += sum over the tile of W z, scattered to cameras via the MXU.
    fori_loop over k for the same VMEM-liveness reason as the gather."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    def body(k, acc):
        w_k = wt_ref[0, :, pl.ds(k * 8, 8), :]               # [3, 8, TL]
        # q[r] = sum_c W[k,r,c] z[c]
        q = (w_k[0] * z_ref[0, 0:1, :]
             + w_k[1] * z_ref[0, 1:2, :]
             + w_k[2] * z_ref[0, 2:3, :])                    # [8, TL]
        ekT = _ekT(cams_ref, k, Cp, jnp.bfloat16)
        return acc + _onehot_dot(q, ekT, precision, True)    # [8, Cp]

    acc = jax.lax.fori_loop(0, kmax, body,
                            jnp.zeros((8, Cp), jnp.float32))
    y_ref[:] += acc


def _lm_specs(cam_rows: int, K8: int, TL: int):
    # cam_rows = cams_t.shape[1] = max(kmax, 8): the block must span every
    # packed camera-index row, or the in-kernel dynamic read cams_ref[0,k,:]
    # clamps k >= 8 to row 7 and gathers/scatters the wrong camera
    return [
        pl.BlockSpec((1, cam_rows, TL), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, K8, TL), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("kmax", "precision",
                                             "interpret"))
def schur_gather(cams_t, wt, vinv_t, g_t, x, *, kmax: int,
                 precision: str = "bf16x3", interpret: bool = False):
    """z_t [nT, 8, TL] = Vinv (W^T x + g), tiled."""
    nT, _, K8, TL = wt.shape
    Cp = x.shape[1]
    return pl.pallas_call(
        functools.partial(_gather_kernel, kmax, Cp, precision),
        grid=(nT,),
        in_specs=_lm_specs(cams_t.shape[1], K8, TL) + [
            pl.BlockSpec((1, 16, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nT, 8, TL), jnp.float32),
        interpret=interpret,
    )(cams_t, wt, vinv_t, g_t, x)


@functools.partial(jax.jit, static_argnames=("kmax", "n_cams_pad",
                                             "precision", "interpret"))
def schur_scatter(cams_t, wt, z_t, *, kmax: int, n_cams_pad: int,
                  precision: str = "bf16x3", interpret: bool = False):
    """y [8, Cp] = sum_l W z, scattered to cameras."""
    nT, _, K8, TL = wt.shape
    Cp = n_cams_pad
    return pl.pallas_call(
        functools.partial(_scatter_kernel, kmax, Cp, precision),
        grid=(nT,),
        in_specs=_lm_specs(cams_t.shape[1], K8, TL) + [
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, Cp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Cp), jnp.float32),
        interpret=interpret,
    )(cams_t, wt, z_t)


def _fused_kernel(kmax: int, Cw: int, precision: str,
                  base_ref, cams_ref, wt_ref, vinv_ref, g_ref, x_ref,
                  z_ref, y_ref):
    """One landmark tile of the full apply, reading wt ONCE:
        t = g + W^T x[window]         (gather, local camera window)
        z = Vinv t                    (written to z_ref)
        y[window] += W z              (scatter)
    base_ref (SMEM, full [nT, 1] array) holds each tile's 128-aligned
    camera-window offset;
    cams_ref holds WINDOW-LOCAL camera indices (cam - base).  Padding
    slots carry zero W blocks, so out-of-window locals (< 0 or >= Cw)
    simply match no one-hot column and contribute nothing."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    ow = pl.multiple_of(base_ref[i, 0], LANE)
    xw = x_ref[:, pl.ds(ow, Cw)]                             # [8, Cw]

    def gbody(k, t):
        ekT = _ekT(cams_ref, k, Cw, jnp.bfloat16)            # [Cw, TL]
        xg = _onehot_dot(xw, ekT, precision, False)          # [8, TL]
        w_k = wt_ref[0, :, pl.ds(k * 8, 8), :]               # [3, 8, TL]
        return t + jnp.sum(w_k * xg[None, :, :], axis=1)     # [3, TL]

    t = jax.lax.fori_loop(0, kmax, gbody, g_ref[0, 0:3, :])

    zs = []
    for a in range(3):
        acc = vinv_ref[0, a * 3 + 0, :] * t[0]
        acc = acc + vinv_ref[0, a * 3 + 1, :] * t[1]
        acc = acc + vinv_ref[0, a * 3 + 2, :] * t[2]
        z_ref[0, a, :] = acc
        zs.append(acc)

    def sbody(k, acc):
        w_k = wt_ref[0, :, pl.ds(k * 8, 8), :]               # [3, 8, TL]
        q = (w_k[0] * zs[0][None, :] + w_k[1] * zs[1][None, :]
             + w_k[2] * zs[2][None, :])                      # [8, TL]
        ekT = _ekT(cams_ref, k, Cw, jnp.bfloat16)
        return acc + _onehot_dot(q, ekT, precision, True)    # [8, Cw]

    acc = jax.lax.fori_loop(0, kmax, sbody,
                            jnp.zeros((8, Cw), jnp.float32))
    y_ref[:, pl.ds(ow, Cw)] += acc


@functools.partial(jax.jit, static_argnames=("kmax", "window", "pad_width",
                                             "precision", "interpret"))
def schur_apply_fused(base_t, cams_t, wt, vinv_t, g_t, x, *, kmax: int,
                      window: int, pad_width: int,
                      precision: str = "bf16", interpret: bool = False):
    """(z_t [nT, 8, TL], y [8, pad_width]): the full Schur coupling apply
    in one kernel — wt is read from HBM once per apply instead of once per
    direction.  Camera windows (see SchurPlan) shrink every one-hot dot
    from [Cp, TL] to [window, TL]."""
    nT, _, K8, TL = wt.shape
    return pl.pallas_call(
        functools.partial(_fused_kernel, kmax, window, precision),
        grid=(nT,),
        in_specs=[
            # whole [nT, 1] base array resident in SMEM (TPU lowering
            # requires SMEM blocks to cover the array; indexed by
            # program_id in-kernel)
            pl.BlockSpec((nT, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + _lm_specs(cams_t.shape[1], K8, TL) + [
            pl.BlockSpec((1, 16, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pad_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pad_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nT, 8, TL), jnp.float32),
                   jax.ShapeDtypeStruct((8, pad_width), jnp.float32)],
        interpret=interpret,
    )(base_t, cams_t, wt, vinv_t, g_t, x)


class SchurPlan:
    """Host-side camera-window plan for the fused kernel.

    Landmarks in SfM have strong camera locality (a landmark is observed
    by temporally nearby keyframes).  Sorting landmarks by their minimum
    observing camera makes each landmark TILE touch a narrow camera range,
    so the one-hot gather/scatter dots only need a [window, TL] operand
    instead of [Cp, TL] — the MXU work drops by Cp/window.  ``window`` is
    the max per-tile camera span over the sorted tiles (128-aligned), so
    the windowed apply is EXACT for any problem; with no locality it
    degrades gracefully to window == Cp (the unwindowed cost)."""

    def __init__(self, lm_cam, lm_w, n_cams: int, tile: int = 256):
        import numpy as np
        lm_cam = np.asarray(lm_cam)
        lm_w = np.asarray(lm_w)
        L = lm_cam.shape[0]
        live = lm_w > 0
        INF = np.int64(1) << 40
        mincam = np.where(live, lm_cam, INF).min(axis=1)
        maxcam = np.where(live, lm_cam, -1).max(axis=1)
        self.perm = np.argsort(mincam, kind="stable").astype(np.int32)
        inv = np.zeros(L, np.int32)
        inv[self.perm] = np.arange(L, dtype=np.int32)
        self.inv_perm = inv
        Lp = _round_up(L, tile)
        nT = Lp // tile
        mn_s = np.full(Lp, INF, np.int64)
        mx_s = np.full(Lp, -1, np.int64)
        mn_s[:L] = mincam[self.perm]
        mx_s[:L] = maxcam[self.perm]
        mn_t = mn_s.reshape(nT, tile).min(axis=1)
        mx_t = mx_s.reshape(nT, tile).max(axis=1)
        empty = mx_t < 0
        mn_t = np.where(empty, 0, np.minimum(mn_t, n_cams))
        mx_t = np.where(empty, 0, mx_t)
        base = (mn_t // LANE) * LANE
        span = mx_t - base + 1
        self.window = int(_round_up(max(int(span.max()), 1), LANE))
        self.base = base.astype(np.int32)
        self.pad_width = int(_round_up(
            max(int((base + self.window).max()), n_cams, LANE), LANE))
        self.tile = tile
        self.n_cams = n_cams


class SchurOperator:
    """Per-linearization wrapper: packs W/cams once, then serves matvec /
    rhs / back-substitution through the fused windowed kernel.  All
    methods operate on camera-major [C, 6] vectors like the plain-XLA
    solver.  ``base``/``window``/``pad_width`` come from a SchurPlan
    (with lm_cam/W/Vinv/g already permuted into plan order); without a
    plan the single window spans all cameras."""

    def __init__(self, W_l: jnp.ndarray, lm_cam: jnp.ndarray, *,
                 tile: int = 256, precision: str = "bf16x3",
                 interpret: bool = False, base=None, window: int = None,
                 pad_width: int = None):
        self.L, self.kmax = lm_cam.shape
        self.tile = tile
        self.precision = precision
        self.interpret = interpret
        # [L,kmax,6,3] -> [L, 3, kmax, 8] (c-major, r padded to 8)
        W8 = jnp.pad(W_l, ((0, 0), (0, 0), (0, 2), (0, 0)))
        self.wt = pack_lm_tiles(
            W8.transpose(0, 3, 1, 2).reshape(self.L, -1), tile)
        self.nT = self.wt.shape[0]
        self.wt = self.wt.reshape(self.nT, 3, self.kmax * 8, tile)
        if base is None:
            base = jnp.zeros((self.nT,), jnp.int32)
        base = jnp.asarray(base, jnp.int32)
        self.base_t = base.reshape(self.nT, 1)
        # window=None: a single window spanning all cameras (resolved at
        # first use from the camera-vector length)
        self.window = window
        self.pad_width = pad_width
        # window-LOCAL camera indices (invalid slots keep zero W blocks)
        tile_of = jnp.arange(self.L, dtype=jnp.int32) // tile
        lm_local = lm_cam - base[tile_of][:, None]
        self.cams_t = pack_lm_tiles(lm_local, tile, pad_rows=8).astype(
            jnp.int32)
        self._zeros_g = jnp.zeros((self.nT, 8, tile), jnp.float32)

    @classmethod
    def from_packed(cls, wt, cams_t, base_t, *, L: int, kmax: int,
                    tile: int, precision: str = "bf16",
                    interpret: bool = False, window: int = None,
                    pad_width: int = None) -> "SchurOperator":
        """Constructor for wt ALREADY in the packed tile layout (as the
        fused linearizer emits it, linearize_pallas.py) — skips the
        transpose/pack pass entirely."""
        self = cls.__new__(cls)
        self.L, self.kmax = L, kmax
        self.tile = tile
        self.precision = precision
        self.interpret = interpret
        self.wt = wt
        self.nT = wt.shape[0]
        self.base_t = base_t
        self.window = window
        self.pad_width = pad_width
        self.cams_t = cams_t
        self._zeros_g = jnp.zeros((self.nT, 8, tile), jnp.float32)
        return self

    def set_vinv(self, Vinv: jnp.ndarray):
        """Vinv [L,3,3] changes with the damping lambda."""
        self.vinv_t = pack_lm_tiles(Vinv.reshape(self.L, 9), self.tile,
                                    pad_rows=16)

    def w_vinv_g_packed(self, g_t: jnp.ndarray, n_cams: int) -> jnp.ndarray:
        """As w_vinv_g but with g already in [nT, 8, TL] tile layout."""
        win, pw = self._dims(n_cams)
        y, _ = self._apply(g_t, jnp.zeros((8, pw), jnp.float32), win)
        return y.T[:n_cams, :6]

    def back_substitute_packed(self, g_t: jnp.ndarray, d_cam: jnp.ndarray
                               ) -> jnp.ndarray:
        """As back_substitute but with g already packed."""
        win, pw = self._dims(d_cam.shape[0])
        z_t, _ = schur_apply_fused(
            self.base_t, self.cams_t, self.wt, self.vinv_t,
            g_t, self._pad_x(-d_cam, pw),
            kmax=self.kmax, window=win, pad_width=pw,
            precision=self.precision, interpret=self.interpret)
        return unpack_lm_tiles(z_t, self.L, 3)

    def _dims(self, n_cams: int):
        """(window, pad_width), defaulting to one all-camera window."""
        full = _round_up(max(n_cams, LANE), LANE)
        return (self.window or full, self.pad_width or full)

    def _pad_x(self, x: jnp.ndarray, pad_width: int) -> jnp.ndarray:
        return jnp.pad(x, ((0, pad_width - x.shape[0]), (0, 2))).T

    def _pack_g(self, g_lm: jnp.ndarray) -> jnp.ndarray:
        return pack_lm_tiles(g_lm, self.tile, pad_rows=8)

    def _apply(self, g_t, x_pad, window: int):
        z_t, y = schur_apply_fused(
            self.base_t, self.cams_t, self.wt, self.vinv_t, g_t, x_pad,
            kmax=self.kmax, window=window, pad_width=x_pad.shape[1],
            precision=self.precision, interpret=self.interpret)
        return y, z_t

    def w_vinv_wt_x(self, x: jnp.ndarray) -> jnp.ndarray:
        """y [C,6] = W Vinv W^T x  (the Schur coupling term of S x)."""
        win, pw = self._dims(x.shape[0])
        y, _ = self._apply(self._zeros_g, self._pad_x(x, pw), win)
        return y.T[:x.shape[0], :6]

    def w_vinv_g(self, g_lm: jnp.ndarray, n_cams: int) -> jnp.ndarray:
        """y [C,6] = W Vinv g_lm  (the rhs coupling term)."""
        win, pw = self._dims(n_cams)
        y, _ = self._apply(self._pack_g(g_lm),
                           jnp.zeros((8, pw), jnp.float32), win)
        return y.T[:n_cams, :6]

    def back_substitute(self, g_lm: jnp.ndarray, d_cam: jnp.ndarray
                        ) -> jnp.ndarray:
        """d_lm [L,3] = Vinv (g_lm - W^T d_cam)."""
        win, pw = self._dims(d_cam.shape[0])
        z_t, _ = schur_apply_fused(
            self.base_t, self.cams_t, self.wt, self.vinv_t,
            self._pack_g(g_lm), self._pad_x(-d_cam, pw),
            kmax=self.kmax, window=win, pad_width=pw,
            precision=self.precision, interpret=self.interpret)
        return unpack_lm_tiles(z_t, self.L, 3)
