"""Pallas TPU kernels for gather-free worklist assembly.

XLA's gather on TPU runs at per-element speed (~GB/s) — hopeless for the
tens of millions of rows the rasterization worklists move every step. These
kernels replace every large gather in the pipeline with *windowed one-hot
selection on the MXU*, exploiting two structural facts:

  1. Both expansions in the pipeline are MONOTONE: emission slots map to
     non-decreasing gaussian rows (run expansion), and aligned slots map to
     non-decreasing sorted rows (per-tile chunk padding). A chunk of CH
     output slots therefore draws from a bounded, contiguous source window
     (≤ CH+1 rows), which one async DMA stages into VMEM.
  2. One-hot selection via f32 matmul is BIT-EXACT on the TPU MXU at any
     precision (products with 0.0/1.0 are exact and each row sums exactly
     one nonzero term) — verified for the full f32 range incl. denormals.

Replaces (TPU-natively, not structurally) the reference's expansion and
staging machinery: gsplat/cuda/csrc/IntersectTile.cu:214-524 (second-pass
key emission) and the rasterizer's shared-memory gaussian staging
(RasterizeToPixels3DGSSerialBatchFwd.cu:163-193, one thread-per-gaussian
random load) — random access that is cheap on GPUs and catastrophic on TPU.

Kernel A (`expand_emission`): per-gaussian attribute table [F_tab, E_pad]
  -> per-emission-slot sort keys (tile, depth) + render fields, in one pass.
  Every gaussian emits max(tiles_covered, 1) slots (culled gaussians emit a
  single sentinel-keyed dummy so source windows stay bounded).

Kernel B (`align_rows`): depth-sorted field rows [F, P_pad] -> chunk-aligned
  per-tile layout [F, A] consumed by the rasterization kernels.

Integer transport: large ints ride as (hi, lo) = (v >> 12, v & 4095) f32
column pairs (each < 2**24, exact) and are recombined in int32 on the VPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import sel_01_exact

CH = 512  # output slots per grid step: the one-hot selection work per
# slot scales with W_A ~= CH + 256, so smaller chunks cut VPU compare
# work ~linearly until window-DMA / grid overhead dominates (measured on
# the garden bench: 1024 -> 122 ms, 512 -> 87 ms, 256 -> 86 ms; 512 is
# the knee)
W_A = 768  # source window rows: >= CH + 1 runs + 128 alignment slack
LANE = 128  # window base alignment (DMA minor-dim constraint)

# Kernel-A table row indices (f32, field-major [F_tab, E_pad]):
ROW_CUMEX_HI = 0  # exclusive emission cumsum, hi 20 bits (v >> 12)
ROW_CUMEX_LO = 1  # exclusive emission cumsum, lo 12 bits
ROW_CUMIN_HI = 2  # inclusive emission cumsum, hi
ROW_CUMIN_LO = 3  # inclusive emission cumsum, lo
ROW_TMINX = 4  # tile rect min x (sentinel-placed for culled gaussians)
ROW_TMINY = 5
ROW_W = 6  # tile rect width (>= 1)
ROW_IM = 7  # image index (== n_images for culled => sentinel keys)
ROW_DEPTH = 8
ROW_FIELDS = 9  # render fields start: x, y, ca, cb, cc, op, colors...


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _hi_lo(v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """int32 -> exact (hi, lo) f32 pair (12-bit split)."""
    return (v >> 12).astype(jnp.float32), (v & 0xFFF).astype(jnp.float32)


def _recombine(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """(hi, lo) f32 pair -> int32."""
    return hi.astype(jnp.int32) * 4096 + lo.astype(jnp.int32)


def _sel(win_rows: jax.Array, onehot: jax.Array) -> jax.Array:
    """Select columns: (F, W) x (CH, W) -> (F, CH).

    Bit-exactness is REQUIRED (Mosaic's default f32 matmul is single-pass
    bf16 — integers over 256 and most f32 fields round!).  The one-hot side
    is exact in bf16, so the exact three-component data split (ops/mxu.py)
    reaches full f32 reconstruction in 3 MXU passes — each output is a
    single product term per component, summed exactly — at half the cost of
    Precision.HIGHEST (which decomposes both sides: 6 passes).  Verified on
    hardware across the f32 range in tests/test_mxu.py.
    """
    return sel_01_exact(win_rows, onehot)


def _int_divmod(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exact int32 floor-div/mod for 0 <= a < 2**24, 1 <= b < 2**24.

    Float division with a one-step correction (float rounding can put the
    quotient off by one near exact multiples).
    """
    q = jnp.floor(a.astype(jnp.float32) / b.astype(jnp.float32)).astype(
        jnp.int32
    )
    r = a - q * b
    under = r < 0
    q = jnp.where(under, q - 1, q)
    r = jnp.where(under, r + b, r)
    over = r >= b
    q = jnp.where(over, q + 1, q)
    r = jnp.where(over, r - b, r)
    return q, r


# ---------------------------------------------------------------------------
# Kernel A: emission expansion (table -> keys + fields per emission slot)
# ---------------------------------------------------------------------------


def _expand_kernel(
    # scalar prefetch
    win_starts_ref,  # [K] int32, window base row (multiple of LANE)
    nslots_ref,  # [1] int32 live emission slots
    # inputs
    table_hbm,  # [F_tab, E_pad] f32 in HBM
    # outputs
    fields_ref,  # (R_pad, CH) f32; rows R..R+4 carry key/flat hi-lo + depth
    # scratch
    buf_ref,  # (2, F_tab, W_A) VMEM
    sem,  # (2,) DMA semaphores
    *,
    n_render: int,
    tile_w: int,
    tiles_per_im: int,
    sentinel: int,
):
    c = pl.program_id(0)
    n_c = pl.num_programs(0)
    slot0 = c * CH

    def dma(slot, cc):
        off = pl.multiple_of(win_starts_ref[cc], LANE)
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(off, W_A)], buf_ref.at[slot], sem.at[slot]
        )

    @pl.when(c == 0)
    def _():
        dma(0, 0).start()

    slot = jax.lax.rem(c, 2)

    @pl.when(c + 1 < n_c)
    def _():
        dma(1 - slot, c + 1).start()

    dma(slot, c).wait()
    win = buf_ref[slot]  # (F_tab, W_A)
    sb = win_starts_ref[c]

    s_col = slot0 + jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)  # (CH,1)
    cum_ex = _recombine(win[ROW_CUMEX_HI : ROW_CUMEX_HI + 1, :],
                        win[ROW_CUMEX_LO : ROW_CUMEX_LO + 1, :])  # (1, W)
    cum_in = _recombine(win[ROW_CUMIN_HI : ROW_CUMIN_HI + 1, :],
                        win[ROW_CUMIN_LO : ROW_CUMIN_LO + 1, :])
    live = s_col < nslots_ref[0]
    hot_b = (s_col >= cum_ex) & (s_col < cum_in) & live  # (CH, W)
    onehot = hot_b.astype(jnp.float32)

    # one MXU pass selects every per-slot attribute (bit-exact); an extra
    # iota row recovers the selected source index j (< W_A < 2**24: exact)
    # and a ones row recovers the per-slot hit count (the "found" mask)
    jf = jax.lax.broadcasted_iota(jnp.int32, (1, W_A), 1).astype(jnp.float32)
    ones = jnp.ones((1, W_A), jnp.float32)
    sel = _sel(jnp.concatenate([win, jf, ones], axis=0), onehot)
    tminx = sel[ROW_TMINX : ROW_TMINX + 1].astype(jnp.int32)  # (1, CH)
    tminy = sel[ROW_TMINY : ROW_TMINY + 1].astype(jnp.int32)
    w_rect = jnp.maximum(sel[ROW_W : ROW_W + 1].astype(jnp.int32), 1)
    im = sel[ROW_IM : ROW_IM + 1].astype(jnp.int32)
    depth = sel[ROW_DEPTH : ROW_DEPTH + 1]
    fields = sel[ROW_FIELDS : ROW_FIELDS + n_render]  # (R, CH)
    j = sel[-2:-1].astype(jnp.int32)
    flat = sb + j  # (1, CH)

    # within-run position -> covered tile
    cumex_sel = _recombine(
        sel[ROW_CUMEX_HI : ROW_CUMEX_HI + 1],
        sel[ROW_CUMEX_LO : ROW_CUMEX_LO + 1],
    )
    s_row = slot0 + jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
    within = s_row - cumex_sel  # (1, CH)
    q, r = _int_divmod(within, w_rect)
    ty = tminy + q
    tx = tminx + r
    key = im * tiles_per_im + ty * tile_w + tx

    found = sel[-1:] > 0.0  # (1, CH) — selected-count row
    key = jnp.where(found, jnp.minimum(key, sentinel), sentinel)
    depth = jnp.where(found, depth, jnp.inf)
    flat = jnp.where(found, flat, 0)

    fields_ref[0:n_render, :] = fields * found.astype(jnp.float32)
    R = n_render
    fields_ref[R : R + 1, :] = (key >> 12).astype(jnp.float32)
    fields_ref[R + 1 : R + 2, :] = (key & 0xFFF).astype(jnp.float32)
    fields_ref[R + 2 : R + 3, :] = (flat >> 12).astype(jnp.float32)
    fields_ref[R + 3 : R + 4, :] = (flat & 0xFFF).astype(jnp.float32)
    fields_ref[R + 4 : R + 5, :] = depth


@functools.partial(
    jax.jit,
    static_argnames=("n_render", "r_pad", "tile_w", "tiles_per_im",
                     "sentinel", "k"),
)
def expand_emission(
    table: jax.Array,  # [F_tab, E_pad] f32
    win_starts: jax.Array,  # [K] int32 (multiples of LANE)
    n_slots: jax.Array,  # [1] int32
    *,
    n_render: int,
    r_pad: int,
    tile_w: int,
    tiles_per_im: int,
    sentinel: int,
    k: int,
):
    """Expand per-gaussian rows to per-emission-slot keys and fields.

    Returns (tile_key [K*CH] i32, depth [K*CH] f32, flat_id [K*CH] i32,
    fields [r_pad, K*CH] f32).
    """
    F_tab = table.shape[0]
    assert r_pad >= n_render + 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((r_pad, CH), lambda c, *_: (0, c)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, F_tab, W_A), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _expand_kernel,
        n_render=n_render,
        tile_w=tile_w,
        tiles_per_im=tiles_per_im,
        sentinel=sentinel,
    )
    (fields,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, k * CH), jnp.float32),
        ],
        interpret=_interpret(),
    )(win_starts, n_slots, table)
    R = n_render
    key = _recombine(fields[R], fields[R + 1])
    flat = _recombine(fields[R + 2], fields[R + 3])
    depth = fields[R + 4]
    return key, depth, flat, fields


# ---------------------------------------------------------------------------
# Kernel B: monotone row alignment (sorted order -> chunk-aligned order)
# ---------------------------------------------------------------------------


def _align_kernel(
    # scalar prefetch
    win_starts_ref,  # [K2] int32 (multiples of LANE)
    # inputs
    src_ref,  # (8, CH) int32: 8 chunks' source indices (-1 = padding)
    rows_hbm,  # [F, P_pad] f32 in HBM
    # outputs
    out_ref,  # (F, CH)
    # scratch
    buf_ref,  # (2, F, W_A)
    sem,
):
    c = pl.program_id(0)
    n_c = pl.num_programs(0)

    def dma(slot, cc):
        off = pl.multiple_of(win_starts_ref[cc], LANE)
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(off, W_A)], buf_ref.at[slot], sem.at[slot]
        )

    @pl.when(c == 0)
    def _():
        dma(0, 0).start()

    slot = jax.lax.rem(c, 2)

    @pl.when(c + 1 < n_c)
    def _():
        dma(1 - slot, c + 1).start()

    dma(slot, c).wait()
    win = buf_ref[slot]  # (F, W_A)

    src_row = src_ref[pl.ds(jax.lax.rem(c, 8), 1), :]  # (1, CH)
    rel = jnp.transpose(src_row, (1, 0)) - win_starts_ref[c]  # (CH, 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, W_A), 1)
    onehot = ((rel == jj) & (rel >= 0)).astype(jnp.float32)  # (CH, W)
    out_ref[:, :] = _sel(win, onehot)


@functools.partial(jax.jit, static_argnames=("k",))
def align_rows(
    rows: jax.Array,  # [F, P_pad] f32 (field-major, depth-sorted)
    src_idx: jax.Array,  # [K2, CH] int32 (-1 for padding slots)
    win_starts: jax.Array,  # [K2] int32 (multiples of LANE)
    *,
    k: int,
):
    """aligned[f, a] = rows[f, src_idx[a]] (0 for padding) — monotone gather.

    Returns [F, K2*CH] f32.
    """
    F = rows.shape[0]
    k8 = _round_up_int(k, 8)
    if k8 != k:  # pad chunk rows so the (8, CH) src blocks stay in range
        src_idx = jnp.concatenate(
            [src_idx, jnp.full((k8 - k, CH), -1, src_idx.dtype)]
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((8, CH), lambda c, *_: (c // 8, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((F, CH), lambda c, *_: (0, c))],
        scratch_shapes=[
            pltpu.VMEM((2, F, W_A), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        _align_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((F, k * CH), jnp.float32)],
        interpret=_interpret(),
    )(win_starts, src_idx, rows)
    return out


def _round_up_int(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Kernel A2: two-window emission expansion (row-record geometry + per-
# gaussian fields).  Used by the tight-intersection 3DGS path: the per-tile-
# row interval records carry only geometry, and render fields are selected
# straight from the per-gaussian table through a second windowed one-hot —
# fields are never materialized at row-record granularity in HBM.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Kernel A0: row-record expansion (gaussian table -> per-tile-row interval
# records).  Replaces an XLA fill-forward + per-element row gather (which
# runs ~1.5ns/element on TPU) with a windowed one-hot selection plus the
# closed-form ellipse-row interval math on the VPU.
# ---------------------------------------------------------------------------

# gaussian-table row indices for expand_rows (f32, [24, E_pad]):
GG_EX_HI = 0  # exclusive row-count cumsum, hi 20 bits
GG_EX_LO = 1
GG_IN_HI = 2
GG_IN_LO = 3
GG_RY0 = 4  # first covered tile row
GG_IM = 5  # image id (sentinel n_images for dummies)
GG_TMINX = 6
GG_TMAXX = 7
GG_AABB = 8  # 1.0 = fall back to the AABB interval
GG_MX = 9
GG_MY = 10
GG_A = 11  # conic a
GG_B = 12
GG_C = 13
GG_SIG = 14  # sigma_max = log(op / alpha_threshold), inflated
GG_YEXT = 15
GG_XEXT = 16
GG_DET = 17
GG_ROWS = 18  # padded to 24 for DMA alignment


def _expand_rows_kernel(
    # scalar prefetch
    gwin_ref,  # [Kr] int32 gaussian window bases (multiples of LANE)
    nrows_ref,  # [1] int32 live row records
    # inputs
    table_gg_hbm,  # [24, E_pad] f32
    # outputs
    out_ref,  # (8, CH): X0, TY, IM, W, GID_HI, GID_LO, pad, pad
    # scratch
    buf_ref,  # (2, 24, W_A)
    sem,
    *,
    tile_size: int,
    n_images: int,
):
    c = pl.program_id(0)
    n_c = pl.num_programs(0)

    def dma(slot, cc):
        off = pl.multiple_of(gwin_ref[cc], LANE)
        return pltpu.make_async_copy(
            table_gg_hbm.at[:, pl.ds(off, W_A)], buf_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(c == 0)
    def _():
        dma(0, 0).start()

    slot = jax.lax.rem(c, 2)

    @pl.when(c + 1 < n_c)
    def _():
        dma(1 - slot, c + 1).start()

    dma(slot, c).wait()
    win = buf_ref[slot]  # (24, W_A)
    row0 = c * CH

    r_col = row0 + jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)  # (CH,1)
    gh_ex = _recombine(win[GG_EX_HI : GG_EX_HI + 1, :],
                       win[GG_EX_LO : GG_EX_LO + 1, :])
    gh_in = _recombine(win[GG_IN_HI : GG_IN_HI + 1, :],
                       win[GG_IN_LO : GG_IN_LO + 1, :])
    live = r_col < nrows_ref[0]
    hot = ((r_col >= gh_ex) & (r_col < gh_in) & live).astype(jnp.float32)

    jf = jax.lax.broadcasted_iota(jnp.int32, (1, W_A), 1).astype(jnp.float32)
    ones = jnp.ones((1, W_A), jnp.float32)
    sel = _sel(jnp.concatenate([win, jf, ones], axis=0), hot)  # (26, CH)
    found = sel[-1:] > 0.0
    gid = gwin_ref[c] + sel[-2:-1].astype(jnp.int32)
    g_ex = _recombine(sel[GG_EX_HI : GG_EX_HI + 1],
                      sel[GG_EX_LO : GG_EX_LO + 1])
    ry0 = sel[GG_RY0 : GG_RY0 + 1].astype(jnp.int32)
    im = sel[GG_IM : GG_IM + 1].astype(jnp.int32)
    tminx = sel[GG_TMINX : GG_TMINX + 1].astype(jnp.int32)
    tmaxx = sel[GG_TMAXX : GG_TMAXX + 1].astype(jnp.int32)
    aabb = sel[GG_AABB : GG_AABB + 1] > 0.5
    mx = sel[GG_MX : GG_MX + 1]
    my = sel[GG_MY : GG_MY + 1]
    a = jnp.maximum(sel[GG_A : GG_A + 1], 1e-12)
    b = sel[GG_B : GG_B + 1]
    cc_ = jnp.maximum(sel[GG_C : GG_C + 1], 1e-12)
    sig = sel[GG_SIG : GG_SIG + 1]
    yext = sel[GG_YEXT : GG_YEXT + 1]
    xext = sel[GG_XEXT : GG_XEXT + 1]
    det = sel[GG_DET : GG_DET + 1]

    r_row = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
    q = r_row - g_ex
    ty = ry0 + q
    ts = float(tile_size)

    # exact x-interval of the ellipse over the tile-row band (see
    # ops/rasterize.py:make_tight_plan for the derivation)
    u0 = ty.astype(jnp.float32) * ts - my
    u1 = u0 + ts
    uc0 = jnp.clip(u0, -yext, yext)
    uc1 = jnp.clip(u1, -yext, yext)

    def dx_hi(u):
        disc = jnp.maximum(2.0 * sig * a - det * u * u, 0.0)
        return (-b * u + jnp.sqrt(disc)) / a

    def dx_lo(u):
        disc = jnp.maximum(2.0 * sig * a - det * u * u, 0.0)
        return (-b * u - jnp.sqrt(disc)) / a

    u_star_hi = -(b / cc_) * xext
    u_star_lo = (b / cc_) * xext
    hi = jnp.maximum(dx_hi(uc0), dx_hi(uc1))
    hi = jnp.where((u_star_hi >= uc0) & (u_star_hi <= uc1), xext, hi)
    lo = jnp.minimum(dx_lo(uc0), dx_lo(uc1))
    lo = jnp.where((u_star_lo >= uc0) & (u_star_lo <= uc1), -xext, lo)
    hi = hi + 1e-3
    lo = lo - 1e-3

    x0 = jnp.clip(
        jnp.floor((mx + lo) / ts).astype(jnp.int32),
        tminx, jnp.maximum(tmaxx - 1, tminx),
    )
    x1 = jnp.clip(jnp.ceil((mx + hi) / ts).astype(jnp.int32), x0 + 1, tmaxx)
    x0 = jnp.where(aabb, tminx, x0)
    x1 = jnp.where(aabb, tmaxx, x1)
    w = jnp.maximum(x1 - x0, 1)

    is_dummy = im == n_images
    x0 = jnp.where(is_dummy, 0, x0)
    ty = jnp.where(is_dummy, 0, ty)
    w = jnp.where(is_dummy, 1, w)

    x0 = jnp.where(found, x0, 0)
    ty = jnp.where(found, ty, 0)
    im = jnp.where(found, im, n_images)
    w = jnp.where(found, w, 0)
    gid = jnp.where(found, gid, 0)

    out_ref[0:1, :] = x0.astype(jnp.float32)
    out_ref[1:2, :] = ty.astype(jnp.float32)
    out_ref[2:3, :] = im.astype(jnp.float32)
    out_ref[3:4, :] = w.astype(jnp.float32)
    out_ref[4:5, :] = (gid >> 12).astype(jnp.float32)
    out_ref[5:6, :] = (gid & 0xFFF).astype(jnp.float32)
    out_ref[6:8, :] = jnp.zeros((2, CH), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("tile_size", "n_images", "kr")
)
def expand_rows(
    table_gg: jax.Array,  # [24, E_pad] f32
    gwin: jax.Array,  # [Kr] int32 (multiples of LANE)
    n_rows: jax.Array,  # [1] int32
    *,
    tile_size: int,
    n_images: int,
    kr: int,
):
    """Expand per-gaussian geometry to per-tile-row interval records.

    Returns (x0 [R] i32, ty [R] i32, im [R] i32, w [R] i32, gid [R] i32)
    with R = kr * CH.
    """
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(kr,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((8, CH), lambda c, *_: (0, c))],
        scratch_shapes=[
            pltpu.VMEM((2, table_gg.shape[0], W_A), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _expand_rows_kernel, tile_size=tile_size, n_images=n_images
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, kr * CH), jnp.float32)],
        interpret=_interpret(),
    )(gwin, n_rows, table_gg)
    x0 = out[0].astype(jnp.int32)
    ty = out[1].astype(jnp.int32)
    im = out[2].astype(jnp.int32)
    w = out[3].astype(jnp.int32)
    gid = _recombine(out[4], out[5])
    return x0, ty, im, w, gid


# table_rr row indices (f32, [9, R_pad]):
RR_CUMEX_HI = 0  # exclusive slot cumsum over row records, hi 20 bits
RR_CUMEX_LO = 1
RR_CUMIN_HI = 2
RR_CUMIN_LO = 3
RR_X0 = 4  # first covered tile column of the row interval
RR_TY = 5  # tile row
RR_IM = 6  # image id (== n_images for dummy records => sentinel keys)
RR_GID_HI = 7  # source gaussian row in [0, E)
RR_GID_LO = 8
RR_ROWS = 9

# table_g rows are the render fields (depth ordering is established by the
# depth-compacted gaussian order upstream; the big sort's second key is the
# emission position, so per-tile slot order = gaussian order = depth order).


def _expand2_kernel(
    # scalar prefetch
    win1_ref,  # [K] int32 row-record window bases (multiples of LANE)
    win2_ref,  # [K] int32 gaussian window bases (multiples of LANE)
    nslots_ref,  # [1] int32 live emission slots
    # inputs
    table_rr_hbm,  # [9, R_pad] f32 in HBM
    table_g_hbm,  # [F2, E_pad] f32 in HBM
    # outputs
    fields_ref,  # (r_pad, CH) f32
    # scratch
    buf1_ref,  # (2, 9, W_A)
    buf2_ref,  # (2, F2, W_A)
    sem1,
    sem2,
    *,
    n_render: int,
    tile_w: int,
    tiles_per_im: int,
    sentinel: int,
    packed: bool = False,
    tile_size: int = 16,
):
    c = pl.program_id(0)
    n_c = pl.num_programs(0)

    def dma1(slot, cc):
        off = pl.multiple_of(win1_ref[cc], LANE)
        return pltpu.make_async_copy(
            table_rr_hbm.at[:, pl.ds(off, W_A)], buf1_ref.at[slot],
            sem1.at[slot],
        )

    def dma2(slot, cc):
        off = pl.multiple_of(win2_ref[cc], LANE)
        return pltpu.make_async_copy(
            table_g_hbm.at[:, pl.ds(off, W_A)], buf2_ref.at[slot],
            sem2.at[slot],
        )

    @pl.when(c == 0)
    def _():
        dma1(0, 0).start()
        dma2(0, 0).start()

    slot = jax.lax.rem(c, 2)

    @pl.when(c + 1 < n_c)
    def _():
        dma1(1 - slot, c + 1).start()
        dma2(1 - slot, c + 1).start()

    dma1(slot, c).wait()
    dma2(slot, c).wait()
    win1 = buf1_ref[slot]  # (9, W_A)
    win2 = buf2_ref[slot]  # (F2, W_A)
    slot0 = c * CH

    s_col = slot0 + jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)  # (CH,1)
    cum_ex = _recombine(win1[RR_CUMEX_HI : RR_CUMEX_HI + 1, :],
                        win1[RR_CUMEX_LO : RR_CUMEX_LO + 1, :])  # (1, W)
    cum_in = _recombine(win1[RR_CUMIN_HI : RR_CUMIN_HI + 1, :],
                        win1[RR_CUMIN_LO : RR_CUMIN_LO + 1, :])
    live = s_col < nslots_ref[0]
    hot1 = ((s_col >= cum_ex) & (s_col < cum_in) & live).astype(jnp.float32)

    ones = jnp.ones((1, W_A), jnp.float32)
    sel1 = _sel(jnp.concatenate([win1, ones], axis=0), hot1)  # (10, CH)
    x0 = sel1[RR_X0 : RR_X0 + 1].astype(jnp.int32)
    ty = sel1[RR_TY : RR_TY + 1].astype(jnp.int32)
    im = sel1[RR_IM : RR_IM + 1].astype(jnp.int32)
    gid = _recombine(sel1[RR_GID_HI : RR_GID_HI + 1],
                     sel1[RR_GID_LO : RR_GID_LO + 1])  # (1, CH)
    cumex_sel = _recombine(sel1[RR_CUMEX_HI : RR_CUMEX_HI + 1],
                           sel1[RR_CUMEX_LO : RR_CUMEX_LO + 1])
    found = sel1[-1:] > 0.0  # (1, CH)

    # within-run position -> covered tile column (single interval: no divmod)
    s_row = slot0 + jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
    tx = x0 + (s_row - cumex_sel)
    key = im * tiles_per_im + ty * tile_w + tx
    key = jnp.where(found, jnp.minimum(key, sentinel), sentinel)

    # second one-hot: fields by gaussian id (gid is monotone across slots;
    # consecutive row records differ by <= 1 gaussian, so a CH-slot chunk
    # spans <= CH + LANE gaussians — inside the W_A window)
    rel2 = gid - win2_ref[c]  # (1, CH)
    # hot2[slot s, window col i] = (rel2[s] == i) & found[s]
    # (transpose in f32 — Mosaic cannot transpose i1/i32 vectors; rel2 and
    # the window iota are < 2**24 so the f32 compare is exact)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (CH, W_A), 1).astype(
        jnp.float32
    )
    rel2_col = jnp.transpose(rel2.astype(jnp.float32), (1, 0))  # (CH, 1)
    found_col = jnp.transpose(sel1[-1:], (1, 0))  # (CH, 1) f32 hit count
    hot2 = (
        (rel2_col == iota_w) & (rel2_col >= 0.0) & (found_col > 0.0)
    ).astype(jnp.float32)
    sel2 = _sel(win2, hot2)  # (F2, CH)
    fields = sel2[0:n_render] * found.astype(jnp.float32)

    if packed:
        # inference fast path: emit TILE-LOCAL coords + bf16-pair rows
        # (half the sort payload; see rasterize_pallas._unpack_chunk)
        from .mxu import pack_bf16_pair

        D = n_render - 6
        fmask = found.astype(jnp.float32)
        x_loc = fields[0:1] - (tx * tile_size).astype(jnp.float32) * fmask
        y_loc = fields[1:2] - (ty * tile_size).astype(jnp.float32) * fmask
        rows = [
            pack_bf16_pair(x_loc, y_loc),
            pack_bf16_pair(fields[2:3], fields[3:4]),  # (ca, cb)
            pack_bf16_pair(fields[4:5], fields[5:6]),  # (cc, op)
        ]
        for i in range(0, D, 2):
            hi = fields[6 + i : 7 + i]
            lo = (
                fields[7 + i : 8 + i]
                if i + 1 < D
                else jnp.zeros_like(hi)
            )
            rows.append(pack_bf16_pair(hi, lo))
        R = len(rows)
        fields_ref[0:R, :] = jnp.concatenate(rows, axis=0)
    else:
        fields_ref[0:n_render, :] = fields
        R = n_render
    fields_ref[R : R + 1, :] = (key >> 12).astype(jnp.float32)
    fields_ref[R + 1 : R + 2, :] = (key & 0xFFF).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_render", "r_pad", "tile_w", "tiles_per_im",
                     "sentinel", "k", "packed", "tile_size"),
)
def expand_emission2(
    table_rr: jax.Array,  # [9, R_pad] f32 row-record geometry
    table_g: jax.Array,  # [F2, E_pad] f32 render fields
    win1: jax.Array,  # [K] int32 (multiples of LANE)
    win2: jax.Array,  # [K] int32 (multiples of LANE)
    n_slots: jax.Array,  # [1] int32
    *,
    n_render: int,
    r_pad: int,
    tile_w: int,
    tiles_per_im: int,
    sentinel: int,
    k: int,
    packed: bool = False,
    tile_size: int = 16,
):
    """Two-window emission expansion for the tight-intersection path.

    Returns (tile_key [K*CH] i32, fields [r_pad, K*CH] f32).  Slot order is
    emission order (gaussian-major): with depth-compacted gaussians the
    per-tile sub-order after a stable-by-key sort is depth order, so no
    depth or id rows ride the big sort.
    """
    F2 = table_g.shape[0]
    n_out = (3 + -(-(n_render - 6) // 2)) if packed else n_render
    assert r_pad >= n_out + 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((r_pad, CH), lambda c, *_: (0, c)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, table_rr.shape[0], W_A), jnp.float32),
            pltpu.VMEM((2, F2, W_A), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _expand2_kernel,
        n_render=n_render,
        tile_w=tile_w,
        tiles_per_im=tiles_per_im,
        sentinel=sentinel,
        packed=packed,
        tile_size=tile_size,
    )
    (fields,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, k * CH), jnp.float32),
        ],
        interpret=_interpret(),
    )(win1, win2, n_slots, table_rr, table_g)
    key = _recombine(fields[n_out], fields[n_out + 1])
    return key, fields
