"""rasterize_to_pixels: the differentiable tile rasterization op.

Public analog of gsplat/cuda/_wrapper.py:rasterize_to_pixels (:1337) with a
jax.custom_vjp around an entirely gather-free TPU pipeline (XLA gathers run
at per-element speed on TPU — every large reorder here is either a sort or
a Pallas windowed one-hot MXU selection, see ops/gather_pallas.py):

  forward:
    1. tight emission plan (XLA): per gaussian, the *exact* per-tile-row
       coverage interval of the alpha>=1/255 ellipse (the TPU analog of the
       reference's AccuTile conservative ellipse-tile test,
       gsplat/cuda/csrc/IntersectTile.cu:96-207 — here in closed form per
       row, which is tighter).  Row-interval records are expanded by a
       boundary-scatter + cummax fill-forward (no searchsorted).
    2. expand_emission2 (Pallas, two windows): per-slot tile_key + render
       fields selected straight from the per-gaussian table.  Culled
       gaussians emit one sentinel-keyed dummy so source windows stay
       bounded.
    3. jax.lax.sort by (tile_key, emission position) with the fields as
       payload — the TPU replacement for the CUB radix sort
       (IntersectTile.cu:1078).  Gaussians are depth-compacted upfront
       (the visibility compaction's second key), so the stable-by-tile
       order IS front-to-back depth order: no depth or id rows ride the
       sort, and the emission position doubles as the backward grouping
       key.
    4. per-tile spans by searchsorted (T+1 queries); the Pallas forward
       kernel reads each tile's UNALIGNED span directly from the sorted
       buffer (floor-128 DMA base + two-sided lane mask) — no alignment
       pass, no extra copy of the worklist.

  backward:
    The Pallas backward kernel replays front-to-back and writes per-slot
    gradients at EXACTLY the sorted-layout positions (boundary chunks merge
    through a VMEM carry; see ops/rasterize_pallas.py).  They are payload-
    sorted by row-record id — row ids of one gaussian are contiguous, so
    one cumsum + one boundary gather per gaussian finishes the reduction —
    deterministic, no atomics (a correctness upgrade over the CUDA
    atomicAdd path).

Images are computed in a tiled [n_tiles, D, 256] layout inside the kernels
and reassembled here (tile_image/untile_image); background blending and
alpha composition happen in plain jnp outside the custom_vjp (autodiff).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gather_pallas import (
    CH,
    LANE,
    W_A,
    _hi_lo,
    _recombine,
    align_rows,
    expand_emission,
    expand_emission2,
    expand_rows,
)
from .isect import _fill_forward_index, build_tile_worklist
from .projection import ALPHA_THRESHOLD
from .rasterize_pallas import (
    DEFAULT_CHUNK,
    N_PIX,
    TILE,
    _bwd_call,
    _fwd_call,
    grad_pack_rows,
    packed_rows,
)
from .mxu import unpack_bf16_pair
from .segsum_pallas import PIECE as SEG_PIECE
from .segsum_pallas import SEG as SEG_SEG
from .segsum_pallas import segment_rowsum

ID_SENTINEL = 1 << 30  # sorts after every real row-record id

# Lane width of the fwd/bwd kernels' DMA chunks.  Any multiple of 128 is
# legal (the hard TPU constraint is minor-dim % 128 == 0); wider chunks
# amortize per-iteration overhead (DMA issue/wait, loop control, scan-matrix
# pipeline bubbles) over more slots at the cost of a coarser early-exit and
# more boundary waste.  Tuned on the garden 4k bench; override to re-tune:
# GSPLAT_TPU_RASTER_CHUNK=128|256|512.
import os as _os

RASTER_CHUNK = int(_os.environ.get("GSPLAT_TPU_RASTER_CHUNK", "256"))
if RASTER_CHUNK <= 0 or RASTER_CHUNK % DEFAULT_CHUNK != 0:
    # explicit raise (not assert: python -O would strip it and a
    # non-128-multiple chunk reaches the kernels as misaligned DMA bases)
    raise ValueError(
        f"GSPLAT_TPU_RASTER_CHUNK must be a positive multiple of "
        f"{DEFAULT_CHUNK}, got {RASTER_CHUNK}"
    )

# The bwd replay kernel holds ~2x the fwd kernel's VMEM working set (carry
# boundaries + grad accumulators per field row); at tile_size=32 it is the
# only stage over the 16 MiB scoped-VMEM limit at chunk 256.  Allow an
# independent (smaller) bwd chunk — the span bases are recomputed below, so
# fwd can keep its tuned width.
RASTER_CHUNK_BWD = int(
    _os.environ.get("GSPLAT_TPU_RASTER_CHUNK_BWD", str(RASTER_CHUNK))
)
if RASTER_CHUNK_BWD <= 0 or RASTER_CHUNK_BWD % DEFAULT_CHUNK != 0:
    raise ValueError(
        f"GSPLAT_TPU_RASTER_CHUNK_BWD must be a positive multiple of "
        f"{DEFAULT_CHUNK}, got {RASTER_CHUNK_BWD}"
    )

# Training-sort payload compression (lax.sort cost is ~per-OPERAND on TPU,
# nearly independent of the keys — see docs/perf-analysis.md):
#   PACK_SORT: the big emission sort carries bf16-pair packed render fields
#     (tile-local coords), 2 + ceil((6+D)/2)+1 operands instead of 2 + 6+D.
#     The forward AND its vjp replay the same quantized fields, so the
#     gradients are the exact autodiff of the (slightly) quantized forward.
#   PACK_GRADS: the backward id-sort carries bf16-pair packed per-slot
#     gradients (1 + ceil((6+D)/2) operands instead of 1 + 6+D) and the
#     kernel's [F_out, P] HBM grad write halves.  ~2**-9 per-slot relative
#     error entering the per-gaussian sums.
# The op-level default stays EXACT (f32 payloads) so the public op keeps
# bit-level parity with the oracle/BASELINE contract; the trainers and
# bench.py opt in (Config.pack_payload/pack_grads, default True there) —
# gated on the 4k-step MCMC quality benchmark: packed 40.29 dB heldout
# vs exact 40.73 at 4k steps, inside the benchmark's ±0.8 dB
# eval-to-eval swing (docs/perf-analysis.md round-5 table), for +13%
# step rate.
PACK_SORT = _os.environ.get("GSPLAT_TPU_PACK_SORT", "0") != "0"
PACK_GRADS = _os.environ.get("GSPLAT_TPU_PACK_GRADS", "0") != "0"


def tile_image(img: jax.Array, tile_size: int = TILE) -> jax.Array:
    """[I, H, W, D] -> [I*th*tw, D, ts*ts] (H, W padded up to tile multiples)."""
    I, H, W, D = img.shape
    ts = tile_size
    th, tw = -(-H // ts), -(-W // ts)
    img = jnp.pad(img, ((0, 0), (0, th * ts - H), (0, tw * ts - W), (0, 0)))
    x = img.reshape(I, th, ts, tw, ts, D)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # I, th, tw, D, ts, ts
    return x.reshape(I * th * tw, D, ts * ts)


def untile_image(
    x: jax.Array, I: int, th: int, tw: int, H: int, W: int, tile_size: int = TILE
) -> jax.Array:
    """[I*th*tw, D, ts*ts] -> [I, H, W, D] (cropping tile padding)."""
    ts = tile_size
    D = x.shape[1]
    x = x.reshape(I, th, tw, D, ts, ts)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # I, th, ts, tw, ts, D
    return x.reshape(I, th * ts, tw * ts, D)[:, :H, :W]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_tail(x: jax.Array, n: int, value) -> jax.Array:
    return jnp.concatenate([x, jnp.full((n,), value, x.dtype)])


# ---------------------------------------------------------------------------
# Tight emission plan (3DGS path)
# ---------------------------------------------------------------------------


class TightPlan(NamedTuple):
    """Static-shape tight tile-emission layout (non-differentiable).

    Row-record level arrays live at [row_cap]; one record = one gaussian x
    one covered tile row, carrying the exact tile-column interval of the
    alpha>=1/255 ellipse within that row.  Semantics parity (which tiles a
    gaussian can touch): gsplat/cuda/csrc/IntersectTile.cu:96-207 AccuTile,
    but per-row closed form.  Culled/degenerate gaussians hold one dummy
    record (sentinel image id) so expansion windows stay bounded.
    """

    rr_cum_ex: jax.Array  # [row_cap] exclusive slot cumsum
    rr_cum_in: jax.Array  # [row_cap] inclusive slot cumsum
    rr_x0: jax.Array  # [row_cap] first covered tile column
    rr_ty: jax.Array  # [row_cap] tile row
    rr_im: jax.Array  # [row_cap] image id (n_images for dummies)
    rr_gid: jax.Array  # [row_cap] source gaussian row in [0, E)
    win1: jax.Array  # [K] row-record window bases
    win2: jax.Array  # [K] gaussian window bases
    n_slots: jax.Array  # [1] live emission slots (<= cap_total)
    gh_bounds: jax.Array  # [E+1] row-record boundaries per gaussian
    dummy: jax.Array  # [E] bool: no real coverage
    n_isects: jax.Array  # [] tight intersections (pre-truncation)
    overflow: jax.Array  # [] bool


def make_tight_plan(
    means2d: jax.Array,  # [E, 2] (visibility-compacted, image-major ids in im_g)
    radii: jax.Array,  # [E, 2] int32
    conics: jax.Array,  # [E, 3]
    opacities: jax.Array,  # [E]
    im_g: jax.Array,  # [E] int32 image id per gaussian row
    n_live: jax.Array,  # [] int32: rows < n_live are the visible prefix
    n_images: int,
    tile_size: int,
    tile_width: int,
    tile_height: int,
    cap_total: int,
    row_cap: int,
) -> TightPlan:
    E = means2d.shape[0]
    I = n_images
    ts = float(tile_size)
    m2 = jax.lax.stop_gradient(means2d)
    rad = radii
    con = jax.lax.stop_gradient(conics)
    op = jax.lax.stop_gradient(opacities)

    # conservative AABB rect from the projection radii (parity with
    # _torch_impl.py:_isect_tiles coverage; also the fallback footprint)
    tmean = m2 / ts
    trad = rad.astype(m2.dtype) / ts
    tmin = jnp.floor(tmean - trad).astype(jnp.int32)
    tmax = jnp.ceil(tmean + trad).astype(jnp.int32)
    tminx = jnp.clip(tmin[:, 0], 0, tile_width)
    tminy = jnp.clip(tmin[:, 1], 0, tile_height)
    tmaxx = jnp.clip(tmax[:, 0], 0, tile_width)
    tmaxy = jnp.clip(tmax[:, 1], 0, tile_height)
    w_box = tmaxx - tminx
    h_box = tmaxy - tminy
    alive = (rad > 0).all(axis=-1) & (w_box > 0) & (h_box > 0)
    aabb_cnt = jnp.where(alive, w_box * h_box, 0).astype(jnp.int32)

    # tight ellipse extents: alpha >= 1/255  <=>  sigma <= log(op/thr);
    # the rasterizer gates alpha < 1/255 to exactly zero (fwd and bwd), so
    # dropping tiles outside this ellipse is render- and grad-exact.
    a = con[:, 0]
    b = con[:, 1]
    c = con[:, 2]
    mx = m2[:, 0]
    my = m2[:, 1]
    sig_max = jnp.log(jnp.maximum(op, ALPHA_THRESHOLD) / ALPHA_THRESHOLD)
    sig_max = sig_max * (1.0 + 1e-5) + 1e-6
    det = a * c - b * b
    conic_ok = (
        jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(c)
        & (a > 1e-12) & (c > 1e-12) & (det > 1e-18) & (sig_max > 0)
    )
    safe = lambda x, d: jnp.where(conic_ok, x, d)
    a_s = safe(a, 1.0)
    b_s = safe(b, 0.0)
    c_s = safe(c, 1.0)
    det_s = safe(det, 1.0)
    sig_s = safe(sig_max, 1.0)
    yext = jnp.sqrt(2.0 * sig_s * a_s / det_s) * (1.0 + 1e-5) + 1e-3
    xext = jnp.sqrt(2.0 * sig_s * c_s / det_s) * (1.0 + 1e-5) + 1e-3

    my_s = jnp.where(alive, my, 0.0)
    mx_s = jnp.where(alive, mx, 0.0)
    ry0 = jnp.clip(
        jnp.floor((my_s - yext) / ts).astype(jnp.int32), tminy, tmaxy
    )
    ry1 = jnp.clip(
        jnp.ceil((my_s + yext) / ts).astype(jnp.int32), ry0, tmaxy
    )
    use_aabb = alive & ~conic_ok
    ry0 = jnp.where(use_aabb, tminy, ry0)
    ry1 = jnp.where(use_aabb, tmaxy, ry1)
    h_t = jnp.where(alive, ry1 - ry0, 0)
    dummy = h_t == 0
    # Rows exist only for the visibility-compacted prefix; a prefix gaussian
    # with no real coverage still holds one sentinel record so the gaussian
    # ids under any expansion window stay gap-free (gid steps <= 1).  The
    # culled suffix holds zero rows and never enters a window.
    e_ids = jnp.arange(E, dtype=jnp.int32)
    prefix = e_ids < n_live
    h_pad = jnp.where(prefix, jnp.maximum(h_t, 1), 0)

    gh_in = jnp.cumsum(h_pad).astype(jnp.int32)
    gh_ex = gh_in - h_pad
    n_rows_total = gh_in[-1]
    row_overflow = n_rows_total > row_cap
    n_rows = jnp.minimum(n_rows_total, row_cap)
    gh_bounds = jnp.concatenate([gh_ex, n_rows[None]])
    gh_bounds = jnp.clip(gh_bounds, 0, row_cap)

    # row-record expansion in Pallas (windowed one-hot selection + the
    # closed-form interval math; replaces an XLA fill-forward + per-element
    # row gather which runs ~1.5ns/element on TPU)
    im_eff = jnp.where(dummy, I, im_g).astype(jnp.int32)
    f32 = lambda v: v.astype(jnp.float32)
    exh_g, exl_g = _hi_lo(gh_ex)
    inh_g, inl_g = _hi_lo(gh_in)
    tot_hi_g, tot_lo_g = _hi_lo(gh_in[-1:])
    pad = lambda r, v: _pad_tail(r, W_A, v)
    gg_rows = [
        jnp.concatenate([exh_g, jnp.broadcast_to(tot_hi_g, (W_A,))]),
        jnp.concatenate([exl_g, jnp.broadcast_to(tot_lo_g, (W_A,))]),
        jnp.concatenate([inh_g, jnp.broadcast_to(tot_hi_g, (W_A,))]),
        jnp.concatenate([inl_g, jnp.broadcast_to(tot_lo_g, (W_A,))]),
        pad(f32(ry0), 0.0), pad(f32(im_eff), float(I)),
        pad(f32(tminx), 0.0), pad(f32(tmaxx), 1.0),
        pad(jnp.where(use_aabb, 1.0, 0.0), 0.0),
        pad(mx_s, 0.0), pad(my_s, 0.0),
        pad(a_s, 1.0), pad(b_s, 0.0), pad(c_s, 1.0),
        pad(sig_s, 1.0), pad(yext, 1.0), pad(xext, 1.0), pad(det_s, 1.0),
    ]
    gg_rows += [jnp.zeros_like(gg_rows[0])] * (24 - len(gg_rows))
    table_gg = jnp.stack(gg_rows)

    Kr = row_cap // CH
    rprobes = jnp.arange(Kr, dtype=jnp.int32) * CH
    first_g = jnp.searchsorted(gh_in, rprobes, side="right").astype(jnp.int32)
    gwin = jnp.clip((first_g // LANE) * LANE, 0, E)

    x0_r, ty_r, im_r, w_r, gid_r = expand_rows(
        table_gg, gwin, n_rows.reshape(1),
        tile_size=tile_size, n_images=I, kr=Kr,
    )

    rr_cum_in = jnp.cumsum(w_r).astype(jnp.int32)
    rr_cum_ex = rr_cum_in - w_r
    total = rr_cum_in[-1]
    n_dummy = jnp.sum((dummy & prefix).astype(jnp.int32))
    n_isects = total - jnp.minimum(n_dummy, total)
    overflow = (total > cap_total) | row_overflow
    n_slots = jnp.minimum(total, cap_total)

    K = cap_total // CH
    probes = jnp.arange(K, dtype=jnp.int32) * CH
    first_row = jnp.searchsorted(rr_cum_in, probes, side="right").astype(
        jnp.int32
    )
    win1 = jnp.clip((first_row // LANE) * LANE, 0, row_cap)
    gid_first = gid_r[jnp.clip(first_row, 0, row_cap - 1)]
    win2 = jnp.clip((gid_first // LANE) * LANE, 0, E)

    return TightPlan(
        rr_cum_ex=rr_cum_ex, rr_cum_in=rr_cum_in, rr_x0=x0_r, rr_ty=ty_r,
        rr_im=im_r, rr_gid=gid_r, win1=win1, win2=win2,
        n_slots=n_slots.reshape(1), gh_bounds=gh_bounds, dummy=dummy,
        n_isects=n_isects, overflow=overflow,
    )


# ---------------------------------------------------------------------------
# Differentiable core (custom_vjp)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19, 20, 21, 22, 23, 24)
)
def _rasterize_core(
    m2f,  # [E, 2] (original order; cotangent layout only — fwd reads table_g)
    cnf,  # [E, 3]
    clf,  # [E, D]
    opf,  # [E]
    m2abs,  # [E, 2] absgrad carrier (value unused; cotangent = abs grads)
    table_g,  # [F_g, E+W_A] compacted stop-grad render fields (see wrappers)
    perm,  # [E] original row per compacted slot
    rr_cum_ex, rr_cum_in, rr_geo,  # [row_cap] x2, [4, row_cap] (x0,ty,im,gid)
    win1, win2, n_slots_arr,  # [K], [K], [1]
    gh_bounds,  # [E+1] (compacted space)
    dummy_i,  # [E] int32 (compacted space; 1 = no real coverage)
    cap_total: int,
    n_channels: int,
    tile_width: int,
    tile_height: int,
    n_images: int,
    image_size: Tuple[int, int],
    absgrad: bool,
    pack_payload: bool = PACK_SORT,
    pack_grads: bool = PACK_GRADS,
    tile_size: int = TILE,
):
    out, _ = _core_fwd(
        m2f, cnf, clf, opf, m2abs, table_g, perm,
        rr_cum_ex, rr_cum_in, rr_geo,
        win1, win2, n_slots_arr, gh_bounds, dummy_i, cap_total, n_channels,
        tile_width, tile_height, n_images, image_size, absgrad,
        pack_payload, pack_grads, tile_size,
    )
    return out


def _build_field_table(g_rows, dummy_i):
    """Stack compacted render-field rows into the expansion's HBM table.

    Gaussians without coverage may carry NaN/inf fields (e.g. degenerate
    quats project to NaN conics; the reference never touches culled
    gaussians either).  They MUST be zeroed here: the one-hot selection
    matmul multiplies every window entry by 0/1 and sums, and 0 * NaN =
    NaN would poison every slot whose window contains them.

    The rows arrive already in the plan's compacted (depth) order — they
    ride the wrapper's single compaction sort, so the custom_vjp core
    never re-sorts the differentiable fields (the values are identical;
    the backward returns cotangents through perm).
    """
    ok = dummy_i == 0
    g_rows = [jnp.where(ok, r, 0.0) for r in g_rows]
    # DMA slices need 8-aligned sublane counts: pad row dims to multiples of 8
    g_rows += [jnp.zeros_like(g_rows[0])] * (
        _round_up(len(g_rows), 8) - len(g_rows)
    )
    return jnp.stack([_pad_tail(r, W_A, 0.0) for r in g_rows])


def _build_rr_table(rr_cum_ex, rr_cum_in, rr_geo, n_images):
    """Window-padded row-record geometry table for the expansion kernel."""
    row_cap = rr_cum_ex.shape[0]
    exh, exl = _hi_lo(rr_cum_ex)
    inh, inl = _hi_lo(rr_cum_in)
    tot_hi, tot_lo = _hi_lo(rr_cum_in[-1:])
    pad_hi = jnp.broadcast_to(tot_hi, (W_A,))
    pad_lo = jnp.broadcast_to(tot_lo, (W_A,))
    gidh, gidl = _hi_lo(rr_geo[3])
    f32 = lambda v: v.astype(jnp.float32)
    return jnp.stack([
        jnp.concatenate([exh, pad_hi]), jnp.concatenate([exl, pad_lo]),
        jnp.concatenate([inh, pad_hi]), jnp.concatenate([inl, pad_lo]),
        _pad_tail(f32(rr_geo[0]), W_A, 0.0),  # X0
        _pad_tail(f32(rr_geo[1]), W_A, 0.0),  # TY
        _pad_tail(f32(rr_geo[2]), W_A, float(n_images)),  # IM
        _pad_tail(gidh, W_A, 0.0),
        _pad_tail(gidl, W_A, 0.0),
        *([jnp.zeros((row_cap + W_A,), jnp.float32)] * 7),  # 8-align rows
    ])


def _core_fwd(
    m2f, cnf, clf, opf, m2abs, table_g, perm,
    rr_cum_ex, rr_cum_in, rr_geo,
    win1, win2, n_slots_arr, gh_bounds, dummy_i,
    cap_total, n_channels, tile_width, tile_height, n_images, image_size,
    absgrad, pack_payload=PACK_SORT, pack_grads=PACK_GRADS, tile_size=TILE,
):
    width, height = image_size
    D = n_channels
    E = m2f.shape[0]
    row_cap = rr_cum_ex.shape[0]
    T = n_images * tile_width * tile_height
    K = cap_total // CH

    table_rr = _build_rr_table(rr_cum_ex, rr_cum_in, rr_geo, n_images)

    # packed: the expansion emits bf16-pair rows with tile-local coords —
    # the big sort then carries ceil((6+D)/2)+1 payload operands instead of
    # 6+D, and the forward/backward kernels unpack in VMEM.  The vjp
    # replays the SAME quantized fields, so gradients are the exact
    # autodiff of the quantized forward.
    R = packed_rows(D) if pack_payload else 6 + D
    r_pad = _round_up(R + 2, 8)
    keys, fields = expand_emission2(
        table_rr, table_g, win1, win2, n_slots_arr,
        n_render=6 + D, r_pad=r_pad, tile_w=tile_width,
        tiles_per_im=tile_width * tile_height, sentinel=T, k=K,
        packed=pack_payload, tile_size=tile_size,
    )

    # second key = emission position: a stable-by-tile sort.  Gaussians are
    # depth-compacted, so per-tile slot order IS front-to-back depth order —
    # no depth or row-record-id rows ride the sort (the emission position
    # doubles as the backward reduction's grouping key).
    pos_iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    operands = (keys, pos_iota) + tuple(fields[i] for i in range(R))
    s = jax.lax.sort(operands, num_keys=2, is_stable=False)
    keys_s, emis_s = s[0], s[1]
    srows = list(s[2:])
    srows += [jnp.zeros_like(srows[0])] * (_round_up(R, 8) - R)  # 8-align
    sorted_rows = jnp.stack(srows)  # [R8, P]

    # per-tile spans over the sorted stream (T+1 queries — cheap)
    bounds = jnp.searchsorted(
        keys_s, jnp.arange(T + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    starts = bounds[:-1]
    counts = bounds[1:] - starts
    base = starts // RASTER_CHUNK
    heads = starts - base * RASTER_CHUNK

    sorted_pad = jnp.pad(sorted_rows, ((0, 0), (0, 2 * RASTER_CHUNK)))

    pix_out, t_final = _fwd_call(
        sorted_pad, base, heads, counts,
        n_channels=D, tiles_w=tile_width,
        tiles_per_image=tile_width * tile_height, width=width, height=height,
        n_tiles=T, chunk=RASTER_CHUNK, packed=pack_payload, tile=tile_size,
    )

    res = (
        sorted_pad, emis_s, base, heads, counts, bounds[-1:], perm,
        rr_cum_in, gh_bounds, dummy_i, n_slots_arr, pix_out, t_final,
    )
    return (pix_out, t_final), res


def _core_bwd(
    cap_total, n_channels, tile_width, tile_height, n_images, image_size,
    absgrad, pack_payload, pack_grads, tile_size, res, cts,
):
    (
        sorted_pad, emis_s, base, heads, counts, live_total, perm,
        rr_cum_in, gh_bounds, dummy_i, n_slots_arr, pix_out, t_final,
    ) = res
    v_pix, v_tfinal = cts
    width, height = image_size
    D = n_channels
    E = dummy_i.shape[0]
    row_cap = rr_cum_in.shape[0]
    P = emis_s.shape[0]
    T = n_images * tile_width * tile_height

    if RASTER_CHUNK_BWD != RASTER_CHUNK:
        starts_b = base * RASTER_CHUNK + heads
        base_b = starts_b // RASTER_CHUNK_BWD
        heads_b = starts_b - base_b * RASTER_CHUNK_BWD
        if RASTER_CHUNK_BWD > RASTER_CHUNK:
            # fwd padded the stream for its own chunk width; widen for bwd
            sorted_pad = jnp.pad(
                sorted_pad,
                ((0, 0), (0, 2 * (RASTER_CHUNK_BWD - RASTER_CHUNK))),
            )
    else:
        base_b, heads_b = base, heads
    (v_slot,) = _bwd_call(
        sorted_pad, base_b, heads_b, counts, v_pix, v_tfinal, pix_out, t_final,
        n_channels=D, tiles_w=tile_width,
        tiles_per_image=tile_width * tile_height, width=width, height=height,
        n_tiles=T, chunk=RASTER_CHUNK_BWD, packed=pack_payload,
        pack_grads=pack_grads, tile=tile_size,
    )  # per-slot grads at sorted positions: [6+D, P_pad] f32 rows, or
    #    [ceil((6+D)/2), P_pad] bf16-pair carriers when pack_grads

    # Slots beyond the live stream (sentinel keys / dummies) were never
    # written: mask their ids to the sentinel so they sort to the tail.
    # Their grad payload may hold kernel-scratch garbage — it rides the
    # sort untouched (int-keyed) and the segmented reduction below masks
    # everything past the live boundary, so no where() pass over [F, P]
    # is needed.
    pos = jnp.arange(P, dtype=jnp.int32)
    in_live = pos < live_total[0]
    ids = jnp.where(in_live, emis_s, ID_SENTINEL)
    n_rows_grad = 6 + D

    # Deterministic per-gaussian reduction: payload-sort by emission
    # position (positions of one gaussian are contiguous in emission
    # order), then one Pallas segmented row-sum at gaussian granularity
    # (ops/segsum_pallas.py — replaces cumsum + boundary gather: XLA's
    # per-element gather cost ~65 ms at bench scale, and the windowed
    # one-hot sum also avoids cumsum-difference cancellation).
    n_sort_rows = grad_pack_rows(D) if pack_grads else n_rows_grad
    operands = (ids,) + tuple(v_slot[i, :P] for i in range(n_sort_rows))
    # unstable: emission positions are unique
    srt = jax.lax.sort(operands, num_keys=1, is_stable=False)
    if pack_grads:
        # unpack the bf16-pair carriers AFTER the sort (the sort moved
        # half the operands); the tail garbage unpacks to garbage floats,
        # which the segment boundaries below never read
        rows = []
        for r in srt[1:]:
            hi, lo = unpack_bf16_pair(r)
            rows += [hi, lo]
        rows = rows[:n_rows_grad]
    else:
        rows = list(srt[1:])
    if absgrad:
        rows += [jnp.abs(rows[0]), jnp.abs(rows[1])]
    Wc = len(rows)
    F_pad = _round_up(Wc, 8)
    rows += [jnp.zeros_like(rows[0])] * (F_pad - Wc)
    data = jnp.pad(jnp.stack(rows), ((0, 0), (0, 2 * SEG_PIECE)))

    # per-gaussian surviving-slot counts -> boundaries in the id-sorted
    # stream (emission is gaussian-major over contiguous row records)
    cum0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), rr_cum_in]
    )  # [row_cap+1]
    gb = cum0[gh_bounds]  # [E+1] emission-slot boundaries per gaussian
    gcnt = gb[1:] - gb[:-1]
    n_slots = n_slots_arr[0]
    gvrc = jnp.where(
        dummy_i == 1,
        0,
        jnp.clip(jnp.minimum(gb[:-1] + gcnt, n_slots) - gb[:-1], 0, gcnt),
    )
    ends = jnp.cumsum(gvrc).astype(jnp.int32)
    positions = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends])  # [E+1]
    vg = segment_rowsum(
        data, positions, n_out=_round_up(E, SEG_SEG), live_rows=Wc
    )  # [F_pad, E_out] in compacted order

    # un-permute back to the caller's original order (payload sort by
    # the original index — the exact inverse of the forward compaction)
    uns = jax.lax.sort(
        (perm,) + tuple(vg[i, :E] for i in range(Wc)),
        num_keys=1, is_stable=False,
    )
    v_gauss = jnp.stack(uns[1:], axis=1)  # [E, Wc] original order

    v_m2 = v_gauss[:, 0:2]
    v_cn = v_gauss[:, 2:5]
    v_op = v_gauss[:, 5]
    v_cl = v_gauss[:, 6 : 6 + D]
    v_m2abs = (
        v_gauss[:, 6 + D :] if absgrad else jnp.zeros((E, 2), v_m2.dtype)
    )

    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    K = cap_total // CH
    F_g = _round_up(6 + D, 8)
    return (
        v_m2, v_cn, v_cl, v_op, v_m2abs,
        jnp.zeros((F_g, E + W_A), jnp.float32),  # table_g (stop-grad input)
        f0(jnp.zeros((E,), jnp.int32)),
        f0(jnp.zeros((row_cap,), jnp.int32)),
        f0(jnp.zeros((row_cap,), jnp.int32)),
        f0(jnp.zeros((4, row_cap), jnp.int32)),
        f0(jnp.zeros((K,), jnp.int32)),
        f0(jnp.zeros((K,), jnp.int32)),
        f0(jnp.zeros((1,), jnp.int32)),
        f0(jnp.zeros((E + 1,), jnp.int32)),
        f0(jnp.zeros((E,), jnp.int32)),
    )


_rasterize_core.defvjp(_core_fwd, _core_bwd)


def rasterize_to_pixels(
    means2d: jax.Array,  # [I, N, 2]
    conics: jax.Array,  # [I, N, 3]
    colors: jax.Array,  # [I, N, D]
    opacities: jax.Array,  # [I, N]
    image_width: int,
    image_height: int,
    radii: jax.Array,  # [I, N, 2] int32 (0 = culled)
    depths: jax.Array,  # [I, N]
    isect_capacity: int,
    backgrounds: Optional[jax.Array] = None,  # [I, D]
    masks: Optional[jax.Array] = None,  # [I, th, tw] bool
    tile_size: int = TILE,
    absgrad: bool = False,
    means2d_abs: Optional[jax.Array] = None,  # [I, N, 2] absgrad carrier
    row_capacity: Optional[int] = None,
    pack_payload: Optional[bool] = None,  # None = GSPLAT_TPU_PACK_SORT
    pack_grads: Optional[bool] = None,  # None = GSPLAT_TPU_PACK_GRADS
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Rasterize projected gaussians to images (sorting included).

    Returns (render_colors [I, H, W, D], render_alphas [I, H, W, 1], aux)
    with aux = {n_isects, isect_overflow, tiles_per_gauss}. `isect_capacity`
    bounds the tight intersections; `row_capacity` bounds the (gaussian x
    covered-tile-row) records (default isect_capacity // 2).
    aux["tiles_per_gauss"] reports the conservative AABB counts (parity
    with _torch_impl.py:_isect_tiles); aux["n_isects"] is the tight count.

    The pipeline is visibility-compacted throughout (the TPU analog of the
    reference's packed mode, rendering.py:348-362): culled gaussians are
    prefix-sorted out before the emission plan, so sort/worklist work
    scales with the visible set, not I*N.
    Parity: gsplat/cuda/_wrapper.py:rasterize_to_pixels (:1337) +
    isect_tiles with AccuTile (IntersectTile.cu:96-207).

    tile_size may be 8/16/32 (the reference runtime-dispatches tile size
    the same way, Rendering.cpp:261-274): larger tiles shrink the
    emission count every sort touches, at the cost of more per-tile
    kernel compute.  16 is the measured default (docs/perf-analysis.md).
    """
    assert tile_size in (8, 16, 32), tile_size
    I, N = means2d.shape[0], means2d.shape[1]
    E = I * N
    D = colors.shape[-1]
    th = -(-image_height // tile_size)
    tw = -(-image_width // tile_size)
    cap_total = _round_up(isect_capacity, CH)
    if row_capacity is None:
        row_capacity = isect_capacity // 2
    row_cap = _round_up(max(row_capacity, 1), CH)

    # visibility compaction prep (non-differentiable; ONE payload sort
    # carries every render field — means/conics/opacity AND colors — so the
    # custom_vjp core never re-sorts; see _build_field_table).
    # Depth is the second key: the compacted order is global front-to-back,
    # so emission order per tile is the compositing order and the big slot
    # sort needs no depth key (tiles are per-image, so a single global
    # depth order serves every image at once).
    m2_sg = jax.lax.stop_gradient(means2d).reshape(E, 2)
    cn_sg = jax.lax.stop_gradient(conics).reshape(E, 3)
    op_sg = jax.lax.stop_gradient(opacities).reshape(E)
    cl_sg = jax.lax.stop_gradient(colors).reshape(E, D)
    dep_sg = jax.lax.stop_gradient(depths).reshape(E)
    rad = radii.reshape(E, 2)
    iota = jnp.arange(E, dtype=jnp.int32)
    alive = (rad > 0).all(axis=-1)
    n_live = jnp.sum(alive.astype(jnp.int32))
    ckey = (~alive).astype(jnp.int32)
    dep_key = jnp.where(alive, dep_sg, jnp.inf)  # culled rows may carry NaN
    comp = jax.lax.sort(
        (ckey, dep_key, iota, m2_sg[:, 0], m2_sg[:, 1], rad[:, 0],
         rad[:, 1], cn_sg[:, 0], cn_sg[:, 1], cn_sg[:, 2], op_sg,
         iota // N) + tuple(cl_sg[:, i] for i in range(D)),
        num_keys=3, is_stable=False,
    )
    perm = comp[2]  # original row per compacted slot
    m2_c = jnp.stack([comp[3], comp[4]], axis=1)
    rad_c = jnp.stack([comp[5], comp[6]], axis=1)
    cn_c = jnp.stack([comp[7], comp[8], comp[9]], axis=1)
    op_c = comp[10]
    im_c = comp[11]

    plan = make_tight_plan(
        m2_c, rad_c, cn_c, op_c, im_c, n_live, I, tile_size, tw, th,
        cap_total, row_cap,
    )

    if means2d_abs is None:
        means2d_abs = jnp.zeros((E, 2), means2d.dtype)

    rr_geo = jnp.stack([plan.rr_x0, plan.rr_ty, plan.rr_im, plan.rr_gid])
    dummy_i = plan.dummy.astype(jnp.int32)
    table_g = _build_field_table(
        [comp[3], comp[4], comp[7], comp[8], comp[9], comp[10]]
        + list(comp[12:]),
        dummy_i,
    )

    # tile masks are applied outside the core: masked tiles must render
    # pure background with zero alpha (Fwd.cu:141-158), which the outer
    # where() below guarantees for both values and gradients.
    pix_out, t_final = _rasterize_core(
        means2d.reshape(E, 2),
        conics.reshape(E, 3),
        colors.reshape(E, D),
        opacities.reshape(E),
        means2d_abs.reshape(E, 2),
        table_g, perm,
        plan.rr_cum_ex, plan.rr_cum_in, rr_geo,
        plan.win1, plan.win2, plan.n_slots,
        plan.gh_bounds, dummy_i,
        cap_total, D, tw, th, I, (image_width, image_height), absgrad,
        PACK_SORT if pack_payload is None else pack_payload,
        PACK_GRADS if pack_grads is None else pack_grads,
        tile_size,
    )

    render = untile_image(
        pix_out, I, th, tw, image_height, image_width, tile_size
    )
    t_img = untile_image(
        t_final, I, th, tw, image_height, image_width, tile_size
    )
    render_alphas = 1.0 - t_img
    if backgrounds is not None:
        render = render + t_img * backgrounds[:, None, None, :]
    if masks is not None:
        # masked-off tiles show pure background with zero alpha
        mpix = jnp.repeat(
            jnp.repeat(masks, tile_size, axis=1), tile_size, axis=2
        )[:, :image_height, :image_width, None]
        bg = (
            backgrounds[:, None, None, :]
            if backgrounds is not None
            else jnp.zeros((I, 1, 1, D), render.dtype)
        )
        render = jnp.where(mpix, render, bg)
        render_alphas = jnp.where(mpix, render_alphas, 0.0)

    # conservative AABB tile counts in the caller's order (parity with
    # _torch_impl.py:_isect_tiles coverage)
    tmean = m2_sg / tile_size
    trad = rad.astype(m2_sg.dtype) / tile_size
    tmn = jnp.floor(tmean - trad).astype(jnp.int32)
    tmx = jnp.ceil(tmean + trad).astype(jnp.int32)
    wb = jnp.clip(tmx[:, 0], 0, tw) - jnp.clip(tmn[:, 0], 0, tw)
    hb = jnp.clip(tmx[:, 1], 0, th) - jnp.clip(tmn[:, 1], 0, th)
    aabb_cnt = jnp.where(alive & (wb > 0) & (hb > 0), wb * hb, 0)

    aux = {
        "n_isects": plan.n_isects,
        "isect_overflow": plan.overflow,
        "tiles_per_gauss": aabb_cnt.reshape(I, N).astype(jnp.int32),
    }
    return render, render_alphas, aux


def rasterize_to_pixels_fast(
    means2d: jax.Array,  # [I, N, 2]
    conics: jax.Array,  # [I, N, 3]
    colors: jax.Array,  # [I, N, D]
    opacities: jax.Array,  # [I, N]
    image_width: int,
    image_height: int,
    radii: jax.Array,  # [I, N, 2] int32 (0 = culled)
    depths: jax.Array,  # [I, N]
    isect_capacity: int,
    backgrounds: Optional[jax.Array] = None,  # [I, D]
    tile_size: int = TILE,
    row_capacity: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Inference fast path: bf16-pair packed sort payload, no autodiff.

    The TPU analog of the reference's no-grad macro-tile inference
    renderer (gsplat/experimental/render/kernels/cuda/csrc/
    gaussian_inference/MacroTileRasterize.cu:20-60 — bf16 compositing,
    no gradient bookkeeping).  Same plan/compaction as
    `rasterize_to_pixels`, but the emission expansion emits TILE-LOCAL
    coords + bf16-pair packed rows, so the big sort carries
    `packed_rows(D) + 2` operands instead of `6 + D + 2`, and the
    forward kernel runs single-pass bf16 scans and color accumulation.
    Error class ~2**-9 per field (sub-1% pixel error) — inference only.
    """
    assert tile_size in (8, 16, 32), tile_size
    I, N = means2d.shape[0], means2d.shape[1]
    E = I * N
    D = colors.shape[-1]
    th = -(-image_height // tile_size)
    tw = -(-image_width // tile_size)
    cap_total = _round_up(isect_capacity, CH)
    if row_capacity is None:
        row_capacity = isect_capacity // 2
    row_cap = _round_up(max(row_capacity, 1), CH)
    T = I * tw * th

    m2 = jax.lax.stop_gradient(means2d).reshape(E, 2)
    cn = jax.lax.stop_gradient(conics).reshape(E, 3)
    op = jax.lax.stop_gradient(opacities).reshape(E)
    cl = jax.lax.stop_gradient(colors).reshape(E, D)
    dep = jax.lax.stop_gradient(depths).reshape(E)
    rad = radii.reshape(E, 2)
    iota = jnp.arange(E, dtype=jnp.int32)
    alive = (rad > 0).all(axis=-1)
    n_live = jnp.sum(alive.astype(jnp.int32))
    ckey = (~alive).astype(jnp.int32)
    dep_key = jnp.where(alive, dep, jnp.inf)
    comp = jax.lax.sort(
        (ckey, dep_key, iota, m2[:, 0], m2[:, 1], rad[:, 0], rad[:, 1],
         cn[:, 0], cn[:, 1], cn[:, 2], op, iota // N)
        + tuple(cl[:, i] for i in range(D)),
        num_keys=3, is_stable=False,
    )
    m2_c = jnp.stack([comp[3], comp[4]], axis=1)
    rad_c = jnp.stack([comp[5], comp[6]], axis=1)
    cn_c = jnp.stack([comp[7], comp[8], comp[9]], axis=1)

    plan = make_tight_plan(
        m2_c, rad_c, cn_c, comp[10], comp[11], n_live, I, tile_size,
        tw, th, cap_total, row_cap,
    )
    dummy_i = plan.dummy.astype(jnp.int32)
    table_g = _build_field_table(
        [comp[3], comp[4], comp[7], comp[8], comp[9], comp[10]]
        + list(comp[12:]),
        dummy_i,
    )
    rr_geo = jnp.stack([plan.rr_x0, plan.rr_ty, plan.rr_im, plan.rr_gid])
    table_rr = _build_rr_table(
        plan.rr_cum_ex, plan.rr_cum_in, rr_geo, I
    )

    R_out = packed_rows(D)
    r_pad = _round_up(R_out + 2, 8)
    keys, fields = expand_emission2(
        table_rr, table_g, plan.win1, plan.win2, plan.n_slots,
        n_render=6 + D, r_pad=r_pad, tile_w=tw, tiles_per_im=tw * th,
        sentinel=T, k=cap_total // CH, packed=True, tile_size=tile_size,
    )

    pos_iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    operands = (keys, pos_iota) + tuple(fields[i] for i in range(R_out))
    s = jax.lax.sort(operands, num_keys=2, is_stable=False)
    srows = list(s[2:])
    srows += [jnp.zeros_like(srows[0])] * (_round_up(R_out, 8) - R_out)
    sorted_rows = jnp.stack(srows)

    bounds = jnp.searchsorted(
        s[0], jnp.arange(T + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    starts = bounds[:-1]
    counts = bounds[1:] - starts
    base = starts // RASTER_CHUNK
    heads = starts - base * RASTER_CHUNK
    sorted_pad = jnp.pad(sorted_rows, ((0, 0), (0, 2 * RASTER_CHUNK)))

    pix_out, t_final = _fwd_call(
        sorted_pad, base, heads, counts,
        n_channels=D, tiles_w=tw, tiles_per_image=tw * th,
        width=image_width, height=image_height, n_tiles=T,
        chunk=RASTER_CHUNK, packed=True, tile=tile_size,
    )

    render = untile_image(
        pix_out, I, th, tw, image_height, image_width, tile_size
    )
    t_img = untile_image(
        t_final, I, th, tw, image_height, image_width, tile_size
    )
    render_alphas = 1.0 - t_img
    if backgrounds is not None:
        render = render + t_img * backgrounds[:, None, None, :]
    aux = {"n_isects": plan.n_isects, "isect_overflow": plan.overflow}
    return render, render_alphas, aux


def rasterize_to_pixels_packed(
    means2d: jax.Array,  # [E, 2] compacted: rows < n_live are visible
    conics: jax.Array,  # [E, 3]
    colors: jax.Array,  # [E, D]
    opacities: jax.Array,  # [E]
    radii: jax.Array,  # [E, 2] int32 (for footprints; 0 rows are skipped)
    depths: jax.Array,  # [E]
    image_ids: jax.Array,  # [E] int32 destination image per row
    n_live: jax.Array,  # [] int32
    n_images: int,
    image_width: int,
    image_height: int,
    isect_capacity: int,
    backgrounds: Optional[jax.Array] = None,
    masks: Optional[jax.Array] = None,
    tile_size: int = TILE,
    absgrad: bool = False,
    means2d_abs: Optional[jax.Array] = None,
    row_capacity: Optional[int] = None,
    pack_payload: Optional[bool] = None,  # None = GSPLAT_TPU_PACK_SORT
    pack_grads: Optional[bool] = None,  # None = GSPLAT_TPU_PACK_GRADS
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Rasterize an already visibility-compacted splat list (packed mode).

    The TPU analog of the reference's `packed=True` CSR interface
    (rendering.py:348-362, Rendering.cpp:1002-1075): rows are (image,
    gaussian) pairs with `image_ids` routing; memory and per-step work
    scale with `E` (the packed capacity), not cameras x gaussians.
    Gradients return in the SAME packed layout.  This is also the receiver
    side of the distributed count-routed splat exchange
    (parallel/render.py; DistributedCollectives.cpp:343-409 analog).
    """
    assert tile_size in (8, 16, 32), tile_size
    E = means2d.shape[0]
    D = colors.shape[-1]
    th = -(-image_height // tile_size)
    tw = -(-image_width // tile_size)
    cap_total = _round_up(isect_capacity, CH)
    if row_capacity is None:
        row_capacity = isect_capacity // 2
    row_cap = _round_up(max(row_capacity, 1), CH)

    # Depth compaction: rows beyond n_live (or with zero radii) must not
    # contribute, and live rows must be globally front-to-back for the
    # emission-order compositing (see rasterize_to_pixels).  One payload
    # sort establishes both; gradients return in the CALLER's packed
    # layout via perm.
    m2_sg = jax.lax.stop_gradient(means2d)
    cn_sg = jax.lax.stop_gradient(conics)
    op_sg = jax.lax.stop_gradient(opacities)
    cl_sg = jax.lax.stop_gradient(colors)
    dep_sg = jax.lax.stop_gradient(depths)
    rad = radii
    iota = jnp.arange(E, dtype=jnp.int32)
    alive = (rad > 0).all(axis=-1) & (iota < n_live)
    n_live_c = jnp.sum(alive.astype(jnp.int32))
    ckey = (~alive).astype(jnp.int32)
    dep_key = jnp.where(alive, dep_sg, jnp.inf)
    comp = jax.lax.sort(
        (ckey, dep_key, iota, m2_sg[:, 0], m2_sg[:, 1], rad[:, 0],
         rad[:, 1], cn_sg[:, 0], cn_sg[:, 1], cn_sg[:, 2], op_sg,
         image_ids) + tuple(cl_sg[:, i] for i in range(D)),
        num_keys=3, is_stable=False,
    )
    perm = comp[2]
    m2_c = jnp.stack([comp[3], comp[4]], axis=1)
    rad_c = jnp.stack([comp[5], comp[6]], axis=1)
    cn_c = jnp.stack([comp[7], comp[8], comp[9]], axis=1)
    op_c = comp[10]
    im_c = comp[11]

    plan = make_tight_plan(
        m2_c, rad_c, cn_c, op_c, im_c, n_live_c, n_images,
        tile_size, tw, th, cap_total, row_cap,
    )
    if means2d_abs is None:
        means2d_abs = jnp.zeros((E, 2), means2d.dtype)
    rr_geo = jnp.stack([plan.rr_x0, plan.rr_ty, plan.rr_im, plan.rr_gid])
    dummy_i = plan.dummy.astype(jnp.int32)
    table_g = _build_field_table(
        [comp[3], comp[4], comp[7], comp[8], comp[9], comp[10]]
        + list(comp[12:]),
        dummy_i,
    )

    pix_out, t_final = _rasterize_core(
        means2d, conics, colors, opacities, means2d_abs,
        table_g, perm,
        plan.rr_cum_ex, plan.rr_cum_in, rr_geo,
        plan.win1, plan.win2, plan.n_slots,
        plan.gh_bounds, dummy_i,
        cap_total, D, tw, th, n_images,
        (image_width, image_height), absgrad,
        PACK_SORT if pack_payload is None else pack_payload,
        PACK_GRADS if pack_grads is None else pack_grads,
        tile_size,
    )

    I = n_images
    render = untile_image(
        pix_out, I, th, tw, image_height, image_width, tile_size
    )
    t_img = untile_image(
        t_final, I, th, tw, image_height, image_width, tile_size
    )
    render_alphas = 1.0 - t_img
    if backgrounds is not None:
        render = render + t_img * backgrounds[:, None, None, :]
    if masks is not None:
        mpix = jnp.repeat(
            jnp.repeat(masks, tile_size, axis=1), tile_size, axis=2
        )[:, :image_height, :image_width, None]
        bg = (
            backgrounds[:, None, None, :]
            if backgrounds is not None
            else jnp.zeros((I, 1, 1, D), render.dtype)
        )
        render = jnp.where(mpix, render, bg)
        render_alphas = jnp.where(mpix, render_alphas, 0.0)

    aux = {
        "n_isects": plan.n_isects,
        "isect_overflow": plan.overflow,
    }
    return render, render_alphas, aux


# ---------------------------------------------------------------------------
# Legacy AABB emission machinery (still used by the 2DGS / eval3d paths)
# ---------------------------------------------------------------------------


class EmissionPlan(NamedTuple):
    """Static-shape tile-emission layout (all int32, non-differentiable).

    Parity for the counting pass of gsplat/cuda/csrc/IntersectTile.cu:96-213
    (AABB coverage, matching _torch_impl.py:_isect_tiles) plus the TPU
    additions: min-one-emission runs and per-chunk source windows.
    """

    cnt: jax.Array  # [E] real tile count (0 for culled)
    cum_ex: jax.Array  # [E] exclusive cumsum of max(cnt, 1)
    cum_in: jax.Array  # [E] inclusive cumsum of max(cnt, 1)
    tminx: jax.Array  # [E]
    tminy: jax.Array  # [E]
    w_rect: jax.Array  # [E] (>= 1)
    im: jax.Array  # [E] image id (== I for culled -> sentinel keys)
    win_starts: jax.Array  # [K] source window base rows (LANE-aligned)
    n_slots: jax.Array  # [] emission slots incl. dummies (<= cap_total)
    n_isects: jax.Array  # [] real intersections (pre-truncation)
    overflow: jax.Array  # [] bool


def make_emission_plan(
    means2d: jax.Array,  # [I, N, 2]
    radii: jax.Array,  # [I, N, 2] int32
    tile_size: int,
    tile_width: int,
    tile_height: int,
    cap_total: int,
) -> EmissionPlan:
    I, N = means2d.shape[0], means2d.shape[1]
    E = I * N
    m2 = jax.lax.stop_gradient(means2d).reshape(E, 2)
    rad = radii.reshape(E, 2)

    tmean = m2 / tile_size
    trad = rad.astype(m2.dtype) / tile_size
    tmin = jnp.floor(tmean - trad).astype(jnp.int32)
    tmax = jnp.ceil(tmean + trad).astype(jnp.int32)
    tminx = jnp.clip(tmin[:, 0], 0, tile_width)
    tminy = jnp.clip(tmin[:, 1], 0, tile_height)
    tmaxx = jnp.clip(tmax[:, 0], 0, tile_width)
    tmaxy = jnp.clip(tmax[:, 1], 0, tile_height)
    w = tmaxx - tminx
    h = tmaxy - tminy
    alive = (rad > 0).all(axis=-1) & (w > 0) & (h > 0)
    cnt = jnp.where(alive, w * h, 0).astype(jnp.int32)

    cnt_p = jnp.maximum(cnt, 1)  # culled gaussians emit one dummy slot
    cum_in = jnp.cumsum(cnt_p).astype(jnp.int32)
    cum_ex = cum_in - cnt_p
    total = cum_in[-1]
    n_isects = jnp.sum(cnt).astype(jnp.int32)
    overflow = total > cap_total
    n_slots = jnp.minimum(total, cap_total)

    e_ids = jnp.arange(E, dtype=jnp.int32)
    im = jnp.where(alive, e_ids // N, I).astype(jnp.int32)
    tminx = jnp.where(alive, tminx, 0)
    tminy = jnp.where(alive, tminy, 0)
    w_rect = jnp.where(alive, jnp.maximum(w, 1), 1).astype(jnp.int32)

    K = cap_total // CH
    probes = jnp.arange(K, dtype=jnp.int32) * CH
    first = jnp.searchsorted(cum_in, probes, side="right").astype(jnp.int32)
    win = (first // LANE) * LANE
    win = jnp.clip(win, 0, E + W_A - W_A)  # E_pad = E + W_A

    return EmissionPlan(
        cnt=cnt, cum_ex=cum_ex, cum_in=cum_in, tminx=tminx, tminy=tminy,
        w_rect=w_rect, im=im, win_starts=win, n_slots=n_slots,
        n_isects=n_isects, overflow=overflow,
    )


def expand_sort_align(
    field_rows,  # list of [E] f32 arrays (render fields, sanitized)
    depthf: jax.Array,  # [E] f32 (non-negative sort key)
    cnt, cum_ex, cum_in, rect_rows,  # plan arrays
    win_starts, n_slots_arr,
    cap_total: int,
    tile_width: int,
    tile_height: int,
    n_images: int,
):
    """Emission-expand, depth-sort, and chunk-align arbitrary field rows.

    The generic middle of the legacy rasterization pipeline (kernel A ->
    payload sort -> worklist -> kernel B); used by the 2DGS and eval3d
    paths.  Returns (aligned [F_s, A], ids_aligned [A], worklist).
    """
    R = len(field_rows)
    r_pad = _round_up(R + 5, 8)
    T = n_images * tile_width * tile_height
    K = cap_total // CH

    exh, exl = _hi_lo(cum_ex)
    inh, inl = _hi_lo(cum_in)
    tot_hi, tot_lo = _hi_lo(cum_in[-1:])
    pad_hi = jnp.broadcast_to(tot_hi, (W_A,))
    pad_lo = jnp.broadcast_to(tot_lo, (W_A,))
    f32 = lambda v: v.astype(jnp.float32)
    rows = [
        jnp.concatenate([exh, pad_hi]), jnp.concatenate([exl, pad_lo]),
        jnp.concatenate([inh, pad_hi]), jnp.concatenate([inl, pad_lo]),
        _pad_tail(f32(rect_rows[0]), W_A, 0.0),
        _pad_tail(f32(rect_rows[1]), W_A, 0.0),
        _pad_tail(f32(rect_rows[2]), W_A, 1.0),
        _pad_tail(f32(rect_rows[3]), W_A, float(n_images)),
        _pad_tail(depthf, W_A, 0.0),
    ] + [_pad_tail(r, W_A, 0.0) for r in field_rows]
    F_tab = _round_up(len(rows), 8)
    table = jnp.stack(
        rows + [jnp.zeros_like(rows[0])] * (F_tab - len(rows))
    )

    keys, depth_keys, flat_ids, fields = expand_emission(
        table, win_starts, n_slots_arr,
        n_render=R, r_pad=r_pad, tile_w=tile_width,
        tiles_per_im=tile_width * tile_height, sentinel=T, k=K,
    )

    operands = (keys, depth_keys, flat_ids) + tuple(
        fields[i] for i in range(R)
    )
    # unstable: (tile, depth) ties can only come from the same gaussian,
    # which emits at most one slot per tile — ordering is already unique
    s = jax.lax.sort(operands, num_keys=2, is_stable=False)
    keys_s, flat_s = s[0], s[2]
    fields_s = s[3:]

    wl = build_tile_worklist(keys_s, T, DEFAULT_CHUNK)
    A = wl.src_idx.shape[0]
    A2 = _round_up(A, CH)
    K2 = A2 // CH
    src = jnp.where(wl.valid, wl.src_idx, -1)
    src = _pad_tail(src, A2 - A, -1).reshape(K2, CH)
    win2 = jnp.min(jnp.where(src >= 0, src, 2**30), axis=1)
    win2 = jnp.clip((win2 // LANE) * LANE, 0, cap_total)

    idh, idl = _hi_lo(flat_s)
    stack_rows = list(fields_s) + [idh, idl]
    F_s = _round_up(len(stack_rows), 8)
    stack_rows += [jnp.zeros_like(idh)] * (F_s - len(stack_rows))
    sorted_rows = jnp.stack([_pad_tail(r, W_A, 0.0) for r in stack_rows])

    aligned = align_rows(sorted_rows, src, win2, k=K2)[:, :A]
    ids_aligned = _recombine(aligned[R], aligned[R + 1])
    return aligned, ids_aligned, wl


def reduce_slot_grads(
    v_aligned,  # [F_s, A] per-slot gradients (rows 0..n_rows-1 live)
    n_rows: int,
    ids_aligned, valid,  # [A]
    cnt, cum_ex, n_slots,  # plan arrays (+ scalar n_slots)
    E: int,
    extra_abs: int = 0,  # also reduce |rows[:extra_abs]| (absgrad)
):
    """Deterministic per-gaussian reduction: payload-sort by id + cumsum
    difference at run boundaries. Returns [E, n_rows (+extra_abs)]."""
    A = ids_aligned.shape[0]
    ids_sort = jnp.where(valid, ids_aligned, E)
    operands = (ids_sort,) + tuple(v_aligned[i] for i in range(n_rows))
    # unstable: within-gaussian run order only permutes the f32 summation
    s = jax.lax.sort(operands, num_keys=1, is_stable=False)
    v_rows = jnp.stack(s[1:], axis=1)  # [A, n_rows]
    if extra_abs:
        v_rows = jnp.concatenate(
            [v_rows, jnp.abs(v_rows[:, :extra_abs])], axis=1
        )
    Wc = v_rows.shape[1]
    cs = jnp.concatenate(
        [jnp.zeros((1, Wc), v_rows.dtype), jnp.cumsum(v_rows, axis=0)],
        axis=0,
    )
    vrc = jnp.clip(jnp.minimum(cum_ex + cnt, n_slots) - cum_ex, 0, cnt)
    ends = jnp.cumsum(vrc).astype(jnp.int32)
    starts = ends - vrc
    return cs[ends] - cs[starts]  # [E, Wc]
