"""Pallas TPU rasterization kernels: tile-chunked alpha compositing fwd/bwd.

TPU-native redesign of the reference CUDA rasterizer
(gsplat/cuda/csrc/RasterizeToPixels3DGSSerialBatch{Fwd,Bwd}.cu):

  * CUDA: one CTA per tile, shared-memory staging of CTA-size gaussian
    batches, per-pixel serial front-to-back blend with `__syncthreads_count`
    early-out, backward via back-to-front replay + atomicAdd scatter.
  * Here: one grid step per tile; the depth-sorted intersection list lives
    field-major [F, P] in HBM and each tile reads its own UNALIGNED span
    [start, start+count) by DMA-ing 128-lane chunks from the floor-128 base
    with a two-sided lane mask (head lanes belong to the previous tile, tail
    lanes to the next).  Chunks ride through an NBUF-deep DMA pipeline;
    compute and the whole-tile early exit run per 128-lane chunk.  Compositing runs in its associative form — per-chunk
    cumulative products of (1 - alpha) on the VPU and an MXU matmul for the
    color accumulation — with a whole-tile early exit when every pixel's
    transmittance saturates (the analog of the CUDA done-mask break,
    Fwd.cu:268-271).
  * Backward is a front-to-back *replay* (no last_ids needed — the
    saturation masks are recomputed exactly), producing per-slot gradients
    written at EXACTLY the sorted-layout positions [F_out, P].  Boundary
    chunks shared by two adjacent tiles are merged through a VMEM carry
    buffer (the grid runs sequentially: dimension_semantics="arbitrary"),
    so no slot is ever written twice — deterministic, no atomics
    (a correctness upgrade over the CUDA `atomicAdd` path).  Accumulation
    to per-gaussian gradients happens outside as a sorted segment
    reduction (ops/rasterize.py:reduce_sorted_grads).

The associative per-chunk formulation here (partial (T, c) folds composed
by cumulative products) is the same reformulation as the reference's
ParallelBatch eval3d renderer (SURVEY N19,
RasterizeToPixelsFromWorld3DGSParallelBatchFwd.cu:101-133) — on TPU it is
the baseline design rather than an optional backend.

Compositing semantics match RasterizeToPixels3DGSDevice.cuh exactly:
sigma/alpha gates, MAX_ALPHA clamp, transmittance threshold with the
saturating gaussian excluded, background blended with the final
transmittance.

Layout: 128 depth-consecutive gaussians per chunk on the lane axis (TPU DMA
requires 128-lane minor dims for dynamically offset HBM slices); the 256
pixels of a 16x16 tile live on the sublane axis.  Input rows are
[x, y, conic_a, conic_b, conic_c, opacity, colors...]; backward output rows
are the per-slot gradients in the same order.  Per-tile images are produced
in a tiled [n_tiles, D, 256] layout and re-assembled outside the kernel
(see ops.rasterize.tile_image/untile_image).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from .mxu import (
    dot_01_exact,
    dot_01_faithful,
    dot_01_plain,
    dot_exact2_exact3,
    dot_exact2_faithful,
    dot_exact2_plain,
    dot_faithful,
    dot_plain_faithful,
    unpack_bf16_pair,
)

# Scan-matmul precision: 3 = exact data 3-split (f32-accumulation class),
# 2 = faithful 2-split (~2e-5 relative on the scans — far inside the
# compositing gates; see ops/mxu.py:dot_01_faithful) at 2/3 the MXU cost.
# Validated against the jnp oracle and the BASELINE garden gate at 2
# (tests/test_rasterize_pallas.py, tests/test_garden_gate.py).
SCAN_PASSES = int(_os.environ.get("GSPLAT_TPU_SCAN_PASSES", "2"))
# Whole-tile saturation early exit (the analog of the CUDA done-mask
# break).  It pays a cross-lane max + while_loop carry EVERY chunk to
# sometimes skip tail chunks; with the tight plan's ~1-2 chunks per tile
# the trade is measurable in both directions — keep it switchable.
EARLY_EXIT = _os.environ.get("GSPLAT_TPU_EARLY_EXIT", "1") != "0"
# Lane-scan implementation: "matmul" = blocked MXU triangular scans in the
# log domain (cumprod via exp(cumsum(log)));  "shift" = Hillis-Steele
# doubling with pltpu.roll — exact f32 products/sums on the VPU, no
# transcendentals, no MXU passes.  Switchable for on-chip measurement.
SCAN_IMPL = _os.environ.get("GSPLAT_TPU_SCAN_IMPL", "matmul")
_dot_01 = dot_01_exact if SCAN_PASSES == 3 else dot_01_faithful
from .projection import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_THRESHOLD

CHUNK = 128  # lane width of one DMA chunk (hard minor-dim constraint)
# f32-accumulation tolerance for the expanded conic form (see _chunk_alphas):
# |error| <= n_terms * max|term| * 2^-24 ~ 1e-3 for the sharpest gaussians
SIGMA_EPS_NEG = -2e-3
DEFAULT_CHUNK = CHUNK  # legacy alias (2DGS/eval3d worklists still use it)
NBUF = 8  # DMA pipeline depth in chunks (compute + early exit are per-chunk)
TILE = 16  # tile_size for the Pallas path (pixels per side)
N_PIX = TILE * TILE  # 256 pixels per tile


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _seq_params() -> pltpu.CompilerParams:
    # The carry-chunk merge in the backward relies on grid steps executing
    # in order on one core; "arbitrary" forbids megacore grid splitting.
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",))


def _tri_incl(k: int) -> jax.Array:
    """[k, k] 0/1 matrix with T[i, j] = 1 iff i <= j (inclusive scan)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (i <= j).astype(jnp.float32)


def _cumsum_lane(x: jax.Array, dot=None) -> jax.Array:
    """Inclusive cumulative sum along axis 1: blocked MXU triangular scan.

    Each 128-lane block scans via one exact bf16x3 matmul against T128
    (T is 0/1 — exact in bf16, so the three-component data split of
    ops/mxu.py reaches f32 accuracy in 3 MXU passes); block totals chain
    through a cheap running carry.  Blocking makes the scan LINEAR in
    chunk width — the single full-chunk triangular matmul is quadratic
    (a 256-wide chunk costs 4x a 128-wide one, 512-wide costs 16x), which
    is what previously made wide DMA chunks unaffordable.

    `dot` overrides the scan matmul (the inference fast path passes the
    single-pass `dot_01_plain`).

    GSPLAT_TPU_SCAN_IMPL=shift switches to the exact f32 doubling scan
    (see `_shift_scan`).
    """
    if SCAN_IMPL == "shift":
        return _shift_scan(x, jnp.add, 0.0)
    dot = dot or _dot_01
    k = x.shape[1]
    if k <= 128:
        return dot(x, _tri_incl(k))
    assert k % 128 == 0
    t128 = _tri_incl(128)
    out = []
    carry = jnp.zeros((x.shape[0], 1), jnp.float32)
    for i in range(k // 128):
        blk = dot(x[:, i * 128 : (i + 1) * 128], t128)
        out.append(blk + carry)
        carry = carry + blk[:, 127:128]
    return jnp.concatenate(out, axis=1)


def _shift_scan(x: jax.Array, combine, identity: float) -> jax.Array:
    """Inclusive lane scan by Hillis-Steele doubling (pltpu.roll).

    log2(k) steps of roll + masked combine — exact f32 arithmetic (no
    log/exp, no bf16 splits), all on the VPU.
    """
    k = x.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < k:
        y = jnp.where(
            lanes >= shift, pltpu.roll(x, shift=shift, axis=1), identity
        )
        x = combine(x, y)
        shift *= 2
    return x


def _cumprod_lane(x: jax.Array, dot=None) -> jax.Array:
    """Inclusive cumulative product along axis 1.

    matmul impl: exp(cumsum(log x)) with blocked MXU triangular scans.
    Valid for the compositing use-case: x = 1 - alpha in [1 - MAX_ALPHA, 1]
    (so log is finite) and masked lanes hold exactly 1.0, for which
    log -> 0.0 and exp -> 1.0 are exact.  The log-domain sum rides the
    MXU; accuracy vs the sequential product is ~1e-6 relative (f32 log/exp
    are sub-ulp, and |sum of logs| <= 128 * |log(0.01)|).

    shift impl (GSPLAT_TPU_SCAN_IMPL=shift): doubling scan of exact f32
    products — strictly more accurate, no transcendentals.
    """
    if SCAN_IMPL == "shift":
        return _shift_scan(x, jnp.multiply, 1.0)
    return jnp.exp(_cumsum_lane(jnp.log(x), dot=dot))


def _shift_right_one(x: jax.Array, fill: float) -> jax.Array:
    """Shift lanes right by one along axis 1, filling lane 0 with `fill`."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lanes >= 1, pltpu.roll(x, shift=1, axis=1), fill)


def _tile_pixel_coords(
    t: jax.Array, tiles_w: int, tiles_per_image: int, tile: int = TILE
):
    """Pixel-center coordinates as (tile*tile, 1) columns for tile id t.

    Returns (px, py, ox, oy): global pixel centers plus the tile origin.
    The backward basis reductions use tile-LOCAL coordinates (px - ox) to
    avoid catastrophic cancellation in the separable moment sums.
    """
    tl = t % tiles_per_image
    ty = tl // tiles_w
    tx = tl % tiles_w
    pix = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
    ox = (tx * tile).astype(jnp.float32)
    oy = (ty * tile).astype(jnp.float32)
    px = ox + (pix % tile).astype(jnp.float32) + 0.5
    py = oy + (pix // tile).astype(jnp.float32) + 0.5
    return px, py, ox, oy


def _sigma_basis(lx: jax.Array, ly: jax.Array) -> jax.Array:
    """(256, 8) quadratic pixel basis [lx^2, ly^2, lx*ly, lx, ly, 1, 0, 0].

    Tile-LOCAL coordinates (<= 15.5, half-integers): every entry needs
    <= 10 mantissa bits, so the basis is exactly 2-splittable for the
    bf16 MXU decomposition in `_chunk_alphas`.  Two zero columns pad the
    contraction axis to the 8-sublane unit.
    """
    ones = jnp.ones_like(lx)
    zeros = jnp.zeros_like(lx)
    return jnp.concatenate(
        [lx * lx, ly * ly, lx * ly, lx, ly, ones, zeros, zeros], axis=1
    )


def _unpack_chunk(buf, n_channels: int):
    """bf16-pair packed chunk (P_rows, L) -> standard row layout (6+D, L).

    Packed rows: 0 = (x_loc, y_loc) TILE-LOCAL coords, 1 = (ca, cb),
    2 = (cc, op), 3.. = color pairs.  Inverse of the expansion kernel's
    packed emit (`gather_pallas._expand2_kernel` packed=True).
    """
    x, y = unpack_bf16_pair(buf[0:1, :])
    ca, cb = unpack_bf16_pair(buf[1:2, :])
    cc, op = unpack_bf16_pair(buf[2:3, :])
    cols = []
    for i in range(0, n_channels, 2):
        c0, c1 = unpack_bf16_pair(buf[3 + i // 2 : 4 + i // 2, :])
        cols.append(c0)
        if i + 1 < n_channels:
            cols.append(c1)
    return jnp.concatenate([x, y, ca, cb, cc, op] + cols, axis=0)


def packed_rows(n_channels: int) -> int:
    """Sort-payload rows in the packed layout: xy + cacb + ccop + colors."""
    return 3 + -(-n_channels // 2)


def grad_pack_rows(n_channels: int) -> int:
    """bf16-pair rows carrying the 6+D per-slot gradient rows."""
    return -(-(6 + n_channels) // 2)


def bwd_out_rows(n_channels: int, pack_grads: bool) -> int:
    """8-aligned sublane count of the backward kernel's [F_out, P] output."""
    live = grad_pack_rows(n_channels) if pack_grads else 6 + n_channels
    return -(-live // 8) * 8


def _chunk_alphas(buf, basis_sig, ox, oy, fast: bool = False):
    """Gated alphas (256, L) + intermediates from a staged chunk (F, L).

    buf rows: 0:x 1:y 2:conic_a 3:conic_b 4:conic_c 5:opacity 6..6+D colors.
    Parity: RasterizeToPixels3DGSDevice.cuh:eval_gaussian_weight.
    `fast` drops the coefficient-side exact split (2 MXU passes instead of
    6) — matched to bf16-grade packed inputs on the inference path.

    sigma[p, g] is evaluated as ONE MXU matmul instead of 6 VPU mul-adds
    over (256, L): expand the quadratic form around the tile origin,

        sigma = 0.5*ca*dx^2 + 0.5*cc*dy^2 + cb*dx*dy
              = [lx^2, ly^2, lx*ly, lx, ly, 1] . k(g)

    with 6 per-slot coefficients k(g) computed on (1, L) rows (256x less
    VPU work).  The basis side is exactly 2-splittable and the coefficient
    side rides an exact 3-split, so all six bf16 cross products are exact
    and the only rounding is f32 accumulation — the same error class as
    the scalar VPU evaluation it replaces (ops/mxu.py:dot_exact2_exact3).
    """
    mx = buf[0:1, :]  # (1, L)
    my = buf[1:2, :]
    ca = buf[2:3, :]
    cb = buf[3:4, :]
    cc = buf[4:5, :]
    op = buf[5:6, :]
    mxl = mx - ox  # tile-local gaussian centers (bounded by the tight
    myl = my - oy  # plan's ellipse reach, so the quadratic terms stay small)
    k3 = -(ca * mxl + cb * myl)
    k4 = -(cc * myl + cb * mxl)
    k5 = 0.5 * (ca * mxl * mxl + cc * myl * myl) + cb * mxl * myl
    z = jnp.zeros_like(ca)
    coeffs = jnp.concatenate(
        [0.5 * ca, 0.5 * cc, cb, k3, k4, k5, z, z], axis=0
    )  # (8, L)
    # fast: faithful 2-split on the coefficient side (4 passes vs 6) —
    # measured: a plain-bf16 coefficient side re-rounds the large
    # cancelling k5 terms (~2**-9 * |sigma at tile origin|) and showed up
    # as ~1% pixel error; the 2-split keeps it at 2**-17.
    sigma_dot = dot_exact2_faithful if fast else dot_exact2_exact3
    sigma = sigma_dot(
        basis_sig, coeffs, dims=(((1,), (0,)), ((), ()))
    )  # (256, L)
    # The expanded form cancels to ~0 at gaussian centers, where f32
    # accumulation noise (~|terms| * 2^-24) can land just below zero —
    # unlike the factored VPU form, which is a sum of non-negatives there.
    # Clamp and gate with a matching tolerance so center pixels are never
    # dropped; truly indefinite conics (the case the reference's sigma < 0
    # skip targets, RasterizeToPixels3DGSDevice.cuh) are far below -eps.
    # (The fast path's bf16-grade inputs define a nearby valid gaussian
    # whose coefficients are evaluated just as faithfully — bf16 products
    # are exact in f32 — so the same tolerance covers both paths.)
    sigma = jnp.where(sigma >= SIGMA_EPS_NEG, jnp.maximum(sigma, 0.0), sigma)
    vis = jnp.exp(-sigma)
    alpha_raw = op * vis
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    gate = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD)
    alpha = jnp.where(gate, alpha, 0.0)
    return alpha, alpha_raw, vis, gate, (mx, my, ca, cb, cc)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    # scalar prefetch
    base_ref,  # [T] int32: tile start // chunk (chunk units)
    head_ref,  # [T] int32: tile start % chunk
    count_ref,  # [T] int32: tile span length in slots
    # inputs
    isect_hbm,  # [F, P_pad] f32 in HBM, field-major sorted layout
    # outputs (VMEM blocks)
    color_ref,  # (1, D, 256)
    tfinal_ref,  # (1, 1, 256)
    # scratch
    buf_ref,  # (NBUF, F, chunk) VMEM
    t_ref,  # (256, 1) VMEM running transmittance
    sem,  # DMA semaphores (NBUF,)
    *,
    n_channels: int,
    tiles_w: int,
    tiles_per_image: int,
    width: int,
    height: int,
    chunk: int = CHUNK,
    packed: bool = False,
    tile: int = TILE,
):
    t = pl.program_id(0)
    base = base_ref[t]
    head = head_ref[t]
    count = count_ref[t]
    n_ch = (head + count + chunk - 1) // chunk

    px, py, ox, oy = _tile_pixel_coords(t, tiles_w, tiles_per_image, tile)
    in_image = (px <= width) & (py <= height)  # centers are at +0.5
    t_ref[:] = jnp.where(in_image, 1.0, 0.0)
    color_ref[:] = jnp.zeros_like(color_ref)
    basis_sig = _sigma_basis(px - ox, py - oy)  # (256, 8), per tile
    # packed scans stay at the faithful 2-split: 1-pass bf16 scans round
    # log-transmittance per element (~2**-9 * 4.6) and measured ~1% pixel
    # error on deep stacks
    scan_dot = None

    def dma(c):
        off = pl.multiple_of((base + c) * chunk, chunk)
        slot = jax.lax.rem(c, NBUF)
        return pltpu.make_async_copy(
            isect_hbm.at[:, pl.ds(off, chunk)],
            buf_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(count > 0)
    def _():
        # warm the pipeline: NBUF chunks in flight
        for k in range(NBUF):
            @pl.when(k < n_ch)
            def _():
                dma(k).start()

        def body(carry):
            c, _ = carry
            slot = jax.lax.rem(c, NBUF)
            dma(c).wait()

            # head lanes belong to the previous tile, tail lanes to the
            # next; both may carry arbitrary data (0 * NaN would poison
            # the matmuls): zero them before any use
            lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            g = c * chunk + lane_row
            valid_row = (g >= head) & (g < head + count)
            buf = jnp.where(valid_row, buf_ref[slot], 0.0)
            if packed:
                # bf16-pair payload with TILE-LOCAL coords (zero bits
                # unpack to exact zeros, so the lane mask above holds)
                buf = _unpack_chunk(buf, n_channels)
                alpha, _, _, _, _ = _chunk_alphas(
                    buf, basis_sig, 0.0, 0.0, fast=True
                )
            else:
                alpha, _, _, _, _ = _chunk_alphas(buf, basis_sig, ox, oy)

            one_m = 1.0 - alpha
            cp_incl = _cumprod_lane(one_m, dot=scan_dot)
            cp_excl = _shift_right_one(cp_incl, 1.0)
            t_prev = t_ref[:]  # (256, 1)
            contribute = (t_prev * cp_incl) > TRANSMITTANCE_THRESHOLD
            w = alpha * (t_prev * cp_excl) * contribute  # (256, 128)

            colors = buf[6 : 6 + n_channels, :]  # (D, 128)
            # faithful 3-pass bf16 (vs HIGHEST's 6): per-product error
            # ~2**-16, f32 accumulation — orders below the gate tolerances.
            # Packed path: single bf16 pass (inputs are already bf16-grade).
            cdims = (((1,), (1,)), ((), ()))
            if packed:
                # colors are bf16-sourced: split only the weight side
                acc = dot_plain_faithful(colors, w, dims=cdims)
            else:
                acc = dot_faithful(colors, w, dims=cdims)  # (D, 256)
            color_ref[0] += acc

            t_new = t_prev * jnp.min(
                jnp.where(contribute, cp_incl, 1.0), axis=1, keepdims=True
            )
            t_ref[:] = t_new

            # the slot is free now: refill it with chunk c + NBUF
            @pl.when(c + NBUF < n_ch)
            def _():
                dma(c + NBUF).start()

            tmax = jnp.max(t_new) if EARLY_EXIT else jnp.float32(1.0)
            return c + 1, tmax

        if EARLY_EXIT:
            def cond(carry):
                c, tmax = carry
                return (c < n_ch) & (tmax > TRANSMITTANCE_THRESHOLD)

            c_final, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.float32(1.0))
            )

            # On early exit, chunks [c_final, min(c_final+NBUF, n_ch)) may
            # have DMAs in flight; drain them so the next grid step's DMAs
            # can't race buffers/semaphores.
            @pl.when(c_final < n_ch)
            def _():
                def drain(c, _):
                    @pl.when(c < n_ch)
                    def _():
                        dma(c).wait()
                    return ()

                jax.lax.fori_loop(c_final, c_final + NBUF, drain, ())
        else:
            jax.lax.fori_loop(
                0, n_ch, lambda c, s: body((c, s))[1], jnp.float32(1.0)
            )

    tfinal_ref[0] = jnp.transpose(t_ref[:], (1, 0))


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    # scalar prefetch
    base_ref,  # [T] int32 (chunk units)
    head_ref,  # [T] int32
    count_ref,  # [T] int32
    # inputs
    isect_hbm,  # [F, P_pad] HBM
    v_pix_ref,  # (1, D, 256) cotangent of pix_out (tiled)
    v_tfinal_ref,  # (1, 1, 256) cotangent of t_final
    pix_out_ref,  # (1, D, 256) forward output (for suffix sums)
    tfinal_fwd_ref,  # (1, 1, 256) forward final transmittance
    # outputs
    v_isect_hbm,  # [F_out, P_pad] HBM — per-slot grads at sorted positions
    # scratch
    buf_ref,  # (NBUF, F, 128)
    vbuf_ref,  # (NBUF, F_out, 128)
    t_ref,  # (256, 1) replayed transmittance
    e_ref,  # (256, 1) running sum_{j<=i} w_j d_j
    pend_ref,  # (F_out, 128) carry: partial boundary chunk
    sem,  # (NBUF,) in DMA semaphores
    osem,  # (NBUF,) out DMA semaphores
    fsem,  # (1,) flush DMA semaphore
    *,
    n_channels: int,
    tiles_w: int,
    tiles_per_image: int,
    width: int,
    height: int,
    chunk: int = CHUNK,
    packed: bool = False,
    pack_grads: bool = False,
    tile: int = TILE,
):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    base = base_ref[t]
    head = head_ref[t]
    count = count_ref[t]
    D = n_channels
    F_out = bwd_out_rows(D, pack_grads)  # 8-aligned sublanes for DMA slices
    n_ch = (head + count + chunk - 1) // chunk
    end = head + count
    end_off = end - (n_ch - 1) * chunk  # lanes of the last chunk that are ours
    tail_partial = jnp.logical_and(count > 0, end_off < chunk)

    px, py, ox, oy = _tile_pixel_coords(t, tiles_w, tiles_per_image, tile)
    in_image = (px <= width) & (py <= height)
    t_ref[:] = jnp.where(in_image, 1.0, 0.0)
    e_ref[:] = jnp.zeros_like(e_ref)
    # tile-local pixel coordinates for the moment basis (conditioning)
    lx = px - ox
    ly = py - oy

    v_pix = v_pix_ref[0]  # (D, 256)
    vt_col = jnp.transpose(v_tfinal_ref[0], (1, 0))  # (256, 1)
    t_fwd_col = jnp.transpose(tfinal_fwd_ref[0], (1, 0))  # (256, 1)
    # Dtot(p) = sum_c v_pix(c,p) * pix_out(c,p) = sum over ALL j of w_j d_j
    dtot_col = jnp.transpose(
        jnp.sum(v_pix * pix_out_ref[0], axis=0, keepdims=True), (1, 0)
    )  # (256, 1)
    vt_term = vt_col * t_fwd_col  # (256, 1)

    ones = jnp.ones((tile * tile, 1), jnp.float32)
    basis = jnp.concatenate(
        [ones, lx, ly, lx * lx, lx * ly, ly * ly], axis=1
    )  # (256, 6) in tile-local coordinates
    basis_sig = _sigma_basis(lx, ly)  # (256, 8) for the conic matmul

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (F_out, chunk), 1)

    def dma_in(c):
        off = pl.multiple_of((base + c) * chunk, chunk)
        slot = jax.lax.rem(c, NBUF)
        return pltpu.make_async_copy(
            isect_hbm.at[:, pl.ds(off, chunk)],
            buf_ref.at[slot],
            sem.at[slot],
        )

    def dma_out(c):
        off = pl.multiple_of((base + c) * chunk, chunk)
        slot = jax.lax.rem(c, NBUF)
        return pltpu.make_async_copy(
            vbuf_ref.at[slot],
            v_isect_hbm.at[:, pl.ds(off, chunk)],
            osem.at[slot],
        )

    def emit_chunk(c):
        """Finish chunk c: merge the carry into the head chunk, hold the
        partial tail chunk in the carry, else start its out-DMA."""
        slot = jax.lax.rem(c, NBUF)
        is_held = jnp.logical_and(c == n_ch - 1, tail_partial)

        # head chunk shared with the previous tile: lanes < head hold its
        # grads (carried in pend_ref)
        @pl.when(jnp.logical_and(c == 0, head > 0))
        def _():
            vbuf_ref[slot] = jnp.where(
                lane128 < head, pend_ref[:, :], vbuf_ref[slot]
            )

        @pl.when(is_held)
        def _():
            # hold: this chunk's tail lanes belong to the next tile
            pend_ref[:, :] = jnp.where(lane128 < end_off, vbuf_ref[slot], 0.0)

        @pl.when(jnp.logical_not(is_held))
        def _():
            dma_out(c).start()

    def wait_out(c):
        """Wait chunk c's out-DMA (callers never pass the held chunk)."""
        dma_out(c).wait()

    @pl.when(count > 0)
    def _():
        for k in range(NBUF):
            @pl.when(k < n_ch)
            def _():
                dma_in(k).start()

        def body(carry):
            c, _ = carry
            slot = jax.lax.rem(c, NBUF)
            dma_in(c).wait()

            # the grad write that used this vbuf slot must have landed
            # (chunk c - NBUF is never the held tail chunk: it is < n_ch-1)
            @pl.when(c >= NBUF)
            def _():
                wait_out(c - NBUF)

            # two-sided lane mask (head/tail lanes are other tiles' slots)
            lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            g = c * chunk + lane_row
            lane_valid = (g >= head) & (g < end)
            buf = jnp.where(lane_valid, buf_ref[slot], 0.0)
            if packed:
                # bf16-pair payload with TILE-LOCAL coords: the replay must
                # reproduce the packed forward's compositing decisions
                # bit-exactly, so the unpack + alpha path match
                # _fwd_kernel's packed branch exactly
                buf = _unpack_chunk(buf, n_channels)
                alpha, alpha_raw, vis, gate, (mx, my, ca, cb, cc) = (
                    _chunk_alphas(buf, basis_sig, 0.0, 0.0, fast=True)
                )
            else:
                alpha, alpha_raw, vis, gate, (mx, my, ca, cb, cc) = (
                    _chunk_alphas(buf, basis_sig, ox, oy)
                )

            one_m = 1.0 - alpha
            cp_incl = _cumprod_lane(one_m)
            cp_excl = _shift_right_one(cp_incl, 1.0)
            t_prev = t_ref[:]
            contribute = (t_prev * cp_incl) > TRANSMITTANCE_THRESHOLD
            t_i = t_prev * cp_excl  # (256, L)
            w = alpha * t_i * contribute

            colors = buf[6 : 6 + D, :]  # (D, L)
            # d(p, g) = sum_c v_pix(c, p) * colors(c, g) — faithful 3-pass
            # bf16 (K = 3D stays one MXU pass; see ops/mxu.py:dot_faithful)
            d = dot_faithful(
                v_pix, colors, dims=(((0,), (0,)), ((), ()))
            )  # (256, L)

            wd = w * d
            e_incl = e_ref[:] + _cumsum_lane(wd)

            inv_om = 1.0 / one_m  # alpha <= 0.99 so one_m >= 0.01
            v_alpha = d * t_i - (dtot_col - e_incl) * inv_om - vt_term * inv_om
            live = contribute & gate & lane_valid
            v_alpha = jnp.where(live, v_alpha, 0.0)

            unclamped = alpha_raw < MAX_ALPHA
            v_sigma = jnp.where(unclamped, -alpha * v_alpha, 0.0)  # (256, L)
            v_op = jnp.sum(
                jnp.where(unclamped, vis * v_alpha, 0.0), axis=0, keepdims=True
            )  # (1, L)

            # pixel-basis reductions: one MXU matmul.  The basis side is
            # exactly 2-splittable (half-integer coords, <=10 mantissa
            # bits), so the 4-pass exact-basis variant holds ~2**-18
            # per-product error despite the large lx**2 terms.
            R = dot_exact2_faithful(
                basis, v_sigma, dims=(((0,), (0,)), ((), ()))
            )  # (6, L)
            r0, r1, r2 = R[0:1, :], R[1:2, :], R[2:3, :]
            r3, r4, r5 = R[3:4, :], R[4:5, :], R[5:6, :]
            # sums of v_sigma * {dx^2, dx*dy, dy^2, dx, dy} via separability;
            # dx = mx - px is translation invariant, so tile-local means pair
            # with the tile-local basis (well-conditioned moments).  Packed
            # buffers already carry tile-local means.
            mxl = mx if packed else mx - ox
            myl = my if packed else my - oy
            s_dx2 = mxl * mxl * r0 - 2.0 * mxl * r1 + r3
            s_dxdy = mxl * myl * r0 - mxl * r2 - myl * r1 + r4
            s_dy2 = myl * myl * r0 - 2.0 * myl * r2 + r5
            s_dx = mxl * r0 - r1
            s_dy = myl * r0 - r2

            # v_colors(c, g) = sum_p v_pix(c, p) w(p, g) — faithful 3-pass
            v_col = dot_faithful(
                v_pix, w, dims=(((1,), (0,)), ((), ()))
            )  # (D, L)

            grad_rows = [
                ca * s_dx + cb * s_dy,  # v_mx
                cb * s_dx + cc * s_dy,  # v_my
                0.5 * s_dx2,  # v_conic_a
                s_dxdy,  # v_conic_b
                0.5 * s_dy2,  # v_conic_c
                v_op,
            ] + [v_col[i : i + 1, :] for i in range(D)]
            if pack_grads:
                # bf16-pair the per-slot grads: halves the [F_out, P] HBM
                # write AND the downstream id-sort payload.  Per-slot
                # relative error ~2**-9 with data-dependent sign; adopted
                # only behind the quality-benchmark gate (see
                # ops/rasterize.py PACK_GRADS).
                from .mxu import pack_bf16_pair

                for i in range(0, len(grad_rows), 2):
                    hi = grad_rows[i]
                    lo = (
                        grad_rows[i + 1]
                        if i + 1 < len(grad_rows)
                        else jnp.zeros_like(hi)
                    )
                    vbuf_ref[slot, i // 2 : i // 2 + 1, :] = pack_bf16_pair(
                        hi, lo
                    )
            else:
                for i, r in enumerate(grad_rows):
                    vbuf_ref[slot, i : i + 1, :] = r
            emit_chunk(c)

            # the input slot is free now: refill with chunk c + NBUF
            @pl.when(c + NBUF < n_ch)
            def _():
                dma_in(c + NBUF).start()

            # update carries
            t_new = t_prev * jnp.min(
                jnp.where(contribute, cp_incl, 1.0), axis=1, keepdims=True
            )
            t_ref[:] = t_new
            e_ref[:] = e_ref[:] + jnp.sum(wd, axis=1, keepdims=True)
            tmax = jnp.max(t_new) if EARLY_EXIT else jnp.float32(1.0)
            return c + 1, tmax

        if EARLY_EXIT:
            def cond(carry):
                c, tmax = carry
                return (c < n_ch) & (tmax > TRANSMITTANCE_THRESHOLD)

            # early exit like the forward: once every pixel saturates, all
            # later slots have live == 0 and therefore exactly-zero
            # gradients (the replay analog of the CUDA last_ids cutoff)
            f, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.float32(1.0))
            )

            # drain in-flight input prefetches ([f, f+NBUF) ∩ [0, n_ch))
            @pl.when(f < n_ch)
            def _():
                def drain_in(c, _):
                    @pl.when(c < n_ch)
                    def _():
                        dma_in(c).wait()
                    return ()

                jax.lax.fori_loop(f, f + NBUF, drain_in, ())

            # zero-fill the skipped tail so the reduction reads exact
            # zeros (same per-chunk merge/hold protocol, with zero data;
            # f >= 1 here so the head-merge case never recurs)
            def zbody(c, _):
                slot = jax.lax.rem(c, NBUF)

                @pl.when(c >= NBUF)
                def _():
                    wait_out(c - NBUF)

                vbuf_ref[slot] = jnp.zeros_like(vbuf_ref[slot])
                emit_chunk(c)
                return ()

            jax.lax.fori_loop(f, n_ch, zbody, ())
        else:
            jax.lax.fori_loop(
                0, n_ch, lambda c, s: body((c, s))[1], jnp.float32(1.0)
            )

        # drain the last (up to NBUF) out-DMAs, skipping the held chunk
        def drain_out(c, _):
            @pl.when(
                jnp.logical_and(
                    c >= 0,
                    jnp.logical_not(
                        jnp.logical_and(c == n_ch - 1, tail_partial)
                    ),
                )
            )
            def _():
                wait_out(c)
            return ()

        jax.lax.fori_loop(
            jnp.maximum(n_ch - NBUF, 0), n_ch, drain_out, ()
        )

    # Final grid step: flush the carried partial chunk (the live stream's
    # last chunk when its end is not 128-aligned).  Tail lanes are zero.
    @pl.when(t == n_t - 1)
    def _():
        live_end = base * chunk + end  # == total live slots
        last_off = live_end % chunk

        @pl.when(last_off > 0)
        def _():
            flush = pltpu.make_async_copy(
                pend_ref,
                v_isect_hbm.at[:, pl.ds((live_end // chunk) * chunk, chunk)],
                fsem.at[0],
            )
            flush.start()
            flush.wait()


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_channels", "tiles_w", "tiles_per_image",
        "width", "height", "n_tiles", "chunk", "packed", "tile",
    ),
)
def _fwd_call(
    isect_data: jax.Array,  # [F, P_pad] field-major sorted layout
    base: jax.Array,  # [T] chunk index of tile start
    head: jax.Array,  # [T]
    count: jax.Array,  # [T]
    *,
    n_channels: int,
    tiles_w: int,
    tiles_per_image: int,
    width: int,
    height: int,
    n_tiles: int,
    chunk: int = CHUNK,
    packed: bool = False,
    tile: int = TILE,
):
    F = isect_data.shape[0]
    D = n_channels
    n_pix = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, D, n_pix), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, n_pix), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, F, chunk), jnp.float32),
            pltpu.VMEM((n_pix, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel,
        n_channels=n_channels,
        tiles_w=tiles_w,
        tiles_per_image=tiles_per_image,
        width=width,
        height=height,
        chunk=chunk,
        packed=packed,
        tile=tile,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, D, n_pix), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, n_pix), jnp.float32),
        ],
        compiler_params=_seq_params(),
        interpret=_interpret(),
    )(base, head, count, isect_data)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_channels", "tiles_w", "tiles_per_image",
        "width", "height", "n_tiles", "chunk", "packed", "pack_grads",
        "tile",
    ),
)
def _bwd_call(
    isect_data: jax.Array,  # [F, P_pad]
    base: jax.Array,
    head: jax.Array,
    count: jax.Array,
    v_pix: jax.Array,  # [T, D, 256]
    v_tfinal: jax.Array,  # [T, 1, 256]
    pix_out: jax.Array,  # [T, D, 256]
    t_final: jax.Array,  # [T, 1, 256]
    *,
    n_channels: int,
    tiles_w: int,
    tiles_per_image: int,
    width: int,
    height: int,
    n_tiles: int,
    chunk: int = CHUNK,
    packed: bool = False,
    pack_grads: bool = False,
    tile: int = TILE,
):
    F = isect_data.shape[0]
    P_pad = isect_data.shape[1]
    D = n_channels
    n_pix = tile * tile
    # rows beyond the live grad rows are DMA alignment padding (may carry
    # scratch garbage; the reduction never reads them)
    F_out = bwd_out_rows(D, pack_grads)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, D, n_pix), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, n_pix), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, D, n_pix), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, n_pix), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((NBUF, F, chunk), jnp.float32),
            pltpu.VMEM((NBUF, F_out, chunk), jnp.float32),
            pltpu.VMEM((n_pix, 1), jnp.float32),
            pltpu.VMEM((n_pix, 1), jnp.float32),
            pltpu.VMEM((F_out, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel,
        n_channels=n_channels,
        tiles_w=tiles_w,
        tiles_per_image=tiles_per_image,
        width=width,
        height=height,
        chunk=chunk,
        packed=packed,
        pack_grads=pack_grads,
        tile=tile,
    )
    # Slots in the sentinel tail (beyond the last tile's span) are never
    # written — the reduction masks them by position (ops/rasterize.py).
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((F_out, P_pad), jnp.float32)],
        compiler_params=_seq_params(),
        interpret=_interpret(),
    )(base, head, count, isect_data, v_pix, v_tfinal, pix_out, t_final)
