"""Pallas TPU rasterization kernels: tile-chunked alpha compositing fwd/bwd.

TPU-native redesign of the reference CUDA rasterizer
(gsplat/cuda/csrc/RasterizeToPixels3DGSSerialBatch{Fwd,Bwd}.cu):

  * CUDA: one CTA per tile, shared-memory staging of CTA-size gaussian
    batches, per-pixel serial front-to-back blend with `__syncthreads_count`
    early-out, backward via back-to-front replay + atomicAdd scatter.
  * Here: one grid step per tile; the depth-sorted per-tile worklist is laid
    out field-major [F, A] in HBM with chunk-aligned 128-wide spans
    (see ops.isect.build_tile_worklist) and DMA'd through VMEM in
    SUPER-chunks of SUP x 128 lanes with double buffering (the per-128
    version was DMA-latency bound: ~10ns of transfer against ~1-2us of
    latency per chunk; 512-lane super-chunks give ~3us of VPU work to hide
    it behind). Compositing runs in its associative form — per-chunk
    cumulative products of (1 - alpha) on the VPU and an MXU matmul for the
    color accumulation — with a whole-tile early exit when every pixel's
    transmittance saturates (the analog of the CUDA done-mask break,
    Fwd.cu:268-271).
  * Backward is a front-to-back *replay* (no last_ids needed — the
    saturation masks are recomputed exactly), producing per-worklist-slot
    gradients written densely to HBM. Accumulation to per-gaussian gradients
    happens outside the kernel as a sorted segment reduction — deterministic,
    no atomics (a correctness upgrade over the CUDA `atomicAdd` path).

The associative per-chunk formulation here (partial (T, c) folds composed
by cumulative products) is the same reformulation as the reference's
ParallelBatch eval3d renderer (SURVEY N19,
RasterizeToPixelsFromWorld3DGSParallelBatchFwd.cu:101-133) — on TPU it is
the baseline design rather than an optional backend.

Compositing semantics match RasterizeToPixels3DGSDevice.cuh exactly:
sigma/alpha gates, MAX_ALPHA clamp, transmittance threshold with the
saturating gaussian excluded, background blended with the final
transmittance.

Layout: 128 depth-consecutive gaussians per aligned chunk on the lane axis
(TPU DMA requires 128-lane minor dims for dynamically offset HBM slices);
the 256 pixels of a 16x16 tile live on the sublane axis. Tile spans are
128-aligned; the last super-chunk of a tile may straddle into the next
tile's span, so alphas are gated by the tile's true chunk count and
backward writes are issued per valid 128-chunk only. Per-tile images are
produced in a tiled [n_tiles, D, 256] layout and re-assembled outside the
kernel (see ops.rasterize.tile_image/untile_image).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_THRESHOLD

DEFAULT_CHUNK = 128  # aligned-span granularity == lane width (hard constraint)
SUP = 4  # 128-chunks per DMA super-chunk (512 lanes per loop iteration)
TILE = 16  # tile_size for the Pallas path (pixels per side)
N_PIX = TILE * TILE  # 256 pixels per tile


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _cumprod_lane(x: jax.Array) -> jax.Array:
    """Inclusive cumulative product along axis 1 (Hillis-Steele log-scan)."""
    k = x.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, shift=s, axis=1)
        x = x * jnp.where(lanes >= s, shifted, 1.0)
        s *= 2
    return x


def _cumsum_lane(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along axis 1 (Hillis-Steele log-scan)."""
    k = x.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, shift=s, axis=1)
        x = x + jnp.where(lanes >= s, shifted, 0.0)
        s *= 2
    return x


def _shift_right_one(x: jax.Array, fill: float) -> jax.Array:
    """Shift lanes right by one along axis 1, filling lane 0 with `fill`."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lanes >= 1, pltpu.roll(x, shift=1, axis=1), fill)


def _tile_pixel_coords(t: jax.Array, tiles_w: int, tiles_per_image: int):
    """Pixel-center coordinates as (256, 1) columns for linear tile id t.

    Returns (px, py, ox, oy): global pixel centers plus the tile origin.
    The backward basis reductions use tile-LOCAL coordinates (px - ox) to
    avoid catastrophic cancellation in the separable moment sums.
    """
    tl = t % tiles_per_image
    ty = tl // tiles_w
    tx = tl % tiles_w
    pix = jax.lax.broadcasted_iota(jnp.int32, (N_PIX, 1), 0)
    ox = (tx * TILE).astype(jnp.float32)
    oy = (ty * TILE).astype(jnp.float32)
    px = ox + (pix % TILE).astype(jnp.float32) + 0.5
    py = oy + (pix // TILE).astype(jnp.float32) + 0.5
    return px, py, ox, oy


def _chunk_alphas(buf, px, py):
    """Gated alphas (256, L) + intermediates from a staged chunk (F, L).

    buf rows: 0:x 1:y 2:conic_a 3:conic_b 4:conic_c 5:opacity 6..6+D colors.
    Parity: RasterizeToPixels3DGSDevice.cuh:eval_gaussian_weight.
    """
    mx = buf[0:1, :]  # (1, L)
    my = buf[1:2, :]
    ca = buf[2:3, :]
    cb = buf[3:4, :]
    cc = buf[4:5, :]
    op = buf[5:6, :]
    dx = mx - px  # (256, L)
    dy = my - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
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
    chunk_starts_ref,  # [T] int32 (units of 128-chunks)
    n_chunks_ref,  # [T] int32
    # inputs
    isect_hbm,  # [F, A] f32 in HBM, field-major
    # outputs (VMEM blocks)
    color_ref,  # (1, D, 256)
    tfinal_ref,  # (1, 1, 256)
    # scratch
    buf_ref,  # (2, F, SUP*128) VMEM
    t_ref,  # (256, 1) VMEM running transmittance
    sem,  # DMA semaphores (2, SUP)
    *,
    chunk: int,
    n_channels: int,
    tiles_w: int,
    tiles_per_image: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    start = chunk_starts_ref[t]
    n_ch = n_chunks_ref[t]
    L = SUP * chunk
    n_sup = (n_ch + SUP - 1) // SUP

    px, py, _, _ = _tile_pixel_coords(t, tiles_w, tiles_per_image)
    in_image = (px <= width) & (py <= height)  # centers are at +0.5
    t_ref[:] = jnp.where(in_image, 1.0, 0.0)
    color_ref[:] = jnp.zeros_like(color_ref)

    def dma(slot, k, c):
        off = pl.multiple_of((start + c) * chunk, chunk)
        return pltpu.make_async_copy(
            isect_hbm.at[:, pl.ds(off, chunk)],
            buf_ref.at[slot, :, pl.ds(k * chunk, chunk)],
            sem.at[slot, k],
        )

    def start_super(slot, s):
        for k in range(SUP):
            @pl.when(s * SUP + k < n_ch)
            def _():
                dma(slot, k, s * SUP + k).start()

    def wait_super(slot, s):
        for k in range(SUP):
            @pl.when(s * SUP + k < n_ch)
            def _():
                dma(slot, k, s * SUP + k).wait()

    @pl.when(n_ch > 0)
    def _():
        start_super(0, 0)

        def body(carry):
            s, _ = carry
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < n_sup)
            def _():
                start_super(1 - slot, s + 1)

            wait_super(slot, s)
            # lanes past the tile's true span hold stale or uninitialized
            # data (possibly NaN, which would poison the matmuls via 0*NaN):
            # zero them before any use
            lane_row = jax.lax.broadcasted_iota(
                jnp.int32, (1, L), 1
            )
            valid_row = (s * L + lane_row) < n_ch * chunk
            buf = jnp.where(valid_row, buf_ref[slot], 0.0)

            alpha, _, _, _, _ = _chunk_alphas(buf, px, py)

            one_m = 1.0 - alpha
            cp_incl = _cumprod_lane(one_m)
            cp_excl = _shift_right_one(cp_incl, 1.0)
            t_prev = t_ref[:]  # (256, 1)
            contribute = (t_prev * cp_incl) > TRANSMITTANCE_THRESHOLD
            w = alpha * (t_prev * cp_excl) * contribute  # (256, L)

            colors = buf[6 : 6 + n_channels, :]  # (D, L)
            acc = jax.lax.dot_general(
                colors,
                w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (D, 256)
            color_ref[0] += acc

            t_new = t_prev * jnp.min(
                jnp.where(contribute, cp_incl, 1.0), axis=1, keepdims=True
            )
            t_ref[:] = t_new
            return s + 1, jnp.max(t_new)

        def cond(carry):
            s, tmax = carry
            return (s < n_sup) & (tmax > TRANSMITTANCE_THRESHOLD)

        s_final, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(1.0))
        )

        # On early exit a prefetch for super-chunk s_final may be in flight;
        # drain it so the next grid step's DMAs can't race buffers/semaphores.
        @pl.when(s_final < n_sup)
        def _():
            wait_super(jax.lax.rem(s_final, 2), s_final)

    tfinal_ref[0] = jnp.transpose(t_ref[:], (1, 0))


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    # scalar prefetch
    chunk_starts_ref,
    n_chunks_ref,
    # inputs
    isect_hbm,  # [F, A] HBM
    v_pix_ref,  # (1, D, 256) cotangent of pix_out (tiled)
    v_tfinal_ref,  # (1, 1, 256) cotangent of t_final
    pix_out_ref,  # (1, D, 256) forward output (for suffix sums)
    tfinal_fwd_ref,  # (1, 1, 256) forward final transmittance
    # outputs
    v_isect_hbm,  # [F, A] HBM — per-slot gradients
    # scratch
    buf_ref,  # (2, F, SUP*128)
    vbuf_ref,  # (2, F, SUP*128)
    t_ref,  # (256, 1) replayed transmittance
    e_ref,  # (256, 1) running sum_{j<=i} w_j d_j
    sem,  # (2, SUP) in DMA semaphores
    osem,  # (2, SUP) out DMA semaphores
    *,
    chunk: int,
    n_channels: int,
    tiles_w: int,
    tiles_per_image: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    start = chunk_starts_ref[t]
    n_ch = n_chunks_ref[t]
    D = n_channels
    L = SUP * chunk
    n_sup = (n_ch + SUP - 1) // SUP

    px, py, ox, oy = _tile_pixel_coords(t, tiles_w, tiles_per_image)
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

    ones = jnp.ones((N_PIX, 1), jnp.float32)
    basis = jnp.concatenate(
        [ones, lx, ly, lx * lx, lx * ly, ly * ly], axis=1
    )  # (256, 6) in tile-local coordinates

    def dma_in(slot, k, c):
        off = pl.multiple_of((start + c) * chunk, chunk)
        return pltpu.make_async_copy(
            isect_hbm.at[:, pl.ds(off, chunk)],
            buf_ref.at[slot, :, pl.ds(k * chunk, chunk)],
            sem.at[slot, k],
        )

    def dma_out(slot, k, c):
        off = pl.multiple_of((start + c) * chunk, chunk)
        return pltpu.make_async_copy(
            vbuf_ref.at[slot, :, pl.ds(k * chunk, chunk)],
            v_isect_hbm.at[:, pl.ds(off, chunk)],
            osem.at[slot, k],
        )

    def start_super_in(slot, s):
        for k in range(SUP):
            @pl.when(s * SUP + k < n_ch)
            def _():
                dma_in(slot, k, s * SUP + k).start()

    def wait_super_in(slot, s):
        for k in range(SUP):
            @pl.when(s * SUP + k < n_ch)
            def _():
                dma_in(slot, k, s * SUP + k).wait()

    def start_super_out(slot, s):
        for k in range(SUP):
            @pl.when(s * SUP + k < n_ch)
            def _():
                dma_out(slot, k, s * SUP + k).start()

    def wait_super_out(slot, s):
        for k in range(SUP):
            @pl.when(s * SUP + k < n_ch)
            def _():
                dma_out(slot, k, s * SUP + k).wait()

    @pl.when(n_ch > 0)
    def _():
        start_super_in(0, 0)

        def body(carry):
            s, _ = carry
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < n_sup)
            def _():
                start_super_in(1 - slot, s + 1)

            wait_super_in(slot, s)

            # the grad writes that used this vbuf slot must have landed
            @pl.when(s >= 2)
            def _():
                wait_super_out(slot, s - 2)

            # zero stale/uninitialized lanes (0 * NaN poisons matmuls)
            lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            lane_valid = (s * L + lane_row) < n_ch * chunk
            buf = jnp.where(lane_valid, buf_ref[slot], 0.0)
            alpha, alpha_raw, vis, gate, (mx, my, ca, cb, cc) = _chunk_alphas(
                buf, px, py
            )

            one_m = 1.0 - alpha
            cp_incl = _cumprod_lane(one_m)
            cp_excl = _shift_right_one(cp_incl, 1.0)
            t_prev = t_ref[:]
            contribute = (t_prev * cp_incl) > TRANSMITTANCE_THRESHOLD
            t_i = t_prev * cp_excl  # (256, L)
            w = alpha * t_i * contribute

            colors = buf[6 : 6 + D, :]  # (D, L)
            # d(p, g) = sum_c v_pix(c, p) * colors(c, g)
            d = jax.lax.dot_general(
                v_pix,
                colors,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
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

            # pixel-basis reductions: one MXU matmul
            R = jax.lax.dot_general(
                basis,
                v_sigma,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (6, L)
            r0, r1, r2 = R[0:1, :], R[1:2, :], R[2:3, :]
            r3, r4, r5 = R[3:4, :], R[4:5, :], R[5:6, :]
            # sums of v_sigma * {dx^2, dx*dy, dy^2, dx, dy} via separability;
            # dx = mx - px is translation invariant, so tile-local means pair
            # with the tile-local basis (well-conditioned moments)
            mxl = mx - ox
            myl = my - oy
            s_dx2 = mxl * mxl * r0 - 2.0 * mxl * r1 + r3
            s_dxdy = mxl * myl * r0 - mxl * r2 - myl * r1 + r4
            s_dy2 = myl * myl * r0 - 2.0 * myl * r2 + r5
            s_dx = mxl * r0 - r1
            s_dy = myl * r0 - r2

            # v_colors(c, g) = sum_p v_pix(c, p) w(p, g)
            v_col = jax.lax.dot_general(
                v_pix,
                w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (D, L)

            vbuf_ref[slot, 0:1, :] = ca * s_dx + cb * s_dy  # v_mx
            vbuf_ref[slot, 1:2, :] = cb * s_dx + cc * s_dy  # v_my
            vbuf_ref[slot, 2:3, :] = 0.5 * s_dx2  # v_conic_a
            vbuf_ref[slot, 3:4, :] = s_dxdy  # v_conic_b
            vbuf_ref[slot, 4:5, :] = 0.5 * s_dy2  # v_conic_c
            vbuf_ref[slot, 5:6, :] = v_op
            vbuf_ref[slot, 6 : 6 + D, :] = v_col
            start_super_out(slot, s)

            # update carries
            t_new = t_prev * jnp.min(
                jnp.where(contribute, cp_incl, 1.0), axis=1, keepdims=True
            )
            t_ref[:] = t_new
            e_ref[:] = e_ref[:] + jnp.sum(wd, axis=1, keepdims=True)
            return s + 1, jnp.max(t_new)

        def cond(carry):
            s, tmax = carry
            return (s < n_sup) & (tmax > TRANSMITTANCE_THRESHOLD)

        # early exit like the forward: once every pixel saturates, all
        # later slots have live == 0 and therefore exactly-zero gradients
        # (the replay analog of the CUDA last_ids cutoff)
        f, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1.0)))

        # wait the possibly-inflight input prefetch for super f
        @pl.when(f < n_sup)
        def _():
            wait_super_in(jax.lax.rem(f, 2), f)

        # drain outstanding compute grad writes (supers f-2, f-1)
        @pl.when(f >= 2)
        def _():
            wait_super_out(jax.lax.rem(f, 2), f - 2)

        @pl.when(f >= 1)
        def _():
            wait_super_out(jax.lax.rem(f - 1, 2), f - 1)

        # zero-fill the skipped tail so the reduction reads exact zeros
        @pl.when(f < n_sup)
        def _():
            vbuf_ref[0] = jnp.zeros_like(vbuf_ref[0])
            vbuf_ref[1] = jnp.zeros_like(vbuf_ref[1])

            def zbody(s, _):
                slot = jax.lax.rem(s, 2)

                @pl.when(s - 2 >= f)
                def _():
                    wait_super_out(slot, s - 2)

                start_super_out(slot, s)
                return ()

            jax.lax.fori_loop(f, n_sup, zbody, ())

            @pl.when(n_sup - 2 >= f)
            def _():
                wait_super_out(jax.lax.rem(n_sup, 2), n_sup - 2)

            wait_super_out(jax.lax.rem(n_sup - 1, 2), n_sup - 1)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "n_channels", "tiles_w", "tiles_per_image",
        "width", "height", "n_tiles",
    ),
)
def _fwd_call(
    isect_data: jax.Array,  # [F, A] field-major
    chunk_starts: jax.Array,  # [T]
    n_chunks: jax.Array,  # [T]
    *,
    chunk: int,
    n_channels: int,
    tiles_w: int,
    tiles_per_image: int,
    width: int,
    height: int,
    n_tiles: int,
):
    F = isect_data.shape[0]
    D = n_channels
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, D, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, N_PIX), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, F, SUP * chunk), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, SUP)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel,
        chunk=chunk,
        n_channels=n_channels,
        tiles_w=tiles_w,
        tiles_per_image=tiles_per_image,
        width=width,
        height=height,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, D, N_PIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, N_PIX), jnp.float32),
        ],
        interpret=_interpret(),
    )(chunk_starts, n_chunks, isect_data)


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "n_channels", "tiles_w", "tiles_per_image",
        "width", "height", "n_tiles",
    ),
)
def _bwd_call(
    isect_data: jax.Array,  # [F, A]
    chunk_starts: jax.Array,
    n_chunks: jax.Array,
    v_pix: jax.Array,  # [T, D, 256]
    v_tfinal: jax.Array,  # [T, 1, 256]
    pix_out: jax.Array,  # [T, D, 256]
    t_final: jax.Array,  # [T, 1, 256]
    *,
    chunk: int,
    n_channels: int,
    tiles_w: int,
    tiles_per_image: int,
    width: int,
    height: int,
    n_tiles: int,
):
    F = isect_data.shape[0]
    D = n_channels
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, D, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, D, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, N_PIX), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, F, SUP * chunk), jnp.float32),
            pltpu.VMEM((2, F, SUP * chunk), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, SUP)),
            pltpu.SemaphoreType.DMA((2, SUP)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel,
        chunk=chunk,
        n_channels=n_channels,
        tiles_w=tiles_w,
        tiles_per_image=tiles_per_image,
        width=width,
        height=height,
    )
    # No zero-init of v_isect is needed: every aligned slot inside a tile's
    # chunk span is written by the backward loop (padding rows compute to
    # exact zeros since their opacity is 0), and slots beyond the last
    # tile's span sort to the sentinel tail of the reduction.
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(isect_data.shape, jnp.float32)],
        interpret=_interpret(),
    )(chunk_starts, n_chunks, isect_data, v_pix, v_tfinal, pix_out, t_final)
