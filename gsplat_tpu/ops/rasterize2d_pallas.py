"""Pallas TPU 2DGS (surfel) rasterization kernels: fwd/bwd.

Same chunked-DMA / associative-compositing architecture as the 3DGS kernels
(rasterize_pallas.py) with the surfel response in place of the conic:

  h_u = px * w_M - u_M;  h_v = py * w_M - v_M;  c = h_u x h_v
  sigma = 0.5 * min((c.x^2 + c.y^2) / c.z^2, 2 |pix - mean2d|^2)

CUDA counterparts (semantics only):
RasterizeToPixels2DGSSerialBatch{Fwd,Bwd}.cu — including the extra per-pixel
outputs: composited normals, Mip-NeRF-360 distortion (running-sum form,
Fwd.cu:404-421), and median depth (entry transmittance > 0.5).

Backward notes:
  * the surfel response is rational in (px, py), so unlike the conic path
    there is no separable-moment shortcut: per-(pixel, slot) cotangents of
    the ray-transform rows are formed on the VPU (cross-product transposes
    v_hu = h_v x v_c, v_hv = v_c x h_u) and reduced over pixels.
  * the distortion gradient needs suffix sums over later contributions;
    the totals telescope to rendered quantities:
        sum_j gw_j w_j = 2 * v_dist * distort   (gw = d distort / d w)
    so a prefix accumulator + the forward outputs suffice (no extra pass).
  * the median-depth gradient routes v_median to the depth channel of the
    recorded median slot (index saved as a forward output row).

Field rows (input [F, A], n_render = 15 + D):
  0 x, 1 y, 2-4 u_M, 5-7 v_M, 8-10 w_M, 11 opacity,
  12..11+D colors (depth last), 12+D..14+D normals.
Output rows (pix_out [T, D+6, 256]):
  0..D-1 colors, D..D+2 normals, D+3 distort, D+4 median, D+5 median slot.
Backward emits per-slot gradients in the SAME field layout (rows 0..14+D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_THRESHOLD
from .rasterize_pallas import (
    CHUNK,
    N_PIX,
    _cumprod_lane,
    _cumsum_lane,
    _interpret,
    _shift_right_one,
    _tile_pixel_coords,
)

FILTER_INV_SQUARE_2DGS = 2.0


def _surfel_alpha(buf, px, py, n_channels):
    """Gated alphas (256, 128) + intermediates from a staged chunk (F, 128)."""
    mx, my = buf[0:1, :], buf[1:2, :]
    u = [buf[2 + i : 3 + i, :] for i in range(3)]
    v = [buf[5 + i : 6 + i, :] for i in range(3)]
    w = [buf[8 + i : 9 + i, :] for i in range(3)]
    op = buf[11:12, :]

    hu = [px * w[k] - u[k] for k in range(3)]  # (256, 128) x3
    hv = [py * w[k] - v[k] for k in range(3)]
    cx = hu[1] * hv[2] - hu[2] * hv[1]
    cy = hu[2] * hv[0] - hu[0] * hv[2]
    cz = hu[0] * hv[1] - hu[1] * hv[0]
    cz_safe = jnp.where(cz == 0.0, 1.0, cz)
    su = cx / cz_safe
    sv = cy / cz_safe
    sigma3 = su * su + sv * sv
    dx = mx - px
    dy = my - py
    sigma2 = FILTER_INV_SQUARE_2DGS * (dx * dx + dy * dy)
    use2d = sigma2 < sigma3
    sigma = 0.5 * jnp.where(use2d, sigma2, sigma3)
    vis = jnp.exp(-sigma)
    alpha_raw = op * vis
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    gate = (cz != 0.0) & (alpha >= ALPHA_THRESHOLD)
    alpha = jnp.where(gate, alpha, 0.0)
    aux = dict(
        hu=hu, hv=hv, cx=cx, cy=cy, cz=cz, cz_safe=cz_safe, su=su, sv=sv,
        use2d=use2d, dx=dx, dy=dy, vis=vis, alpha_raw=alpha_raw, gate=gate,
        sigma3=sigma3,
    )
    return alpha, aux


def _fwd_kernel(
    chunk_starts_ref, n_chunks_ref,
    isect_hbm,  # [F, A]
    pix_ref,  # (1, D+6, 256)
    tfinal_ref,  # (1, 1, 256)
    buf_ref,  # (2, F, 128)
    t_ref,  # (256, 1)
    b_ref,  # (256, 1)   running sum w*m (distortion B carry)
    d_ref,  # (256, 1)   running distortion
    med_ref,  # (256, 2)  [median value, median slot (as f32)]
    sem,
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

    px, py, _, _ = _tile_pixel_coords(t, tiles_w, tiles_per_image)
    in_image = (px <= width) & (py <= height)
    t_ref[:] = jnp.where(in_image, 1.0, 0.0)
    b_ref[:] = jnp.zeros_like(b_ref)
    d_ref[:] = jnp.zeros_like(d_ref)
    med_ref[:] = jnp.concatenate(
        [jnp.zeros((N_PIX, 1)), jnp.full((N_PIX, 1), -1.0)], axis=1
    )
    pix_ref[:] = jnp.zeros_like(pix_ref)

    def dma(slot, c):
        off = pl.multiple_of((start + c) * chunk, chunk)
        return pltpu.make_async_copy(
            isect_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
        )

    @pl.when(n_ch > 0)
    def _():
        dma(0, 0).start()

        def body(carry):
            c, _ = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_ch)
            def _():
                dma(1 - slot, c + 1).start()

            dma(slot, c).wait()
            buf = buf_ref[slot]

            alpha, aux = _surfel_alpha(buf, px, py, D)
            one_m = 1.0 - alpha
            cp_incl = _cumprod_lane(one_m)
            cp_excl = _shift_right_one(cp_incl, 1.0)
            t_prev = t_ref[:]
            contribute = (t_prev * cp_incl) > TRANSMITTANCE_THRESHOLD
            t_entry = t_prev * cp_excl
            w = alpha * t_entry * contribute  # (256, 128)

            # colors + normals: one matmul over D+3 contiguous rows
            ch = buf[12 : 12 + D + 3, :]
            acc = jax.lax.dot_general(
                ch, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (D+3, 256)
            pix_ref[0, 0 : D + 3] += acc

            # distortion (m = depth channel)
            m = buf[11 + D : 12 + D, :]  # (1, 128)
            wm = w * m
            A_i = 1.0 - t_entry
            B_i = b_ref[:] + (_cumsum_lane(wm) - wm)
            dist = 2.0 * w * (m * A_i - B_i)
            d_ref[:] += jnp.sum(dist, axis=1, keepdims=True)
            b_ref[:] += jnp.sum(wm, axis=1, keepdims=True)

            # median: last contributing slot with entry T > 0.5
            lanes = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
            mmask = contribute & aux["gate"] & (t_entry > 0.5)
            idx = jnp.max(jnp.where(mmask, lanes, -1), axis=1, keepdims=True)
            has = idx >= 0
            mval = jnp.sum(
                jnp.where(lanes == idx, m * jnp.ones_like(w), 0.0),
                axis=1, keepdims=True,
            )
            slot_f = (start + c).astype(jnp.float32) * chunk + idx.astype(
                jnp.float32
            )
            med_ref[:, 0:1] = jnp.where(has, mval, med_ref[:, 0:1])
            med_ref[:, 1:2] = jnp.where(has, slot_f, med_ref[:, 1:2])

            t_new = t_prev * jnp.min(
                jnp.where(contribute, cp_incl, 1.0), axis=1, keepdims=True
            )
            t_ref[:] = t_new
            return c + 1, jnp.max(t_new)

        def cond(carry):
            c, tmax = carry
            return (c < n_ch) & (tmax > TRANSMITTANCE_THRESHOLD)

        c_final, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(1.0))
        )

        @pl.when(c_final < n_ch)
        def _():
            dma(jax.lax.rem(c_final, 2), c_final).wait()

    pix_ref[0, D + 3 : D + 4] = jnp.transpose(d_ref[:], (1, 0))
    pix_ref[0, D + 4 : D + 5] = jnp.transpose(med_ref[:, 0:1], (1, 0))
    pix_ref[0, D + 5 : D + 6] = jnp.transpose(med_ref[:, 1:2], (1, 0))
    tfinal_ref[0] = jnp.transpose(t_ref[:], (1, 0))


def _bwd_kernel(
    chunk_starts_ref, n_chunks_ref,
    isect_hbm,  # [F, A]
    v_pix_ref,  # (1, D+6, 256) cotangents (median-slot row ignored)
    v_tfinal_ref,  # (1, 1, 256)
    pix_out_ref,  # (1, D+6, 256) forward outputs
    tfinal_fwd_ref,  # (1, 1, 256)
    v_isect_hbm,  # [F, A]
    buf_ref, vbuf_ref,  # (2, F, 128)
    t_ref,  # (256, 1)
    e_ref,  # (256, 1) prefix sum w_j d_j (channel chain)
    b_ref,  # (256, 1) prefix sum w_j m_j (distortion B)
    gww_ref,  # (256, 1) prefix sum gw_j w_j (distortion alpha chain)
    aw_ref,  # (256, 1) prefix sum of w (A_i)
    sem, osem,
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

    px, py, _, _ = _tile_pixel_coords(t, tiles_w, tiles_per_image)
    in_image = (px <= width) & (py <= height)
    t_ref[:] = jnp.where(in_image, 1.0, 0.0)
    e_ref[:] = jnp.zeros_like(e_ref)
    b_ref[:] = jnp.zeros_like(b_ref)
    gww_ref[:] = jnp.zeros_like(gww_ref)
    aw_ref[:] = jnp.zeros_like(aw_ref)

    v_ch = v_pix_ref[0, 0 : D + 3]  # (D+3, 256) colors+normals cotangent
    v_dist = jnp.transpose(v_pix_ref[0, D + 3 : D + 4], (1, 0))  # (256,1)
    v_med = jnp.transpose(v_pix_ref[0, D + 4 : D + 5], (1, 0))
    med_slot = jnp.transpose(pix_out_ref[0, D + 5 : D + 6], (1, 0))
    vt_col = jnp.transpose(v_tfinal_ref[0], (1, 0))
    t_fwd_col = jnp.transpose(tfinal_fwd_ref[0], (1, 0))
    distort_out = jnp.transpose(pix_out_ref[0, D + 3 : D + 4], (1, 0))
    sw_tot = 1.0 - t_fwd_col  # total contributing weight
    sm_tot = jnp.transpose(
        pix_out_ref[0, D - 1 : D], (1, 0)
    )  # depth channel total = sum w m
    dtot_col = jnp.transpose(
        jnp.sum(v_ch * pix_out_ref[0, 0 : D + 3], axis=0, keepdims=True),
        (1, 0),
    )
    vt_term = vt_col * t_fwd_col
    gww_tot = 2.0 * v_dist * distort_out  # telescoped suffix total

    def dma_in(slot, c):
        off = pl.multiple_of((start + c) * chunk, chunk)
        return pltpu.make_async_copy(
            isect_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
        )

    def dma_out(slot, c):
        off = pl.multiple_of((start + c) * chunk, chunk)
        return pltpu.make_async_copy(
            vbuf_ref.at[slot], v_isect_hbm.at[:, pl.ds(off, chunk)],
            osem.at[slot],
        )

    @pl.when(n_ch > 0)
    def _():
        dma_in(0, 0).start()

        def body(carry):
            c, _ = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_ch)
            def _():
                dma_in(1 - slot, c + 1).start()

            dma_in(slot, c).wait()

            @pl.when(c >= 2)
            def _():
                dma_out(slot, c - 2).wait()

            buf = buf_ref[slot]
            alpha, aux = _surfel_alpha(buf, px, py, D)
            one_m = 1.0 - alpha
            cp_incl = _cumprod_lane(one_m)
            cp_excl = _shift_right_one(cp_incl, 1.0)
            t_prev = t_ref[:]
            contribute = (t_prev * cp_incl) > TRANSMITTANCE_THRESHOLD
            t_entry = t_prev * cp_excl
            w = alpha * t_entry * contribute
            live = contribute & aux["gate"]
            m = buf[11 + D : 12 + D, :]
            ch = buf[12 : 12 + D + 3, :]

            # ---- channel (colors+normals+alpha) chain ----
            d = jax.lax.dot_general(
                v_ch, ch, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (256, 128)
            wd = w * d
            wd_cs = _cumsum_lane(wd)
            e_incl = e_ref[:] + wd_cs
            inv_om = 1.0 / one_m
            v_alpha = d * t_entry - (dtot_col - e_incl) * inv_om \
                - vt_term * inv_om

            # ---- distortion chain ----
            wm = w * m
            wm_cs = _cumsum_lane(wm)
            w_cs = _cumsum_lane(w)
            A_i = 1.0 - t_entry  # == prefix contributing weight
            B_i = b_ref[:] + (wm_cs - wm)
            sw_suf = sw_tot - (aw_ref[:] + w_cs)  # strictly after i
            sm_suf = sm_tot - (b_ref[:] + wm_cs)
            gw = v_dist * 2.0 * ((m * A_i - B_i) + sm_suf - m * sw_suf)
            gww_cs = _cumsum_lane(gw * w)
            gww_incl = gww_ref[:] + gww_cs
            v_alpha = v_alpha + gw * t_entry \
                - (gww_tot - gww_incl) * inv_om
            v_alpha = jnp.where(live, v_alpha, 0.0)

            # depth-channel extra gradients (distortion + median)
            v_m = v_dist * 2.0 * w * (A_i - sw_suf)
            lanes = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
            slot_f = (start + c).astype(jnp.float32) * chunk \
                + lanes.astype(jnp.float32)
            v_m = v_m + jnp.where(slot_f == med_slot, v_med, 0.0)
            v_m_row = jnp.sum(v_m, axis=0, keepdims=True)  # (1, 128)

            # ---- alpha -> sigma / opacity ----
            unclamped = aux["alpha_raw"] < MAX_ALPHA
            v_sigma = jnp.where(unclamped, -alpha * v_alpha, 0.0)
            v_op = jnp.sum(
                jnp.where(unclamped, aux["vis"] * v_alpha, 0.0),
                axis=0, keepdims=True,
            )

            # 2D branch: sigma = (dx^2 + dy^2); d/dmx = 2 dx
            v_s2 = jnp.where(aux["use2d"], v_sigma, 0.0)
            v_mx = jnp.sum(
                FILTER_INV_SQUARE_2DGS * v_s2 * aux["dx"],
                axis=0, keepdims=True,
            )
            v_my = jnp.sum(
                FILTER_INV_SQUARE_2DGS * v_s2 * aux["dy"],
                axis=0, keepdims=True,
            )

            # 3D branch: sigma3 = (cx^2 + cy^2) / cz^2
            v_s3 = jnp.where(aux["use2d"], 0.0, v_sigma) * 0.5
            czs = aux["cz_safe"]
            inv_cz2 = 1.0 / (czs * czs)
            v_cx = v_s3 * 2.0 * aux["cx"] * inv_cz2
            v_cy = v_s3 * 2.0 * aux["cy"] * inv_cz2
            v_cz = -v_s3 * 2.0 * aux["sigma3"] / czs
            # v_hu = h_v x v_c ; v_hv = v_c x h_u
            hu, hv = aux["hu"], aux["hv"]
            v_hu = [
                hv[1] * v_cz - hv[2] * v_cy,
                hv[2] * v_cx - hv[0] * v_cz,
                hv[0] * v_cy - hv[1] * v_cx,
            ]
            v_hv = [
                v_cy * hu[2] - v_cz * hu[1],
                v_cz * hu[0] - v_cx * hu[2],
                v_cx * hu[1] - v_cy * hu[0],
            ]
            # h_u = px w - u ; h_v = py w - v
            for k in range(3):
                vbuf_ref[slot, 2 + k : 3 + k, :] = -jnp.sum(
                    v_hu[k], axis=0, keepdims=True
                )
                vbuf_ref[slot, 5 + k : 6 + k, :] = -jnp.sum(
                    v_hv[k], axis=0, keepdims=True
                )
                vbuf_ref[slot, 8 + k : 9 + k, :] = jnp.sum(
                    px * v_hu[k] + py * v_hv[k], axis=0, keepdims=True
                )

            # colors+normals gradient: (D+3, 128) matmul
            v_chg = jax.lax.dot_general(
                v_ch, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            vbuf_ref[slot, 0:1, :] = v_mx
            vbuf_ref[slot, 1:2, :] = v_my
            vbuf_ref[slot, 11:12, :] = v_op
            vbuf_ref[slot, 12 : 12 + D + 3, :] = v_chg
            # depth channel extra grads
            vbuf_ref[slot, 11 + D : 12 + D, :] = (
                vbuf_ref[slot, 11 + D : 12 + D, :] + v_m_row
            )
            dma_out(slot, c).start()

            # update carries
            t_new = t_prev * jnp.min(
                jnp.where(contribute, cp_incl, 1.0), axis=1, keepdims=True
            )
            t_ref[:] = t_new
            # lane sums == last column of the inclusive cumsums (free)
            last = slice(CHUNK - 1, CHUNK)
            e_ref[:] = e_ref[:] + wd_cs[:, last]
            b_ref[:] = b_ref[:] + wm_cs[:, last]
            gww_ref[:] = gww_ref[:] + gww_cs[:, last]
            aw_ref[:] = aw_ref[:] + w_cs[:, last]
            return c + 1, jnp.max(t_new)

        def cond(carry):
            c, tmax = carry
            return (c < n_ch) & (tmax > TRANSMITTANCE_THRESHOLD)

        # early exit: saturated pixels yield exactly-zero grads downstream
        f, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1.0)))

        @pl.when(f < n_ch)
        def _():
            dma_in(jax.lax.rem(f, 2), f).wait()

        @pl.when(f >= 2)
        def _():
            dma_out(jax.lax.rem(f, 2), f - 2).wait()

        @pl.when(f >= 1)
        def _():
            dma_out(jax.lax.rem(f - 1, 2), f - 1).wait()

        @pl.when(f < n_ch)
        def _():
            vbuf_ref[0] = jnp.zeros_like(vbuf_ref[0])
            vbuf_ref[1] = jnp.zeros_like(vbuf_ref[1])

            def zbody(c, _):
                slot = jax.lax.rem(c, 2)

                @pl.when(c - 2 >= f)
                def _():
                    dma_out(slot, c - 2).wait()

                dma_out(slot, c).start()
                return ()

            jax.lax.fori_loop(f, n_ch, zbody, ())

            @pl.when(n_ch - 2 >= f)
            def _():
                dma_out(jax.lax.rem(n_ch, 2), n_ch - 2).wait()

            dma_out(jax.lax.rem(n_ch - 1, 2), n_ch - 1).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "n_channels", "tiles_w", "tiles_per_image",
        "width", "height", "n_tiles",
    ),
)
def _fwd_call_2dgs(
    isect_data, chunk_starts, n_chunks, *,
    chunk, n_channels, tiles_w, tiles_per_image, width, height, n_tiles,
):
    F = isect_data.shape[0]
    D = n_channels
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, D + 6, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, N_PIX), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, F, chunk), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, n_channels=n_channels, tiles_w=tiles_w,
        tiles_per_image=tiles_per_image, width=width, height=height,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, D + 6, N_PIX), jnp.float32),
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
def _bwd_call_2dgs(
    isect_data, chunk_starts, n_chunks, v_pix, v_tfinal, pix_out, t_final, *,
    chunk, n_channels, tiles_w, tiles_per_image, width, height, n_tiles,
):
    F = isect_data.shape[0]
    D = n_channels
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, D + 6, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, D + 6, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, N_PIX), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, F, chunk), jnp.float32),
            pltpu.VMEM((2, F, chunk), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, n_channels=n_channels, tiles_w=tiles_w,
        tiles_per_image=tiles_per_image, width=width, height=height,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(isect_data.shape, jnp.float32)],
        interpret=_interpret(),
    )(chunk_starts, n_chunks, isect_data, v_pix, v_tfinal, pix_out, t_final)
