"""Pallas TPU eval3d rasterization kernels: ray-based 3D gaussian response.

Same chunked-DMA / associative-compositing architecture as the 3DGS conic
kernels (rasterize_pallas.py) and the 2DGS surfel kernels
(rasterize2d_pallas.py), with the response evaluated in 3D world space from
per-pixel rays:

  u = M r_d;  u_hat = u/||u||;  g = M (r_o - x)     (M = diag(1/s) R^T)
  grayDist = ||u_hat x g||^2;  hit_t = -u_hat.g;  behind (hit_t<0) -> 0
  alpha = min(opacity * exp(-0.5 grayDist), MAX_ALPHA)

CUDA counterparts (semantics only): the MixedBatch serial renderer
RasterizeToPixelsFromWorld3DGSSerialBatchFwd.cu and its device response in
RasterizeToPixelsFromWorld3DGS.cuh; torch oracle
_torch_impl_eval3d.py:accumulate_eval3d. Optional features match the CUDA
kernel: the last channel can be replaced by the hit distance
(use_hit_distance), and per-pixel-flipped gaussian normals can be
composited as three extra output channels (return_normals).

Per-pixel rays arrive as a tiled [n_tiles, 6, 256] block input; the
backward emits per-slot field gradients [F, A] (reduced outside, no
atomics) plus per-pixel ray gradients [n_tiles, 6, 256] (the reference's
"per-ray inputs w/ gradients", SURVEY N18).

Field rows (input [F, A]):
  0-2 xyz, 3-11 M row-major, 12 opacity,
  [13-15 scale   -- only when use_hit_distance]
  then D color rows (hit-distance channel last when enabled),
  [then 3 normal rows -- only when return_normals].
Output rows (pix [T, D + 3*return_normals, 256]).
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
)


def _field_layout(n_channels: int, use_hit_distance: bool, return_normals: bool):
    """(F, color_row0, normal_row0|None, scale_row0|None)."""
    scale0 = 13 if use_hit_distance else None
    color0 = 16 if use_hit_distance else 13
    normal0 = color0 + n_channels if return_normals else None
    F = color0 + n_channels + (3 if return_normals else 0)
    return F, color0, normal0, scale0


def _ray_cols(rays_ref):
    """Six (256, 1) columns from the (1, 6, 256) tile ray block."""
    r = rays_ref[0]  # (6, 256)
    return [jnp.transpose(r[k : k + 1, :], (1, 0)) for k in range(6)]


def _eval3d_alpha(buf, rays, *, use_hit_distance: bool):
    """Gated alphas (256, L) + intermediates from a staged chunk (F, L)."""
    X = [buf[i : i + 1, :] for i in range(3)]  # (1, L)
    m = [buf[3 + i : 4 + i, :] for i in range(9)]
    op = buf[12:13, :]
    rox, roy, roz, rdx, rdy, rdz = rays  # (256, 1)

    u = [
        m[0] * rdx + m[1] * rdy + m[2] * rdz,
        m[3] * rdx + m[4] * rdy + m[5] * rdz,
        m[6] * rdx + m[7] * rdy + m[8] * rdz,
    ]  # (256, L)
    mx = [
        m[0] * X[0] + m[1] * X[1] + m[2] * X[2],
        m[3] * X[0] + m[4] * X[1] + m[5] * X[2],
        m[6] * X[0] + m[7] * X[1] + m[8] * X[2],
    ]  # (1, L)
    g = [
        m[0] * rox + m[1] * roy + m[2] * roz - mx[0],
        m[3] * rox + m[4] * roy + m[5] * roz - mx[1],
        m[6] * rox + m[7] * roy + m[8] * roz - mx[2],
    ]  # (256, L)

    un2 = u[0] * u[0] + u[1] * u[1] + u[2] * u[2]
    inv_un = jax.lax.rsqrt(jnp.maximum(un2, 1e-24))
    uh = [u[k] * inv_un for k in range(3)]
    c = [
        uh[1] * g[2] - uh[2] * g[1],
        uh[2] * g[0] - uh[0] * g[2],
        uh[0] * g[1] - uh[1] * g[0],
    ]
    gray = c[0] * c[0] + c[1] * c[1] + c[2] * c[2]
    hit_t = -(uh[0] * g[0] + uh[1] * g[1] + uh[2] * g[2])
    vis = jnp.exp(-0.5 * gray)
    alpha_raw = op * vis
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    gate = (hit_t >= 0.0) & (alpha >= ALPHA_THRESHOLD)
    alpha = jnp.where(gate, alpha, 0.0)

    hd = None
    q = None
    if use_hit_distance:
        s = [buf[13 + k : 14 + k, :] for k in range(3)]
        b = [s[k] * uh[k] for k in range(3)]
        q = jnp.sqrt(jnp.maximum(b[0] * b[0] + b[1] * b[1] + b[2] * b[2], 1e-24))
        hd = hit_t * q

    aux = dict(
        u=u, g=g, uh=uh, c=c, inv_un=inv_un, gray=gray, hit_t=hit_t,
        vis=vis, alpha_raw=alpha_raw, gate=gate, m=m, hd=hd, q=q,
    )
    return alpha, aux


def _fwd_kernel(
    chunk_starts_ref, n_chunks_ref,
    isect_hbm,  # [F, A]
    rays_ref,  # (1, 6, 256)
    pix_ref,  # (1, D_out, 256)
    tfinal_ref,  # (1, 1, 256)
    buf_ref,  # (2, F, 128)
    t_ref,  # (256, 1)
    sem,
    *,
    chunk: int,
    n_channels: int,
    use_hit_distance: bool,
    return_normals: bool,
):
    t = pl.program_id(0)
    start = chunk_starts_ref[t]
    n_ch = n_chunks_ref[t]
    D = n_channels
    F, color0, normal0, _ = _field_layout(D, use_hit_distance, return_normals)

    rays = _ray_cols(rays_ref)
    # rays for out-of-image pixels are zero (ray_d = 0): their alphas gate
    # to 0 via hit_t/grayDist, but T must start at 0 there so alpha = 1 - T
    # reads 0. In-image pixels have |ray_d| ~ 1.
    rd_ok = (
        rays[3] * rays[3] + rays[4] * rays[4] + rays[5] * rays[5]
    ) > 1e-12
    t_ref[:] = jnp.where(rd_ok, 1.0, 0.0)
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

            alpha, aux = _eval3d_alpha(
                buf, rays, use_hit_distance=use_hit_distance
            )
            one_m = 1.0 - alpha
            cp_incl = _cumprod_lane(one_m)
            cp_excl = _shift_right_one(cp_incl, 1.0)
            t_prev = t_ref[:]
            contribute = (t_prev * cp_incl) > TRANSMITTANCE_THRESHOLD
            t_entry = t_prev * cp_excl
            w = alpha * t_entry * contribute  # (256, 128)

            # static color rows: one matmul (exclude the hit channel)
            D_mat = D - 1 if use_hit_distance else D
            if D_mat > 0:
                ch = buf[color0 : color0 + D_mat, :]
                acc = jax.lax.dot_general(
                    ch, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (D_mat, 256)
                pix_ref[0, 0:D_mat] += acc
            if use_hit_distance:
                hrow = jnp.sum(w * aux["hd"], axis=1, keepdims=True)  # (256,1)
                pix_ref[0, D - 1 : D] += jnp.transpose(hrow, (1, 0))
            if return_normals:
                ndot = (
                    buf[normal0 : normal0 + 1, :] * rays[3]
                    + buf[normal0 + 1 : normal0 + 2, :] * rays[4]
                    + buf[normal0 + 2 : normal0 + 3, :] * rays[5]
                )
                sgn = jnp.where(ndot > 0.0, -1.0, 1.0)
                ws = w * sgn
                for k in range(3):
                    nk = buf[normal0 + k : normal0 + k + 1, :]
                    row = jnp.sum(ws * nk, axis=1, keepdims=True)
                    pix_ref[0, D + k : D + k + 1] += jnp.transpose(row, (1, 0))

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

    tfinal_ref[0] = jnp.transpose(t_ref[:], (1, 0))


def _bwd_kernel(
    chunk_starts_ref, n_chunks_ref,
    isect_hbm,  # [F, A]
    rays_ref,  # (1, 6, 256)
    v_pix_ref,  # (1, D_out, 256)
    v_tfinal_ref,  # (1, 1, 256)
    pix_out_ref,  # (1, D_out, 256)
    tfinal_fwd_ref,  # (1, 1, 256)
    v_isect_hbm,  # [F, A]
    v_rays_ref,  # (1, 6, 256) output
    buf_ref, vbuf_ref,  # (2, F, 128)
    t_ref,  # (256, 1)
    e_ref,  # (256, 1) prefix sum w_j d_j
    vray_ref,  # (256, 8) per-pixel ray grads (6 used; padded to 8)
    sem, osem,
    *,
    chunk: int,
    n_channels: int,
    use_hit_distance: bool,
    return_normals: bool,
):
    t = pl.program_id(0)
    start = chunk_starts_ref[t]
    n_ch = n_chunks_ref[t]
    D = n_channels
    F, color0, normal0, scale0 = _field_layout(
        D, use_hit_distance, return_normals
    )
    D_out = D + (3 if return_normals else 0)
    D_mat = D - 1 if use_hit_distance else D

    rays = _ray_cols(rays_ref)
    rd_ok = (
        rays[3] * rays[3] + rays[4] * rays[4] + rays[5] * rays[5]
    ) > 1e-12
    t_ref[:] = jnp.where(rd_ok, 1.0, 0.0)
    e_ref[:] = jnp.zeros_like(e_ref)
    vray_ref[:] = jnp.zeros_like(vray_ref)

    v_ch = v_pix_ref[0]  # (D_out, 256)
    vt_col = jnp.transpose(v_tfinal_ref[0], (1, 0))  # (256, 1)
    t_fwd_col = jnp.transpose(tfinal_fwd_ref[0], (1, 0))
    dtot_col = jnp.transpose(
        jnp.sum(v_ch * pix_out_ref[0], axis=0, keepdims=True), (1, 0)
    )  # (256, 1)
    vt_term = vt_col * t_fwd_col
    v_hit_col = (
        jnp.transpose(v_ch[D - 1 : D, :], (1, 0)) if use_hit_distance else None
    )
    v_n_cols = (
        [jnp.transpose(v_ch[D + k : D + k + 1, :], (1, 0)) for k in range(3)]
        if return_normals
        else None
    )

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
            alpha, aux = _eval3d_alpha(
                buf, rays, use_hit_distance=use_hit_distance
            )
            one_m = 1.0 - alpha
            cp_incl = _cumprod_lane(one_m)
            cp_excl = _shift_right_one(cp_incl, 1.0)
            t_prev = t_ref[:]
            contribute = (t_prev * cp_incl) > TRANSMITTANCE_THRESHOLD
            t_entry = t_prev * cp_excl
            w = alpha * t_entry * contribute
            live = contribute & aux["gate"]

            # ---- channel chain: d = sum_k v_ch_k * val_k ----
            if D_mat > 0:
                ch = buf[color0 : color0 + D_mat, :]
                d = jax.lax.dot_general(
                    v_ch[0:D_mat], ch, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (256, 128)
            else:
                d = jnp.zeros_like(w)
            if use_hit_distance:
                d = d + v_hit_col * aux["hd"]
            sgn = None
            if return_normals:
                ndot = (
                    buf[normal0 : normal0 + 1, :] * rays[3]
                    + buf[normal0 + 1 : normal0 + 2, :] * rays[4]
                    + buf[normal0 + 2 : normal0 + 3, :] * rays[5]
                )
                sgn = jnp.where(ndot > 0.0, -1.0, 1.0)
                for k in range(3):
                    nk = buf[normal0 + k : normal0 + k + 1, :]
                    d = d + v_n_cols[k] * (sgn * nk)

            wd = w * d
            wd_cs = _cumsum_lane(wd)
            e_incl = e_ref[:] + wd_cs
            inv_om = 1.0 / one_m
            v_alpha = (
                d * t_entry
                - (dtot_col - e_incl) * inv_om
                - vt_term * inv_om
            )
            v_alpha = jnp.where(live, v_alpha, 0.0)

            # ---- alpha -> response ----
            unclamped = aux["alpha_raw"] < MAX_ALPHA
            # sigma = 0.5*gray; vis = exp(-sigma); alpha = op*vis
            v_sigma = jnp.where(unclamped, -alpha * v_alpha, 0.0)
            v_op_row = jnp.sum(
                jnp.where(unclamped & live, aux["vis"] * v_alpha, 0.0),
                axis=0, keepdims=True,
            )  # (1, 128)

            uh, g, cx = aux["uh"], aux["g"], aux["c"]
            # v_c_k = v_sigma * c_k   (sigma = 0.5 * sum c^2)
            v_c = [v_sigma * cx[k] for k in range(3)]
            # c = uh x g  =>  v_uh = g x v_c ; v_g = v_c x uh
            v_uh = [
                g[1] * v_c[2] - g[2] * v_c[1],
                g[2] * v_c[0] - g[0] * v_c[2],
                g[0] * v_c[1] - g[1] * v_c[0],
            ]
            v_g = [
                v_c[1] * uh[2] - v_c[2] * uh[1],
                v_c[2] * uh[0] - v_c[0] * uh[2],
                v_c[0] * uh[1] - v_c[1] * uh[0],
            ]

            v_hit = jnp.zeros_like(w)
            if use_hit_distance:
                # hd = hit_t * q; q = ||s * uh||; only where live
                v_hd = jnp.where(live, w * v_hit_col, 0.0)
                v_hit = v_hd * aux["q"]
                v_q = v_hd * aux["hit_t"]
                inv_q = 1.0 / aux["q"]
                s = [buf[scale0 + k : scale0 + k + 1, :] for k in range(3)]
                b = [s[k] * uh[k] for k in range(3)]
                for k in range(3):
                    v_b = v_q * b[k] * inv_q
                    v_uh[k] = v_uh[k] + v_b * s[k]
                    vbuf_ref[slot, scale0 + k : scale0 + k + 1, :] = jnp.sum(
                        v_b * uh[k], axis=0, keepdims=True
                    )

            # hit_t = -(uh . g)
            for k in range(3):
                v_uh[k] = v_uh[k] - g[k] * v_hit
                v_g[k] = v_g[k] - uh[k] * v_hit

            # uh = u * inv_un (normalize)
            udotv = uh[0] * v_uh[0] + uh[1] * v_uh[1] + uh[2] * v_uh[2]
            v_u = [aux["inv_un"] * (v_uh[k] - uh[k] * udotv) for k in range(3)]

            # ---- reductions to per-slot field grads ----
            m = aux["m"]
            S = [jnp.sum(v_g[k], axis=0, keepdims=True) for k in range(3)]
            X = [buf[i : i + 1, :] for i in range(3)]
            for j in range(3):
                vbuf_ref[slot, j : j + 1, :] = -(
                    m[j] * S[0] + m[3 + j] * S[1] + m[6 + j] * S[2]
                )
            ro = rays[0:3]
            rd = rays[3:6]
            for k in range(3):
                for j in range(3):
                    vm = jnp.sum(
                        v_u[k] * rd[j] + v_g[k] * ro[j], axis=0, keepdims=True
                    ) - X[j] * S[k]
                    vbuf_ref[slot, 3 + 3 * k + j : 4 + 3 * k + j, :] = vm
            vbuf_ref[slot, 12:13, :] = v_op_row

            # colors
            if D_mat > 0:
                v_cl = jax.lax.dot_general(
                    v_ch[0:D_mat], w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (D_mat, 128)
                vbuf_ref[slot, color0 : color0 + D_mat, :] = v_cl
            if use_hit_distance:
                # the input hit channel is replaced by hd -> zero gradient
                vbuf_ref[slot, color0 + D - 1 : color0 + D, :] = (
                    jnp.zeros((1, chunk), jnp.float32)
                )
            if return_normals:
                ws = w * sgn
                for k in range(3):
                    vbuf_ref[slot, normal0 + k : normal0 + k + 1, :] = jnp.sum(
                        v_n_cols[k] * ws, axis=0, keepdims=True
                    )

            # per-pixel ray gradients: v_ro_j = sum_L sum_k m_kj v_g_k
            for j in range(3):
                vro = jnp.sum(
                    m[j] * v_g[0] + m[3 + j] * v_g[1] + m[6 + j] * v_g[2],
                    axis=1, keepdims=True,
                )
                vrd = jnp.sum(
                    m[j] * v_u[0] + m[3 + j] * v_u[1] + m[6 + j] * v_u[2],
                    axis=1, keepdims=True,
                )
                vray_ref[:, j : j + 1] += vro
                vray_ref[:, 3 + j : 4 + j] += vrd

            dma_out(slot, c).start()

            t_new = t_prev * jnp.min(
                jnp.where(contribute, cp_incl, 1.0), axis=1, keepdims=True
            )
            t_ref[:] = t_new
            e_ref[:] = e_ref[:] + wd_cs[:, CHUNK - 1 : CHUNK]
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

    v_rays_ref[0] = jnp.transpose(vray_ref[:, 0:6], (1, 0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "n_channels", "n_tiles", "use_hit_distance", "return_normals",
    ),
)
def _fwd_call_eval3d(
    isect_data, rays_t, chunk_starts, n_chunks, *,
    chunk, n_channels, n_tiles, use_hit_distance, return_normals,
):
    F = isect_data.shape[0]
    D_out = n_channels + (3 if return_normals else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 6, N_PIX), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, D_out, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, N_PIX), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, F, chunk), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, n_channels=n_channels,
        use_hit_distance=use_hit_distance, return_normals=return_normals,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, D_out, N_PIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, N_PIX), jnp.float32),
        ],
        interpret=_interpret(),
    )(chunk_starts, n_chunks, isect_data, rays_t)


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "n_channels", "n_tiles", "use_hit_distance", "return_normals",
    ),
)
def _bwd_call_eval3d(
    isect_data, rays_t, chunk_starts, n_chunks, v_pix, v_tfinal,
    pix_out, t_final, *,
    chunk, n_channels, n_tiles, use_hit_distance, return_normals,
):
    F = isect_data.shape[0]
    D_out = n_channels + (3 if return_normals else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 6, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, D_out, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, D_out, N_PIX), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, N_PIX), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 6, N_PIX), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, F, chunk), jnp.float32),
            pltpu.VMEM((2, F, chunk), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.VMEM((N_PIX, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, n_channels=n_channels,
        use_hit_distance=use_hit_distance, return_normals=return_normals,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(isect_data.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 6, N_PIX), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        chunk_starts, n_chunks, isect_data, rays_t, v_pix, v_tfinal,
        pix_out, t_final,
    )
