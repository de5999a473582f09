"""rasterize_to_pixels_2dgs: the differentiable surfel rasterization op.

Public analog of gsplat/cuda/_wrapper.py:rasterize_to_pixels_2dgs (:2758)
with a jax.custom_vjp pairing the 2DGS Pallas kernels
(ops/rasterize2d_pallas.py) over the same gather-free pipeline as the 3DGS
path (ops/rasterize.py:expand_sort_align / reduce_slot_grads).

Outputs: colors, alphas, normals, distortion, median depth. The `densify`
screen-gradient carrier mirrors the reference's dummy tensor whose gradient
drives DefaultStrategy(key_for_gradient="gradient_2dgs"):
v_densify = (v_uM.z * wM.z, v_vM.z * wM.z) summed per gaussian
(RasterizeToPixels2DGSSerialBatchBwd.cu:628).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rasterize import (
    DEFAULT_CHUNK,
    TILE,
    expand_sort_align,
    make_emission_plan,
    reduce_slot_grads,
    tile_image,
    untile_image,
    _round_up,
)
from .gather_pallas import CH
from .rasterize2d_pallas import _bwd_call_2dgs, _fwd_call_2dgs


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18)
)
def _rasterize2d_core(
    m2f,  # [E, 2]
    mMf,  # [E, 9] ray transform rows (u, v, w)
    clf,  # [E, D]
    nrf,  # [E, 3] normals
    opf,  # [E]
    densify,  # [E, 2] screen-grad carrier
    depthf,  # [E]
    cnt, cum_ex, cum_in, rect_rows,
    win_starts, n_slots_arr,
    cap_total: int,
    n_channels: int,
    tile_width: int,
    tile_height: int,
    n_images: int,
    image_size: Tuple[int, int],
):
    out, _ = _core2d_fwd(
        m2f, mMf, clf, nrf, opf, densify, depthf, cnt, cum_ex, cum_in,
        rect_rows, win_starts, n_slots_arr, cap_total, n_channels,
        tile_width, tile_height, n_images, image_size,
    )
    return out


def _core2d_fwd(
    m2f, mMf, clf, nrf, opf, densify, depthf, cnt, cum_ex, cum_in,
    rect_rows, win_starts, n_slots_arr, cap_total, n_channels,
    tile_width, tile_height, n_images, image_size,
):
    width, height = image_size
    D = n_channels

    ok = cnt > 0  # sanitize culled fields (see rasterize.py:_core_fwd)
    m2f = jnp.where(ok[:, None], m2f, 0.0)
    mMf = jnp.where(ok[:, None], mMf, 0.0)
    clf = jnp.where(ok[:, None], clf, 0.0)
    nrf = jnp.where(ok[:, None], nrf, 0.0)
    opf = jnp.where(ok, opf, 0.0)
    depthf = jnp.where(ok, depthf, 0.0)

    field_rows = (
        [m2f[:, 0], m2f[:, 1]]
        + [mMf[:, i] for i in range(9)]
        + [opf]
        + [clf[:, i] for i in range(D)]
        + [nrf[:, i] for i in range(3)]
    )  # 15 + D rows
    aligned, ids_aligned, wl = expand_sort_align(
        field_rows, depthf, cnt, cum_ex, cum_in, rect_rows,
        win_starts, n_slots_arr, cap_total, tile_width, tile_height,
        n_images,
    )

    pix_out, t_final = _fwd_call_2dgs(
        aligned, wl.chunk_starts, wl.n_chunks,
        chunk=DEFAULT_CHUNK, n_channels=D, tiles_w=tile_width,
        tiles_per_image=tile_width * tile_height, width=width,
        height=height, n_tiles=n_images * tile_width * tile_height,
    )
    res = (
        aligned, ids_aligned, wl.valid, wl.chunk_starts, wl.n_chunks,
        cnt, cum_ex, n_slots_arr, pix_out, t_final, mMf,
    )
    return (pix_out, t_final), res


def _core2d_bwd(
    cap_total, n_channels, tile_width, tile_height, n_images, image_size,
    res, cts,
):
    (
        aligned, ids_aligned, valid, chunk_starts, n_chunks,
        cnt, cum_ex, n_slots_arr, pix_out, t_final, mMf,
    ) = res
    v_pix, v_tfinal = cts
    width, height = image_size
    D = n_channels
    E = cnt.shape[0]
    T = n_images * tile_width * tile_height

    (v_aligned,) = _bwd_call_2dgs(
        aligned, chunk_starts, n_chunks, v_pix, v_tfinal, pix_out, t_final,
        chunk=DEFAULT_CHUNK, n_channels=D, tiles_w=tile_width,
        tiles_per_image=tile_width * tile_height, width=width,
        height=height, n_tiles=T,
    )  # [F_s, A]; rows 0..14+D live

    R = 15 + D
    v_gauss = reduce_slot_grads(
        v_aligned, R, ids_aligned, valid, cnt, cum_ex, n_slots_arr[0], E
    )

    v_m2 = v_gauss[:, 0:2]
    v_M = v_gauss[:, 2:11]
    v_op = v_gauss[:, 11]
    v_cl = v_gauss[:, 12 : 12 + D]
    v_nr = v_gauss[:, 12 + D : 15 + D]
    # densify screen-grad proxy (Bwd.cu:628): (v_uM.z wM.z, v_vM.z wM.z)
    v_densify = jnp.stack(
        [v_M[:, 2] * mMf[:, 8], v_M[:, 5] * mMf[:, 8]], axis=1
    )

    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    zero_depth = jnp.zeros((E,), v_m2.dtype)
    return (
        v_m2, v_M, v_cl, v_nr, v_op, v_densify, zero_depth,
        f0(cnt), f0(cum_ex), f0(cum_ex), f0(jnp.zeros((4, E), jnp.int32)),
        f0(jnp.zeros((cap_total // CH,), jnp.int32)),
        f0(jnp.zeros((1,), jnp.int32)),
    )


_rasterize2d_core.defvjp(_core2d_fwd, _core2d_bwd)


def rasterize_to_pixels_2dgs(
    means2d: jax.Array,  # [I, N, 2]
    ray_transforms: jax.Array,  # [I, N, 3, 3]
    colors: jax.Array,  # [I, N, D] (depth appended as last channel for
    #                      distortion/median, matching the reference trainer)
    normals: jax.Array,  # [I, N, 3]
    opacities: jax.Array,  # [I, N]
    image_width: int,
    image_height: int,
    radii: jax.Array,  # [I, N, 2] int32
    depths: jax.Array,  # [I, N]
    isect_capacity: int,
    backgrounds: Optional[jax.Array] = None,  # [I, D]
    tile_size: int = TILE,
    densify: Optional[jax.Array] = None,  # [I, N, 2] grad carrier
) -> Tuple[jax.Array, ...]:
    """Rasterize surfels; returns (colors [I,H,W,D], alphas, normals,
    distort, median) images + aux dict.

    Parity: gsplat/cuda/_wrapper.py:rasterize_to_pixels_2dgs (:2758).
    """
    assert tile_size == TILE
    I, N = means2d.shape[0], means2d.shape[1]
    E = I * N
    D = colors.shape[-1]
    th = -(-image_height // tile_size)
    tw = -(-image_width // tile_size)
    cap_total = _round_up(isect_capacity + E, CH)

    plan = make_emission_plan(means2d, radii, tile_size, tw, th, cap_total)
    rect_rows = jnp.stack([plan.tminx, plan.tminy, plan.w_rect, plan.im])

    if densify is None:
        densify = jnp.zeros((I, N, 2), means2d.dtype)

    pix_out, t_final = _rasterize2d_core(
        means2d.reshape(E, 2),
        ray_transforms.reshape(E, 9),
        colors.reshape(E, D),
        normals.reshape(E, 3),
        opacities.reshape(E),
        densify.reshape(E, 2),
        jax.lax.stop_gradient(depths).reshape(E),
        plan.cnt, plan.cum_ex, plan.cum_in, rect_rows,
        plan.win_starts, plan.n_slots.reshape(1),
        cap_total, D, tw, th, I, (image_width, image_height),
    )

    full = untile_image(pix_out, I, th, tw, image_height, image_width)
    t_img = untile_image(t_final, I, th, tw, image_height, image_width)
    render = full[..., :D]
    render_n = full[..., D : D + 3]
    distort = full[..., D + 3 : D + 4]
    median = full[..., D + 4 : D + 5]
    alphas = 1.0 - t_img
    if backgrounds is not None:
        render = render + t_img * backgrounds[:, None, None, :]

    aux = {
        "n_isects": plan.n_isects,
        "isect_overflow": plan.overflow,
        "tiles_per_gauss": plan.cnt.reshape(I, N),
    }
    return render, alphas, render_n, distort, median, aux
