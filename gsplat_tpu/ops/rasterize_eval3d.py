"""rasterize_to_pixels_eval3d: differentiable ray-based 3D rasterization.

Public analog of gsplat/cuda/_wrapper.py:rasterize_to_pixels_eval3d — the
3DGUT "MixedBatch" renderer that evaluates each gaussian's response in 3D
world space along per-pixel rays (supports distorted cameras via rays from
any sensor model, hit-distance output channels, and composited normals).

Architecture: same gather-free pipeline as the conic path
(ops/rasterize.py) — emission plan from the projected radii (the projection,
UT or EWA, is used ONLY for tiling/sorting) — with the eval3d Pallas kernels
(ops/rasterize_eval3d_pallas.py) compositing from world-space gaussian
parameters. The world->whitened transform M = diag(1/s) R^T is built in
plain jnp OUTSIDE the custom_vjp, so quats/scales gradients flow by
autodiff; the custom_vjp boundary carries (xyz, M, scale, colors, opacity,
rays).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gather_pallas import CH
from .math import quat_to_rotmat
from .rasterize import (
    DEFAULT_CHUNK,
    TILE,
    _round_up,
    expand_sort_align,
    make_emission_plan,
    reduce_slot_grads,
    tile_image,
    untile_image,
)
from .rasterize_eval3d_pallas import (
    _bwd_call_eval3d,
    _field_layout,
    _fwd_call_eval3d,
)
from .rasterize_eval3d_ref import iscl_rot_from_quat_scale


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18, 19, 20)
)
def _rasterize_eval3d_core(
    xyzf,  # [E, 3]
    Mf,  # [E, 9]
    sclf,  # [E, 3]
    clf,  # [E, D]
    nrf,  # [E, 3] unit normals (zeros when unused)
    opf,  # [E]
    rays_t,  # [T, 6, 256]
    depthf,  # [E] (sort key; no gradient)
    cnt, cum_ex, cum_in, rect_rows,
    win_starts, n_slots_arr,
    cap_total: int,
    n_channels: int,
    tile_width: int,
    tile_height: int,
    n_images: int,
    use_hit_distance: bool,
    return_normals: bool,
):
    out, _ = _core_e3d_fwd(
        xyzf, Mf, sclf, clf, nrf, opf, rays_t, depthf, cnt, cum_ex, cum_in,
        rect_rows, win_starts, n_slots_arr, cap_total, n_channels,
        tile_width, tile_height, n_images, use_hit_distance, return_normals,
    )
    return out


def _core_e3d_fwd(
    xyzf, Mf, sclf, clf, nrf, opf, rays_t, depthf, cnt, cum_ex, cum_in,
    rect_rows, win_starts, n_slots_arr, cap_total, n_channels,
    tile_width, tile_height, n_images, use_hit_distance, return_normals,
):
    D = n_channels

    ok = cnt > 0  # sanitize culled fields
    xyzf = jnp.where(ok[:, None], xyzf, 0.0)
    Mf = jnp.where(ok[:, None], Mf, 0.0)
    sclf = jnp.where(ok[:, None], sclf, 1.0)
    clf = jnp.where(ok[:, None], clf, 0.0)
    nrf = jnp.where(ok[:, None], nrf, 0.0)
    opf = jnp.where(ok, opf, 0.0)
    depthf = jnp.where(ok, depthf, 0.0)

    field_rows = [xyzf[:, i] for i in range(3)] + [
        Mf[:, i] for i in range(9)
    ] + [opf]
    if use_hit_distance:
        field_rows += [sclf[:, i] for i in range(3)]
    field_rows += [clf[:, i] for i in range(D)]
    if return_normals:
        field_rows += [nrf[:, i] for i in range(3)]

    aligned, ids_aligned, wl = expand_sort_align(
        field_rows, depthf, cnt, cum_ex, cum_in, rect_rows,
        win_starts, n_slots_arr, cap_total, tile_width, tile_height,
        n_images,
    )

    n_tiles = n_images * tile_width * tile_height
    pix_out, t_final = _fwd_call_eval3d(
        aligned, rays_t, wl.chunk_starts, wl.n_chunks,
        chunk=DEFAULT_CHUNK, n_channels=D, n_tiles=n_tiles,
        use_hit_distance=use_hit_distance, return_normals=return_normals,
    )
    res = (
        aligned, rays_t, ids_aligned, wl.valid, wl.chunk_starts, wl.n_chunks,
        cnt, cum_ex, n_slots_arr, pix_out, t_final,
    )
    return (pix_out, t_final), res


def _core_e3d_bwd(
    cap_total, n_channels, tile_width, tile_height, n_images,
    use_hit_distance, return_normals, res, cts,
):
    (
        aligned, rays_t, ids_aligned, valid, chunk_starts, n_chunks,
        cnt, cum_ex, n_slots_arr, pix_out, t_final,
    ) = res
    v_pix, v_tfinal = cts
    D = n_channels
    E = cnt.shape[0]
    T = n_images * tile_width * tile_height

    v_aligned, v_rays_t = _bwd_call_eval3d(
        aligned, rays_t, chunk_starts, n_chunks, v_pix, v_tfinal,
        pix_out, t_final,
        chunk=DEFAULT_CHUNK, n_channels=D, n_tiles=T,
        use_hit_distance=use_hit_distance, return_normals=return_normals,
    )

    F, color0, normal0, scale0 = _field_layout(
        D, use_hit_distance, return_normals
    )
    v_gauss = reduce_slot_grads(
        v_aligned, F, ids_aligned, valid, cnt, cum_ex, n_slots_arr[0], E
    )

    v_xyz = v_gauss[:, 0:3]
    v_M = v_gauss[:, 3:12]
    v_op = v_gauss[:, 12]
    if use_hit_distance:
        v_scl = v_gauss[:, scale0 : scale0 + 3]
    else:
        v_scl = jnp.zeros((E, 3), v_xyz.dtype)
    v_cl = v_gauss[:, color0 : color0 + D]
    if return_normals:
        v_nr = v_gauss[:, normal0 : normal0 + 3]
    else:
        v_nr = jnp.zeros((E, 3), v_xyz.dtype)

    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    zero_depth = jnp.zeros((E,), v_xyz.dtype)
    return (
        v_xyz, v_M, v_scl, v_cl, v_nr, v_op, v_rays_t, zero_depth,
        f0(cnt), f0(cum_ex), f0(cum_ex), f0(jnp.zeros((4, E), jnp.int32)),
        f0(jnp.zeros((cap_total // CH,), jnp.int32)),
        f0(jnp.zeros((1,), jnp.int32)),
    )


_rasterize_eval3d_core.defvjp(_core_e3d_fwd, _core_e3d_bwd)


def rasterize_to_pixels_eval3d(
    means: jax.Array,  # [N, 3] world
    quats: jax.Array,  # [N, 4] wxyz
    scales: jax.Array,  # [N, 3] (post-activation, > 0)
    colors: jax.Array,  # [I, N, D]
    opacities: jax.Array,  # [I, N]
    rays: jax.Array,  # [I, H, W, 6] world-space (origin, direction)
    image_width: int,
    image_height: int,
    radii: jax.Array,  # [I, N, 2] int32 (tiling, from UT/EWA projection)
    depths: jax.Array,  # [I, N] (sort keys)
    means2d: jax.Array,  # [I, N, 2] projected centers (tiling only)
    isect_capacity: int,
    backgrounds: Optional[jax.Array] = None,  # [I, D]
    tile_size: int = TILE,
    use_hit_distance: bool = False,
    return_normals: bool = False,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array], Dict[str, Any]]:
    """Render (colors [I,H,W,D], alphas [I,H,W,1], normals [I,H,W,3]|None,
    aux) by evaluating gaussians in 3D along per-pixel rays.

    Parity: gsplat/cuda/_wrapper.py:rasterize_to_pixels_eval3d over
    RasterizeToPixelsFromWorld3DGSSerialBatchFwd.cu; oracle:
    ops/rasterize_eval3d_ref.py.
    """
    assert tile_size == TILE
    I, N = colors.shape[0], colors.shape[1]
    E = I * N
    D = colors.shape[-1]
    th = -(-image_height // tile_size)
    tw = -(-image_width // tile_size)
    cap_total = _round_up(isect_capacity + E, CH)

    plan = make_emission_plan(means2d, radii, tile_size, tw, th, cap_total)
    rect_rows = jnp.stack([plan.tminx, plan.tminy, plan.w_rect, plan.im])

    M = iscl_rot_from_quat_scale(quats, scales)  # [N, 3, 3] differentiable
    if return_normals:
        normals = quat_to_rotmat(quats)[..., :, 2]  # [N, 3]
    else:
        normals = jnp.zeros((N, 3), means.dtype)

    bc = lambda x: jnp.broadcast_to(x[None], (I,) + x.shape)
    xyzf = bc(means).reshape(E, 3)
    Mf = bc(M.reshape(N, 9)).reshape(E, 9)
    sclf = bc(scales).reshape(E, 3)
    nrf = bc(normals).reshape(E, 3)

    rays_t = tile_image(rays, tile_size)  # [T, 6, 256]

    pix_out, t_final = _rasterize_eval3d_core(
        xyzf, Mf, sclf,
        colors.reshape(E, D),
        nrf,
        opacities.reshape(E),
        rays_t,
        jax.lax.stop_gradient(depths).reshape(E),
        plan.cnt, plan.cum_ex, plan.cum_in, rect_rows,
        plan.win_starts, plan.n_slots.reshape(1),
        cap_total, D, tw, th, I, use_hit_distance, return_normals,
    )

    full = untile_image(pix_out, I, th, tw, image_height, image_width)
    t_img = untile_image(t_final, I, th, tw, image_height, image_width)
    render = full[..., :D]
    render_n = full[..., D : D + 3] if return_normals else None
    alphas = 1.0 - t_img
    if backgrounds is not None:
        render = render + t_img * backgrounds[:, None, None, :]

    aux = {
        "n_isects": plan.n_isects,
        "isect_overflow": plan.overflow,
        "tiles_per_gauss": plan.cnt.reshape(I, N),
    }
    return render, alphas, render_n, aux
