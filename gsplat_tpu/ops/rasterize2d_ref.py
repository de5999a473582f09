"""Pure-jnp 2DGS reference rasterizer (oracle; differentiable via autodiff).

Compositing semantics of gsplat/cuda/csrc/RasterizeToPixels2DGSSerialBatchFwd.cu
(:330-420) and the reference torch oracle (_torch_impl_2dgs.py:accumulate_2dgs):

  h_u = px * w_M - u_M;  h_v = py * w_M - v_M          (M rows u, v, w)
  s   = cross(h_u, h_v);  skipped when s.z == 0
  sigma = 0.5 * min(s.x^2 + s.y^2, 2 * |pix - mean2d|^2) (in (s/s.z) space)
  alpha = min(MAX_ALPHA, op * exp(-sigma)); gated at ALPHA_THRESHOLD
  front-to-back blending with exclusive saturation (T <= 1e-4)

Extra 2DGS outputs (same kernel source, :404-432):
  normals  — composited like 3 extra color channels
  distort  — Mip-NeRF-360 distortion: 2 * sum_i w_i (m_i A_i - B_i) with
             m = last color channel, A_i/B_i exclusive sums of w / w*m
  median   — depth (last channel) of the last contributing splat whose
             entry transmittance exceeds 0.5
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .projection import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_THRESHOLD

FILTER_INV_SQUARE_2DGS = 2.0


def rasterize_to_pixels_2dgs_ref(
    means2d: jax.Array,  # [I, N, 2]
    ray_transforms: jax.Array,  # [I, N, 3, 3]
    colors: jax.Array,  # [I, N, D] (depth in the last channel for distort)
    normals: jax.Array,  # [I, N, 3]
    opacities: jax.Array,  # [I, N]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jax.Array,  # [I, th, tw] int32
    flatten_ids: jax.Array,  # [P] int32
    n_isects: jax.Array,  # [] int32
    max_range: int,
    backgrounds: Optional[jax.Array] = None,  # [I, D]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (colors [I,H,W,D], alphas [I,H,W,1], normals [I,H,W,3],
    distort [I,H,W,1], median [I,H,W,1]). Oracle-sized memory only."""
    I, N = means2d.shape[0], means2d.shape[1]
    th, tw = isect_offsets.shape[-2], isect_offsets.shape[-1]
    D = colors.shape[-1]

    m2 = means2d.reshape(I * N, 2)
    M = ray_transforms.reshape(I * N, 3, 3)
    cl = colors.reshape(I * N, D)
    nr = normals.reshape(I * N, 3)
    op = opacities.reshape(I * N)

    ys = jnp.arange(image_height, dtype=jnp.int32)
    xs = jnp.arange(image_width, dtype=jnp.int32)
    ty = ys // tile_size
    tx = xs // tile_size

    offsets_flat = isect_offsets.reshape(I, th * tw)
    bounds = jnp.concatenate(
        [offsets_flat.reshape(-1), n_isects.reshape(1)], axis=0
    )
    tile_lin = ty[:, None] * tw + tx[None, :]
    tile_flat = (
        jnp.arange(I, dtype=jnp.int32)[:, None, None] * (th * tw)
        + tile_lin[None]
    )
    start = bounds[tile_flat]
    end = bounds[tile_flat + 1]

    r = jnp.arange(max_range, dtype=jnp.int32)
    slot = start[..., None] + r  # [I, H, W, R]
    in_range = slot < end[..., None]
    slot_c = jnp.minimum(slot, flatten_ids.shape[0] - 1)
    g = flatten_ids[slot_c]

    px = xs.astype(means2d.dtype)[None, None, :, None] + 0.5
    py = ys.astype(means2d.dtype)[None, :, None, None] + 0.5

    uM = M[g, 0]  # [I, H, W, R, 3]
    vM = M[g, 1]
    wM = M[g, 2]
    h_u = px[..., None] * wM - uM
    h_v = py[..., None] * wM - vM
    cx = h_u[..., 1] * h_v[..., 2] - h_u[..., 2] * h_v[..., 1]
    cy = h_u[..., 2] * h_v[..., 0] - h_u[..., 0] * h_v[..., 2]
    cz = h_u[..., 0] * h_v[..., 1] - h_u[..., 1] * h_v[..., 0]
    cz_safe = jnp.where(cz == 0.0, 1.0, cz)
    su = cx / cz_safe
    sv = cy / cz_safe
    sigma3d = su * su + sv * sv
    dx = m2[g, 0] - px
    dy = m2[g, 1] - py
    sigma2d = FILTER_INV_SQUARE_2DGS * (dx * dx + dy * dy)
    sigma = 0.5 * jnp.minimum(sigma3d, sigma2d)
    alpha = jnp.minimum(MAX_ALPHA, op[g] * jnp.exp(-sigma))
    gate = (
        (cz != 0.0) & (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range
    )
    alpha = jnp.where(gate, alpha, 0.0)

    one_m = 1.0 - alpha
    cp_incl = jnp.cumprod(one_m, axis=-1)
    cp_excl = cp_incl / one_m
    contribute = cp_incl > TRANSMITTANCE_THRESHOLD
    w = alpha * cp_excl * contribute  # [I, H, W, R]
    t_final = jnp.min(jnp.where(contribute, cp_incl, 1.0), axis=-1)

    render = jnp.einsum("ihwr,ihwrd->ihwd", w, cl[g])
    render_n = jnp.einsum("ihwr,ihwrd->ihwd", w, nr[g])
    render_alpha = (1.0 - t_final)[..., None]

    # distortion: m = last color channel; A/B exclusive sums of w / w*m
    m = cl[g, ..., D - 1]
    A = jnp.cumsum(w, axis=-1) - w  # exclusive
    B = jnp.cumsum(w * m, axis=-1) - w * m
    distort = jnp.sum(2.0 * w * (m * A - B), axis=-1)[..., None]

    # median: last contributing splat with entry transmittance > 0.5
    t_entry = cp_excl  # T_i before this splat (prefix over contributing)
    med_mask = contribute & gate & (t_entry > 0.5)
    idx = jnp.where(med_mask, r, -1).max(axis=-1)  # [I, H, W]
    median = jnp.sum(
        jnp.where(r == idx[..., None], m, 0.0), axis=-1
    )[..., None]

    if backgrounds is not None:
        render = render + t_final[..., None] * backgrounds[:, None, None, :]

    return render, render_alpha, render_n, distort, median
