"""Pure-jnp reference rasterizer (test oracle; differentiable via autodiff).

Implements exactly the compositing semantics of the reference CUDA kernel
(gsplat/cuda/csrc/RasterizeToPixels3DGSSerialBatchFwd.cu:42-297 and
RasterizeToPixels3DGSDevice.cuh:eval_gaussian_weight):

  sigma  = 0.5*(A*dx^2 + C*dy^2) + B*dx*dy      (conic = (A, B, C))
  alpha  = min(MAX_ALPHA, opacity * exp(-sigma))
  gate   : contribution skipped when sigma < 0 or alpha < ALPHA_THRESHOLD
  stop   : pixel saturates at the first gaussian with T*(1-alpha) <=
           TRANSMITTANCE_THRESHOLD; that gaussian is *excluded*
  out    = sum_i c_i * alpha_i * T_i,  T_i = prod_{j<i contributing}(1-alpha_j)
  render = out + T_final * background;  render_alpha = 1 - T_final

The sequential front-to-back loop is re-expressed in its associative-scan
form (cumprod of (1-alpha) along the depth-sorted worklist) — the saturation
rule maps to a monotone prefix mask, so the two are exactly equivalent. This
is also the formulation the Pallas kernels use; this file is their oracle and
the autodiff reference for gradients.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .projection import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_THRESHOLD


def _composite_weights(alphas: jax.Array, axis: int = -1) -> Tuple[jax.Array, jax.Array]:
    """Front-to-back compositing weights along `axis` with saturation.

    Returns (weights w_i = alpha_i * T_i * contribute_i, T_final) where
    T_i is the exclusive cumprod of (1 - alpha) over *contributing* entries
    and contribute_i is the saturation prefix-mask described above.
    """
    one_m = 1.0 - alphas
    cp_incl = jnp.cumprod(one_m, axis=axis)
    cp_excl = cp_incl / one_m  # alphas <= MAX_ALPHA < 1 so one_m >= 0.01
    contribute = cp_incl > TRANSMITTANCE_THRESHOLD
    weights = alphas * cp_excl * contribute
    # T after the last contributing gaussian: min over contributing cp (cp is
    # monotone non-increasing so this is the cp at the last contributing slot).
    t_final = jnp.min(jnp.where(contribute, cp_incl, 1.0), axis=axis)
    return weights, t_final


def rasterize_to_pixels_ref(
    means2d: jax.Array,  # [I, N, 2]
    conics: jax.Array,  # [I, N, 3]
    colors: jax.Array,  # [I, N, D]
    opacities: jax.Array,  # [I, N]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jax.Array,  # [I, tile_height, tile_width] int32
    flatten_ids: jax.Array,  # [P] int32 into [I*N]
    n_isects: jax.Array,  # [] int32
    max_range: int,  # static upper bound on per-tile worklist length
    backgrounds: Optional[jax.Array] = None,  # [I, D]
    masks: Optional[jax.Array] = None,  # [I, tile_height, tile_width] bool
) -> Tuple[jax.Array, jax.Array]:
    """Render [I, H, W, D] colors and [I, H, W, 1] alphas (oracle-grade).

    Memory scales with H*W*max_range — use on test-sized scenes only.
    """
    I, N = means2d.shape[0], means2d.shape[1]
    th, tw = isect_offsets.shape[-2], isect_offsets.shape[-1]
    D = colors.shape[-1]

    m2 = means2d.reshape(I * N, 2)
    cn = conics.reshape(I * N, 3)
    cl = colors.reshape(I * N, D)
    op = opacities.reshape(I * N)

    ys = jnp.arange(image_height, dtype=jnp.int32)
    xs = jnp.arange(image_width, dtype=jnp.int32)
    ty = ys // tile_size  # [H]
    tx = xs // tile_size  # [W]

    offsets_flat = isect_offsets.reshape(I, th * tw)
    bounds = jnp.concatenate(
        [offsets_flat.reshape(-1), n_isects.reshape(1)], axis=0
    )  # flattened starts + total sentinel

    tile_lin = ty[:, None] * tw + tx[None, :]  # [H, W]
    tile_flat = (
        jnp.arange(I, dtype=jnp.int32)[:, None, None] * (th * tw) + tile_lin[None]
    )  # [I, H, W]
    start = bounds[tile_flat]
    end = bounds[tile_flat + 1]

    r = jnp.arange(max_range, dtype=jnp.int32)
    slot = start[..., None] + r  # [I, H, W, R]
    in_range = slot < end[..., None]
    slot_c = jnp.minimum(slot, flatten_ids.shape[0] - 1)
    g = flatten_ids[slot_c]  # [I, H, W, R] flat gaussian ids

    px = xs.astype(means2d.dtype) + 0.5
    py = ys.astype(means2d.dtype) + 0.5
    dx = m2[g, 0] - px[None, None, :, None]
    dy = m2[g, 1] - py[None, :, None, None]
    a_, b_, c_ = cn[g, 0], cn[g, 1], cn[g, 2]
    sigma = 0.5 * (a_ * dx * dx + c_ * dy * dy) + b_ * dx * dy
    vis = jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, op[g] * vis)
    gate = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range
    alpha = jnp.where(gate, alpha, 0.0)

    weights, t_final = _composite_weights(alpha, axis=-1)  # [I,H,W,R], [I,H,W]

    render = jnp.einsum("ihwr,ihwrd->ihwd", weights, cl[g])
    render_alpha = (1.0 - t_final)[..., None]

    if backgrounds is not None:
        render = render + t_final[..., None] * backgrounds[:, None, None, :]

    if masks is not None:
        # Masked-off tiles show pure background with zero alpha
        # (Fwd.cu:141-158 writes bg + zeros and returns).
        mpix = masks[
            jnp.arange(I)[:, None, None], ty[None, :, None], tx[None, None, :]
        ][..., None]
        bg = (
            backgrounds[:, None, None, :]
            if backgrounds is not None
            else jnp.zeros((I, 1, 1, D), dtype=render.dtype)
        )
        render = jnp.where(mpix, render, bg)
        render_alpha = jnp.where(mpix, render_alpha, 0.0)

    return render, render_alpha
