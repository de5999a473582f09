"""Sparse (pixel-subset) rasterization: render only requested pixels.

Public analog of the reference's sparse pipeline (gsplat/cuda/_wrapper.py:
build_sparse_tile_layout :1273, intersect_tile_sparse,
rasterize_to_pixels_sparse over RasterizeToPixelsSparse{Fwd,Bwd}.cu) used
for ray-batch supervision.

TPU-native redesign: the CUDA path needs active-tile lists, per-tile pixel
bitmasks, and a pixel_map argsort because its kernels are tile-shaped. On
TPU the requested pixels are simply a batch axis: each pixel gathers its
tile's depth-sorted worklist span (isect_offsets + flatten_ids, the same
structures as the dense path) and composites over a static `max_range`
slot axis. Autodiff supplies the backward (gathers become segment-sum
scatters under XLA — deterministic, no atomics). No layout structures are
required; `build_sparse_tile_layout` is therefore not needed and not
provided.

Memory is O(P * max_range) — intended for sparse supervision batches
(P ~ 1e3..1e5), matching the reference's use case.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .projection import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_THRESHOLD


def rasterize_to_pixels_sparse(
    means2d: jax.Array,  # [I, N, 2]
    conics: jax.Array,  # [I, N, 3]
    colors: jax.Array,  # [I, N, D]
    opacities: jax.Array,  # [I, N]
    pixels: jax.Array,  # [P, 2] (row, col) int32
    image_ids: jax.Array,  # [P] int32
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jax.Array,  # [I, th, tw] int32
    flatten_ids: jax.Array,  # [n_isects_cap] int32 into [I*N]
    n_isects: jax.Array,  # [] int32
    max_range: int,
    backgrounds: Optional[jax.Array] = None,  # [I, D]
) -> Tuple[jax.Array, jax.Array]:
    """Render the requested pixels: (colors [P, D], alphas [P, 1]).

    Semantics identical to the dense rasterizer at those pixels
    (sigma/alpha gates, MAX_ALPHA clamp, transmittance cutoff excluding the
    saturating gaussian, background blended with final transmittance).
    Parity: _wrapper.py:rasterize_to_pixels_sparse; oracle relation:
    equals `rasterize_to_pixels*(...)[pixels]`.
    """
    I, N = means2d.shape[0], means2d.shape[1]
    th, tw = isect_offsets.shape[-2], isect_offsets.shape[-1]
    D = colors.shape[-1]

    m2 = means2d.reshape(I * N, 2)
    cn = conics.reshape(I * N, 3)
    cl = colors.reshape(I * N, D)
    op = opacities.reshape(I * N)

    py_i = pixels[:, 0].astype(jnp.int32)
    px_i = pixels[:, 1].astype(jnp.int32)
    ty = py_i // tile_size
    tx = px_i // tile_size

    offsets_flat = isect_offsets.reshape(I * th * tw)
    bounds = jnp.concatenate(
        [offsets_flat, jnp.asarray(n_isects, jnp.int32).reshape(1)]
    )
    tile_flat = image_ids.astype(jnp.int32) * (th * tw) + ty * tw + tx
    start = bounds[tile_flat]  # [P]
    end = bounds[tile_flat + 1]

    r = jnp.arange(max_range, dtype=jnp.int32)
    slot = start[:, None] + r  # [P, R]
    in_range = slot < end[:, None]
    slot_c = jnp.minimum(slot, flatten_ids.shape[0] - 1)
    g = flatten_ids[slot_c]  # [P, R]

    px = px_i.astype(means2d.dtype) + 0.5
    py = py_i.astype(means2d.dtype) + 0.5
    dx = m2[g, 0] - px[:, None]
    dy = m2[g, 1] - py[:, None]
    a_, b_, c_ = cn[g, 0], cn[g, 1], cn[g, 2]
    sigma = 0.5 * (a_ * dx * dx + c_ * dy * dy) + b_ * dx * dy
    alpha = jnp.minimum(MAX_ALPHA, op[g] * jnp.exp(-sigma))
    gate = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range
    alpha = jnp.where(gate, alpha, 0.0)

    one_m = 1.0 - alpha
    cp_incl = jnp.cumprod(one_m, axis=-1)
    cp_excl = cp_incl / one_m
    contribute = cp_incl > TRANSMITTANCE_THRESHOLD
    weights = alpha * cp_excl * contribute
    t_final = jnp.min(jnp.where(contribute, cp_incl, 1.0), axis=-1)

    render = jnp.einsum("pr,prd->pd", weights, cl[g])
    if backgrounds is not None:
        render = render + t_final[:, None] * backgrounds[image_ids]
    return render, (1.0 - t_final)[:, None]


def _sparse_worklist_alphas(
    means2d, conics, opacities, pixels, image_ids,
    image_width, image_height, tile_size, isect_offsets, flatten_ids,
    n_isects, max_range,
):
    """Per-requested-pixel gated alphas + flat ids over worklist slots."""
    I, N = means2d.shape[0], means2d.shape[1]
    th, tw = isect_offsets.shape[-2], isect_offsets.shape[-1]
    m2 = means2d.reshape(I * N, 2)
    cn = conics.reshape(I * N, 3)
    op = opacities.reshape(I * N)
    py_i = pixels[:, 0].astype(jnp.int32)
    px_i = pixels[:, 1].astype(jnp.int32)
    offsets_flat = isect_offsets.reshape(I * th * tw)
    bounds = jnp.concatenate(
        [offsets_flat, jnp.asarray(n_isects, jnp.int32).reshape(1)]
    )
    tile_flat = (
        image_ids.astype(jnp.int32) * (th * tw)
        + (py_i // tile_size) * tw + (px_i // tile_size)
    )
    start = bounds[tile_flat]
    end = bounds[tile_flat + 1]
    r = jnp.arange(max_range, dtype=jnp.int32)
    slot = start[:, None] + r
    in_range = slot < end[:, None]
    g = flatten_ids[jnp.minimum(slot, flatten_ids.shape[0] - 1)]
    px = px_i.astype(means2d.dtype) + 0.5
    py = py_i.astype(means2d.dtype) + 0.5
    dx = m2[g, 0] - px[:, None]
    dy = m2[g, 1] - py[:, None]
    sigma = (
        0.5 * (cn[g, 0] * dx * dx + cn[g, 2] * dy * dy) + cn[g, 1] * dx * dy
    )
    alpha = jnp.minimum(MAX_ALPHA, op[g] * jnp.exp(-sigma))
    gate = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range
    return jnp.where(gate, alpha, 0.0), gate, g


def _sparse_weights(alpha):
    one_m = 1.0 - alpha
    cp_incl = jnp.cumprod(one_m, axis=-1)
    cp_excl = cp_incl / one_m
    contribute = cp_incl > TRANSMITTANCE_THRESHOLD
    weights = alpha * cp_excl * contribute
    t_final = jnp.min(jnp.where(contribute, cp_incl, 1.0), axis=-1)
    return weights, contribute, t_final


def rasterize_num_contributing_gaussians_sparse(
    means2d, conics, opacities, pixels, image_ids,
    image_width, image_height, tile_size, isect_offsets, flatten_ids,
    n_isects, max_range,
):
    """(counts int32 [P], alphas [P]) at the requested pixels
    (parity: _wrapper.py:rasterize_num_contributing_gaussians_sparse :1550;
    the CUDA layout tensors are unnecessary here — see module docstring)."""
    alpha, gate, _ = _sparse_worklist_alphas(
        means2d, conics, opacities, pixels, image_ids, image_width,
        image_height, tile_size, isect_offsets, flatten_ids, n_isects,
        max_range,
    )
    _, contribute, t_final = _sparse_weights(alpha)
    return (
        jnp.sum(gate & contribute, axis=-1).astype(jnp.int32),
        1.0 - t_final,
    )


def rasterize_contributing_gaussian_ids_sparse(
    means2d, conics, opacities, pixels, image_ids,
    image_width, image_height, tile_size, isect_offsets, flatten_ids,
    n_isects, max_range, max_contributors,
):
    """(ids int32 [P, K] -1-padded front-to-back, weights [P, K])
    (parity: _wrapper.py:rasterize_contributing_gaussian_ids_sparse :1665)."""
    alpha, gate, g = _sparse_worklist_alphas(
        means2d, conics, opacities, pixels, image_ids, image_width,
        image_height, tile_size, isect_offsets, flatten_ids, n_isects,
        max_range,
    )
    weights, contribute, _ = _sparse_weights(alpha)
    live = gate & contribute
    order = jnp.argsort(~live, axis=-1, stable=True)
    ids_s = jnp.take_along_axis(g, order, axis=-1)[:, :max_contributors]
    w_s = jnp.take_along_axis(weights, order, axis=-1)[:, :max_contributors]
    live_s = jnp.take_along_axis(live, order, axis=-1)[:, :max_contributors]
    N = means2d.shape[1]
    return (
        jnp.where(live_s, ids_s % N, -1).astype(jnp.int32),
        jnp.where(live_s, w_s, 0.0),
    )


def rasterize_top_contributing_gaussian_ids_sparse(
    means2d, conics, opacities, pixels, image_ids,
    image_width, image_height, tile_size, isect_offsets, flatten_ids,
    n_isects, max_range, num_depth_samples,
):
    """Top-K contributors by weight at the requested pixels, front-to-back
    (parity: _wrapper.py:rasterize_top_contributing_gaussian_ids_sparse)."""
    alpha, gate, g = _sparse_worklist_alphas(
        means2d, conics, opacities, pixels, image_ids, image_width,
        image_height, tile_size, isect_offsets, flatten_ids, n_isects,
        max_range,
    )
    weights, contribute, _ = _sparse_weights(alpha)
    live = gate & contribute
    w = jnp.where(live, weights, -1.0)
    topw, topi = jax.lax.top_k(w, num_depth_samples)
    order = jnp.argsort(
        jnp.where(topw > 0.0, topi, jnp.iinfo(jnp.int32).max), axis=-1
    )
    topi = jnp.take_along_axis(topi, order, axis=-1)
    topw = jnp.take_along_axis(topw, order, axis=-1)
    sel = jnp.take_along_axis(g, topi, axis=-1)
    N = means2d.shape[1]
    valid = topw > 0.0
    return (
        jnp.where(valid, sel % N, -1).astype(jnp.int32),
        jnp.where(valid, topw, 0.0),
    )
