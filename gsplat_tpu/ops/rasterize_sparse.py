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
