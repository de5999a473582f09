"""Contributing-gaussian analysis ops + iterative index rasterization.

Public analogs of (gsplat/cuda/_wrapper.py):
  - rasterize_num_contributing_gaussians (:1508)
  - rasterize_contributing_gaussian_ids (:1616)
  - rasterize_top_contributing_gaussian_ids (:1735)
  - rasterize_to_indices_in_range (:2326) + the nerfacc-style accumulate
    compositor the reference pairs it with (_torch_impl.py:_rasterize_to_pixels).

TPU-native design: all four are inference/analysis ops, so they run as
plain jnp over the dense per-pixel worklist view (same layout as
ops/rasterize_ref.py: per pixel, `max_range` depth-ordered slots from
isect_offsets + flatten_ids). Where the CUDA ops return dynamically sized
flat lists, the JAX versions return statically shaped arrays with validity
masks — `rasterize_to_indices_in_range` emits [M_cap] id lists in
ray-major order plus a `valid` mask (M_cap = I*H*W*(range_end-range_start)).

"Contributing" uses the exact kernel semantics: sigma/alpha gates, the
MAX_ALPHA clamp, and the transmittance cutoff with the saturating gaussian
excluded (RasterizeToPixels3DGSDevice.cuh).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .projection import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_THRESHOLD


def _pixel_worklist_alphas(
    means2d, conics, opacities, tile_offsets, flatten_ids, n_isects,
    image_width, image_height, tile_size, range_start, range_end,
):
    """Per-pixel gated alphas over worklist slots [range_start, range_end).

    Returns (alpha [I,H,W,R], gate [I,H,W,R], g [I,H,W,R] flat ids).
    """
    I, N = means2d.shape[0], means2d.shape[1]
    th, tw = tile_offsets.shape[-2], tile_offsets.shape[-1]
    m2 = means2d.reshape(I * N, 2)
    cn = conics.reshape(I * N, 3)
    op = opacities.reshape(I * N)

    ys = jnp.arange(image_height, dtype=jnp.int32)
    xs = jnp.arange(image_width, dtype=jnp.int32)
    ty, tx = ys // tile_size, xs // tile_size

    offsets_flat = tile_offsets.reshape(I, th * tw)
    bounds = jnp.concatenate(
        [offsets_flat.reshape(-1), jnp.asarray(n_isects, jnp.int32).reshape(1)]
    )
    tile_lin = ty[:, None] * tw + tx[None, :]
    tile_flat = (
        jnp.arange(I, dtype=jnp.int32)[:, None, None] * (th * tw) + tile_lin[None]
    )
    start = bounds[tile_flat]
    end = bounds[tile_flat + 1]

    r = jnp.arange(range_start, range_end, dtype=jnp.int32)
    slot = start[..., None] + r
    in_range = slot < end[..., None]
    slot_c = jnp.minimum(slot, flatten_ids.shape[0] - 1)
    g = flatten_ids[slot_c]

    px = xs.astype(means2d.dtype) + 0.5
    py = ys.astype(means2d.dtype) + 0.5
    dx = m2[g, 0] - px[None, None, :, None]
    dy = m2[g, 1] - py[None, :, None, None]
    a_, b_, c_ = cn[g, 0], cn[g, 1], cn[g, 2]
    sigma = 0.5 * (a_ * dx * dx + c_ * dy * dy) + b_ * dx * dy
    alpha = jnp.minimum(MAX_ALPHA, op[g] * jnp.exp(-sigma))
    gate = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range
    return jnp.where(gate, alpha, 0.0), gate, g


def _weights_from_alphas(alpha, t0=None):
    """(weights, contribute-mask, t_final) along the last axis; optional
    incoming transmittance t0 [..., 1]-broadcastable."""
    one_m = 1.0 - alpha
    cp_incl = jnp.cumprod(one_m, axis=-1)
    cp_excl = cp_incl / one_m
    if t0 is not None:
        cp_incl = cp_incl * t0[..., None]
        cp_excl = cp_excl * t0[..., None]
    contribute = cp_incl > TRANSMITTANCE_THRESHOLD
    weights = alpha * cp_excl * contribute
    t_final = jnp.min(
        jnp.where(contribute, cp_incl, t0[..., None] if t0 is not None else 1.0),
        axis=-1,
    )
    return weights, contribute, t_final


def rasterize_num_contributing_gaussians(
    means2d: jax.Array,  # [I, N, 2]
    conics: jax.Array,  # [I, N, 3]
    opacities: jax.Array,  # [I, N]
    tile_offsets: jax.Array,  # [I, th, tw]
    flatten_ids: jax.Array,  # [P]
    image_width: int,
    image_height: int,
    tile_size: int,
    n_isects: jax.Array,
    max_range: int,
) -> Tuple[jax.Array, jax.Array]:
    """(counts int32 [I,H,W], accumulated alphas [I,H,W]).

    Parity: _wrapper.py:rasterize_num_contributing_gaussians (:1508).
    `max_range` is the static per-pixel worklist bound (TPU static shapes).
    """
    alpha, gate, _ = _pixel_worklist_alphas(
        means2d, conics, opacities, tile_offsets, flatten_ids, n_isects,
        image_width, image_height, tile_size, 0, max_range,
    )
    weights, contribute, t_final = _weights_from_alphas(alpha)
    counts = jnp.sum(gate & contribute, axis=-1).astype(jnp.int32)
    return counts, 1.0 - t_final


def rasterize_contributing_gaussian_ids(
    means2d: jax.Array,
    conics: jax.Array,
    opacities: jax.Array,
    tile_offsets: jax.Array,
    flatten_ids: jax.Array,
    image_width: int,
    image_height: int,
    tile_size: int,
    n_isects: jax.Array,
    max_range: int,
    max_contributors: int,
) -> Tuple[jax.Array, jax.Array]:
    """(ids int32 [I,H,W,K] -1-padded front-to-back, weights [I,H,W,K]).

    Parity: _wrapper.py:rasterize_contributing_gaussian_ids (:1616).
    `max_contributors` (K) is static — pass num_contributing.max() from
    `rasterize_num_contributing_gaussians` (host-side) or a bound.
    """
    alpha, gate, g = _pixel_worklist_alphas(
        means2d, conics, opacities, tile_offsets, flatten_ids, n_isects,
        image_width, image_height, tile_size, 0, max_range,
    )
    weights, contribute, _ = _weights_from_alphas(alpha)
    live = gate & contribute
    # stable front-compaction of live slots (keeps front-to-back order)
    order = jnp.argsort(~live, axis=-1, stable=True)
    ids_sorted = jnp.take_along_axis(g, order, axis=-1)[..., :max_contributors]
    w_sorted = jnp.take_along_axis(weights, order, axis=-1)[..., :max_contributors]
    live_sorted = jnp.take_along_axis(live, order, axis=-1)[..., :max_contributors]
    N = means2d.shape[1]
    ids_out = jnp.where(live_sorted, ids_sorted % N, -1).astype(jnp.int32)
    return ids_out, jnp.where(live_sorted, w_sorted, 0.0)


def rasterize_top_contributing_gaussian_ids(
    means2d: jax.Array,
    conics: jax.Array,
    opacities: jax.Array,
    tile_offsets: jax.Array,
    flatten_ids: jax.Array,
    image_width: int,
    image_height: int,
    tile_size: int,
    n_isects: jax.Array,
    max_range: int,
    num_depth_samples: int,
) -> Tuple[jax.Array, jax.Array]:
    """Top-`num_depth_samples` contributors by weight alpha*T per pixel,
    returned in front-to-back order; ids -1 / weights 0 padded.

    Parity: _wrapper.py:rasterize_top_contributing_gaussian_ids (:1735).
    """
    alpha, gate, g = _pixel_worklist_alphas(
        means2d, conics, opacities, tile_offsets, flatten_ids, n_isects,
        image_width, image_height, tile_size, 0, max_range,
    )
    weights, contribute, _ = _weights_from_alphas(alpha)
    live = gate & contribute
    w = jnp.where(live, weights, -1.0)
    topw, topi = jax.lax.top_k(w, num_depth_samples)
    # restore front-to-back order among the selected slots
    order = jnp.argsort(jnp.where(topw > 0.0, topi, jnp.iinfo(jnp.int32).max), axis=-1)
    topi = jnp.take_along_axis(topi, order, axis=-1)
    topw = jnp.take_along_axis(topw, order, axis=-1)
    sel_ids = jnp.take_along_axis(g, topi, axis=-1)
    N = means2d.shape[1]
    valid = topw > 0.0
    return (
        jnp.where(valid, sel_ids % N, -1).astype(jnp.int32),
        jnp.where(valid, topw, 0.0),
    )


def rasterize_to_indices_in_range(
    range_start: int,
    range_end: int,
    transmittances: jax.Array,  # [I, H, W]
    means2d: jax.Array,
    conics: jax.Array,
    opacities: jax.Array,
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jax.Array,
    flatten_ids: jax.Array,
    n_isects: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Contributing (gaussian, pixel, image) triplets for worklist slots
    [range_start, range_end), given running per-pixel transmittances.

    Parity: _wrapper.py:rasterize_to_indices_in_range (:2326) — ranges are
    in units of BATCHES of tile_size^2 intersections, like the CUDA op
    (RasterizeToIndices3DGSSerialBatch.cu:128-139). Instead of the CUDA
    op's dynamically sized lists, returns statically shaped
    [M_cap = I*H*W*(range_end-range_start)*tile_size^2] arrays in
    ray-major order plus a `valid` mask (compose with `accumulate`).
    """
    I = means2d.shape[0]
    block = tile_size * tile_size
    alpha, gate, g = _pixel_worklist_alphas(
        means2d, conics, opacities, isect_offsets, flatten_ids, n_isects,
        image_width, image_height, tile_size, range_start * block,
        range_end * block,
    )
    _, contribute, _ = _weights_from_alphas(alpha, t0=transmittances)
    live = gate & contribute  # [I, H, W, R]

    N = means2d.shape[1]
    HW = image_height * image_width
    pix = jnp.arange(HW, dtype=jnp.int32).reshape(1, image_height, image_width, 1)
    img = jnp.arange(I, dtype=jnp.int32).reshape(I, 1, 1, 1)
    gaussian_ids = jnp.broadcast_to(g % N, live.shape).reshape(-1)
    pixel_ids = jnp.broadcast_to(pix, live.shape).reshape(-1)
    image_ids = jnp.broadcast_to(img, live.shape).reshape(-1)
    return gaussian_ids, pixel_ids, image_ids, live.reshape(-1)


def accumulate(
    means2d: jax.Array,  # [I, N, 2]
    conics: jax.Array,  # [I, N, 3]
    opacities: jax.Array,  # [I, N]
    colors: jax.Array,  # [I, N, D]
    gaussian_ids: jax.Array,  # [M]
    pixel_ids: jax.Array,  # [M]
    image_ids: jax.Array,  # [M]
    valid: jax.Array,  # [M] bool
    image_width: int,
    image_height: int,
) -> Tuple[jax.Array, jax.Array]:
    """Alpha compositing of the given intersections (ray-major order).

    Parity: gsplat/cuda/_torch_impl.py:accumulate (:814, nerfacc-based) —
    renders [I,H,W,D] colors and [I,H,W,1] alphas via segment cumprods.
    The `valid` mask replaces nerfacc's packed layout.
    """
    I, N, D = colors.shape[0], colors.shape[1], colors.shape[2]
    HW = image_height * image_width
    ray = image_ids.astype(jnp.int32) * HW + pixel_ids.astype(jnp.int32)

    # alphas at the samples (same formula as the kernels)
    px = (pixel_ids % image_width).astype(means2d.dtype) + 0.5
    py = (pixel_ids // image_width).astype(means2d.dtype) + 0.5
    gid = image_ids * N + gaussian_ids
    m2 = means2d.reshape(I * N, 2)
    cn = conics.reshape(I * N, 3)
    op = opacities.reshape(I * N)
    dx = m2[gid, 0] - px
    dy = m2[gid, 1] - py
    sigma = (
        0.5 * (cn[gid, 0] * dx * dx + cn[gid, 2] * dy * dy)
        + cn[gid, 1] * dx * dy
    )
    alpha = jnp.minimum(MAX_ALPHA, op[gid] * jnp.exp(-sigma))
    alpha = jnp.where(valid, alpha, 0.0)

    # per-ray exclusive cumprod of (1 - alpha): global log-space cumsum
    # re-based at ray boundaries (ray ids are sorted, so a max-scan over
    # segment-start POSITIONS finds each element's segment base).
    log1m = jnp.log1p(-alpha)
    ex = jnp.cumsum(log1m) - log1m  # global exclusive cumsum
    M = ray.shape[0]
    is_start = jnp.concatenate([jnp.ones((1,), bool), ray[1:] != ray[:-1]])
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, jnp.arange(M, dtype=jnp.int32), -1)
    )
    trans = jnp.exp(ex - ex[start_pos])  # exclusive per-segment cumprod
    weights = alpha * trans

    cl = colors.reshape(I * N, D)
    render = jax.ops.segment_sum(
        weights[:, None] * cl[gid], ray, num_segments=I * HW
    ).reshape(I, image_height, image_width, D)
    alphas = jax.ops.segment_sum(
        weights, ray, num_segments=I * HW
    ).reshape(I, image_height, image_width, 1)
    return render, alphas


def _surfel_worklist_alphas(
    means2d, ray_transforms, opacities, tile_offsets, flatten_ids, n_isects,
    image_width, image_height, tile_size, range_start, range_end,
):
    """2DGS surfel response over worklist slots (parity:
    _torch_impl_2dgs.py:177-188 ray-splat intersection, min of 3D and
    2D low-pass sigma)."""
    I, N = means2d.shape[0], means2d.shape[1]
    th, tw = tile_offsets.shape[-2], tile_offsets.shape[-1]
    m2 = means2d.reshape(I * N, 2)
    M = ray_transforms.reshape(I * N, 9)
    op = opacities.reshape(I * N)

    ys = jnp.arange(image_height, dtype=jnp.int32)
    xs = jnp.arange(image_width, dtype=jnp.int32)
    ty, tx = ys // tile_size, xs // tile_size
    offsets_flat = tile_offsets.reshape(I, th * tw)
    bounds = jnp.concatenate(
        [offsets_flat.reshape(-1), jnp.asarray(n_isects, jnp.int32).reshape(1)]
    )
    tile_lin = ty[:, None] * tw + tx[None, :]
    tile_flat = (
        jnp.arange(I, dtype=jnp.int32)[:, None, None] * (th * tw) + tile_lin[None]
    )
    start = bounds[tile_flat]
    end = bounds[tile_flat + 1]
    r = jnp.arange(range_start, range_end, dtype=jnp.int32)
    slot = start[..., None] + r
    in_range = slot < end[..., None]
    slot_c = jnp.minimum(slot, flatten_ids.shape[0] - 1)
    g = flatten_ids[slot_c]

    px = xs.astype(means2d.dtype) + 0.5
    py = ys.astype(means2d.dtype) + 0.5
    pxb = px[None, None, :, None]
    pyb = py[None, :, None, None]
    hu = [pxb * M[g, 6 + k] - M[g, 0 + k] for k in range(3)]
    hv = [pyb * M[g, 6 + k] - M[g, 3 + k] for k in range(3)]
    cx = hu[1] * hv[2] - hu[2] * hv[1]
    cy = hu[2] * hv[0] - hu[0] * hv[2]
    cz = hu[0] * hv[1] - hu[1] * hv[0]
    cz_safe = jnp.where(cz == 0.0, 1.0, cz)
    su, sv = cx / cz_safe, cy / cz_safe
    sigma3 = su * su + sv * sv
    dx = m2[g, 0] - pxb
    dy = m2[g, 1] - pyb
    sigma2 = 2.0 * (dx * dx + dy * dy)  # FILTER_INV_SQUARE_2DGS
    sigma = 0.5 * jnp.minimum(sigma2, sigma3)
    alpha = jnp.minimum(MAX_ALPHA, op[g] * jnp.exp(-sigma))
    gate = (cz != 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range
    return jnp.where(gate, alpha, 0.0), gate, g


def rasterize_to_indices_in_range_2dgs(
    range_start: int,
    range_end: int,
    transmittances: jax.Array,  # [I, H, W]
    means2d: jax.Array,  # [I, N, 2]
    ray_transforms: jax.Array,  # [I, N, 3, 3] (or [I, N, 9])
    opacities: jax.Array,  # [I, N]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jax.Array,
    flatten_ids: jax.Array,
    n_isects: jax.Array,
):
    """2DGS counterpart of `rasterize_to_indices_in_range`
    (parity: _wrapper.py:rasterize_to_indices_in_range_2dgs :2988); same
    static-shape (ids, pixel, image, valid) contract, ranges in blocks of
    tile_size^2 intersections."""
    I = means2d.shape[0]
    block = tile_size * tile_size
    alpha, gate, g = _surfel_worklist_alphas(
        means2d, ray_transforms, opacities, isect_offsets, flatten_ids,
        n_isects, image_width, image_height, tile_size,
        range_start * block, range_end * block,
    )
    _, contribute, _ = _weights_from_alphas(alpha, t0=transmittances)
    live = gate & contribute
    N = means2d.shape[1]
    HW = image_height * image_width
    pix = jnp.arange(HW, dtype=jnp.int32).reshape(1, image_height, image_width, 1)
    img = jnp.arange(I, dtype=jnp.int32).reshape(I, 1, 1, 1)
    return (
        jnp.broadcast_to(g % N, live.shape).reshape(-1),
        jnp.broadcast_to(pix, live.shape).reshape(-1),
        jnp.broadcast_to(img, live.shape).reshape(-1),
        live.reshape(-1),
    )
