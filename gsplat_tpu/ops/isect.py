"""Tile intersection, depth sort, and per-tile worklist construction.

TPU-native redesign of the reference's CUDA two-pass intersection + CUB radix
sort (gsplat/cuda/csrc/IntersectTile.cu:214,466,925,1078):

  * All shapes are static: the intersection list has a fixed `capacity`; an
    `overflow` flag reports truncation so callers can grow capacity (re-jit)
    rather than crash.
  * Expansion (gaussian -> covered tiles) is gather-based: a searchsorted over
    the inclusive cumsum of per-gaussian tile counts maps every output slot to
    its (gaussian, k-th tile) pair. No scatter, no dynamic shapes.
  * The 64-bit `image|tile|depth` radix key becomes a 2-key lexicographic
    `jax.lax.sort` on (int32 image*tiles+tile, float32 depth). For positive
    depths this is order-identical to the reference's float-bit key
    (IntersectTile.cu:455-457 asserts depth >= 0).
  * `build_tile_worklist` lays the sorted list out in chunk-aligned per-tile
    ranges so the Pallas rasterizer's DMA chunks never straddle tile
    boundaries (replaces CUDA's shared-memory CTA batching).

Parity oracle: gsplat/cuda/_torch_impl.py:_isect_tiles/_isect_offset_encode.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Isects(NamedTuple):
    """Sorted intersection list (fixed capacity)."""

    tiles_per_gauss: jax.Array  # [I, N] int32
    tile_keys: jax.Array  # [P] int32, sorted; I*n_tiles marks padding
    depth_keys: jax.Array  # [P] float32, sorted within each tile
    flatten_ids: jax.Array  # [P] int32 into [I*N]; 0 for padding
    emit_ids: jax.Array  # [P] int32 pre-sort emission slot of each entry
    n_isects: jax.Array  # [] int32 true intersection count (<= capacity if no overflow)
    overflow: jax.Array  # [] bool, True if capacity was exceeded


class TileWorklist(NamedTuple):
    """Chunk-aligned per-tile layout of the sorted intersection list.

    Slot `a` of the aligned buffer maps to sorted entry `src_idx[a]` when
    `valid[a]`, else it is padding. Tile `t`'s chunks start at chunk index
    `chunk_starts[t]` and span `n_chunks[t]` chunks of size `chunk`.
    """

    src_idx: jax.Array  # [A] int32 into the sorted arrays
    valid: jax.Array  # [A] bool
    chunk_starts: jax.Array  # [T] int32 (in units of chunks)
    n_chunks: jax.Array  # [T] int32
    tile_starts: jax.Array  # [T] int32 range starts in the *sorted* list
    tile_counts: jax.Array  # [T] int32 range lengths in the sorted list
    chunk: int  # static chunk size
    n_tiles_total: int  # static I * tile_height * tile_width


def isect_tiles(
    means2d: jax.Array,  # [I, N, 2]
    radii: jax.Array,  # [I, N, 2] int32
    depths: jax.Array,  # [I, N]
    tile_size: int,
    tile_width: int,
    tile_height: int,
    capacity: int,
    sort: bool = True,
) -> Isects:
    """Enumerate (image, tile, gaussian) intersections and sort by (tile, depth).

    Parity: gsplat/cuda/_torch_impl.py:_isect_tiles — identical AABB tile
    coverage ([floor(mean/ts - r/ts), ceil(mean/ts + r/ts)) clamped) and
    identical (image, tile, depth) sort order for non-negative depths, with a
    stable sort matching CUB's stable radix sort on ties.
    """
    I, N = means2d.shape[0], means2d.shape[1]
    E = I * N
    n_tiles = tile_width * tile_height
    sentinel_key = I * n_tiles

    m2 = means2d.reshape(E, 2)
    rad = radii.reshape(E, 2).astype(means2d.dtype)
    dep = depths.reshape(E)

    tmean = m2 / tile_size
    trad = rad / tile_size
    tmin = jnp.floor(tmean - trad).astype(jnp.int32)
    tmax = jnp.ceil(tmean + trad).astype(jnp.int32)
    tmin_x = jnp.clip(tmin[:, 0], 0, tile_width)
    tmin_y = jnp.clip(tmin[:, 1], 0, tile_height)
    tmax_x = jnp.clip(tmax[:, 0], 0, tile_width)
    tmax_y = jnp.clip(tmax[:, 1], 0, tile_height)
    w = tmax_x - tmin_x
    h = tmax_y - tmin_y
    alive = (radii.reshape(E, 2) > 0).all(axis=-1)
    cnt = jnp.where(alive, w * h, 0).astype(jnp.int32)

    cum = jnp.cumsum(cnt)  # inclusive, [E]
    n_isects = cum[-1]
    overflow = n_isects > capacity

    # Gather-based expansion: slot j belongs to element e = first index with
    # cum[e] > j; its within-element ordinal is j - (cum[e] - cnt[e]).
    slots = jnp.arange(capacity, dtype=jnp.int32)
    e = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    e = jnp.minimum(e, E - 1)
    within = slots - (cum[e] - cnt[e])
    live = slots < n_isects

    we = jnp.maximum(w[e], 1)
    ty = tmin_y[e] + within // we
    tx = tmin_x[e] + within % we
    image_id = e // N
    tile_key = image_id * n_tiles + ty * tile_width + tx
    tile_key = jnp.where(live, tile_key, sentinel_key).astype(jnp.int32)
    depth_key = jnp.where(live, dep[e], jnp.inf).astype(jnp.float32)
    flatten = jnp.where(live, e, 0).astype(jnp.int32)

    if sort:
        tile_key, depth_key, flatten, emit = jax.lax.sort(
            (tile_key, depth_key, flatten, slots), num_keys=2, is_stable=True
        )
    else:
        emit = slots

    return Isects(
        tiles_per_gauss=cnt.reshape(I, N),
        tile_keys=tile_key,
        depth_keys=depth_key,
        flatten_ids=flatten,
        emit_ids=emit,
        n_isects=n_isects.astype(jnp.int32),
        overflow=overflow,
    )


def isect_offset_encode(
    tile_keys: jax.Array,  # [P] sorted
    I: int,
    tile_width: int,
    tile_height: int,
) -> jax.Array:
    """Per-(image, tile) start offsets [I, tile_height, tile_width] int32.

    Parity: gsplat/cuda/_torch_impl.py:_isect_offset_encode /
    IntersectTile.cu:925 (intersect_offset_kernel), computed as a single
    searchsorted over the sorted keys instead of boundary detection.
    """
    n_tiles = tile_width * tile_height
    dense = jnp.arange(I * n_tiles, dtype=jnp.int32)
    offsets = jnp.searchsorted(tile_keys, dense, side="left").astype(jnp.int32)
    return offsets.reshape(I, tile_height, tile_width)


def build_tile_worklist(
    tile_keys: jax.Array,  # [P] sorted (with sentinel padding)
    n_tiles_total: int,
    chunk: int,
) -> TileWorklist:
    """Chunk-aligned per-tile ranges over the sorted intersection list.

    Aligned capacity is `P + n_tiles_total * chunk` (static): each tile's
    range is padded up to a multiple of `chunk` so rasterizer DMA chunks are
    tile-pure. The mapping aligned-slot -> sorted-index is gather-only.
    """
    P = tile_keys.shape[0]
    T = n_tiles_total
    A = _aligned_capacity(P, T, chunk)

    bounds = jnp.searchsorted(
        tile_keys, jnp.arange(T + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_starts = bounds[:-1]
    tile_counts = bounds[1:] - bounds[:-1]
    n_chunks = (tile_counts + chunk - 1) // chunk
    chunk_cum = jnp.cumsum(n_chunks)  # inclusive
    chunk_starts = chunk_cum - n_chunks

    # aligned slot a -> tile t (first tile whose aligned end exceeds a)
    slot_cum = chunk_cum * chunk  # inclusive aligned end per tile
    a = jnp.arange(A, dtype=jnp.int32)
    t = jnp.searchsorted(slot_cum, a, side="right").astype(jnp.int32)
    t = jnp.minimum(t, T - 1)
    within = a - (slot_cum[t] - n_chunks[t] * chunk)
    valid = within < tile_counts[t]
    src = jnp.where(valid, tile_starts[t] + within, 0).astype(jnp.int32)

    return TileWorklist(
        src_idx=src,
        valid=valid,
        chunk_starts=chunk_starts.astype(jnp.int32),
        n_chunks=n_chunks.astype(jnp.int32),
        tile_starts=tile_starts,
        tile_counts=tile_counts,
        chunk=chunk,
        n_tiles_total=T,
    )


def _aligned_capacity(P: int, n_tiles_total: int, chunk: int) -> int:
    """Static aligned-buffer capacity for `build_tile_worklist`."""
    return P + n_tiles_total * chunk
