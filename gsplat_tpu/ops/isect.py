"""Tile intersection, depth sort, and per-tile worklist construction.

TPU-native redesign of the reference's CUDA two-pass intersection + CUB radix
sort (gsplat/cuda/csrc/IntersectTile.cu:214,466,925,1078):

  * All shapes are static: the intersection list has a fixed `capacity`; an
    `overflow` flag reports truncation so callers can grow capacity (re-jit)
    rather than crash.
  * Expansion (gaussian -> covered tiles) is a scatter of run boundaries
    followed by a cumulative max — a "fill-forward" that maps every output
    slot to its source gaussian WITHOUT binary searches. (TPU note: XLA's
    per-element gathers run at ~100M elem/s, so a searchsorted over millions
    of queries costs >100ms; boundary-scatter + cummax + one row-gather of a
    packed attribute table costs ~3ms for the same result.)
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
    n_isects: jax.Array  # [] int32 true count (<= capacity if no overflow)
    overflow: jax.Array  # [] bool, True if capacity was exceeded


class TileWorklist(NamedTuple):
    """Chunk-aligned per-tile layout of the sorted intersection list.

    Aligned slot `a` maps to sorted entry `src_idx[a]` when `valid[a]`, else
    it is padding. Tile `t`'s chunks start at chunk index `chunk_starts[t]`
    and span `n_chunks[t]` chunks.
    """

    src_idx: jax.Array  # [A] int32 into the sorted arrays
    valid: jax.Array  # [A] bool
    chunk_starts: jax.Array  # [T] int32 (in units of chunks)
    n_chunks: jax.Array  # [T] int32
    tile_starts: jax.Array  # [T] int32 range starts in the *sorted* list
    tile_counts: jax.Array  # [T] int32 range lengths in the sorted list


def _fill_forward_index(
    boundary_pos: jax.Array,  # [E] position where run e begins (sorted asc)
    live: jax.Array,  # [E] bool, runs with nonzero length
    capacity: int,
) -> jax.Array:
    """Map each slot j in [0, capacity) to the run index covering it.

    Scatter run ids at their start positions, then fill forward with a
    cumulative max. Gather-free (the TPU-fast expansion primitive).
    """
    E = boundary_pos.shape[0]
    pos = jnp.where(live, boundary_pos, capacity)
    mark = jnp.full(capacity + 1, -1, jnp.int32)
    mark = mark.at[pos].max(jnp.arange(E, dtype=jnp.int32))
    return jnp.maximum(jax.lax.cummax(mark[:capacity], axis=0), 0)


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
    """Enumerate (image, tile, gaussian) intersections, sorted by (tile, depth).

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
    starts = cum - cnt

    # gather-free expansion: slot -> source gaussian
    e = _fill_forward_index(starts, cnt > 0, capacity)

    # one packed row-gather for all per-gaussian attributes. int32 table:
    # exact for all values < 2**31; the non-negative depth (culled at the
    # near plane) bitcasts to int32 losslessly and order-preserving.
    table = jnp.stack(
        [
            starts,
            tmin_x,
            tmin_y,
            jnp.maximum(w, 1),
            jax.lax.bitcast_convert_type(dep.astype(jnp.float32), jnp.int32),
        ],
        axis=1,
    )  # [E, 5] int32
    attrs = table[e]  # [capacity, 5] row gather
    start_e = attrs[:, 0]
    tminx_e = attrs[:, 1]
    tminy_e = attrs[:, 2]
    w_e = attrs[:, 3]
    dep_e = jax.lax.bitcast_convert_type(attrs[:, 4], jnp.float32)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    live_slot = slots < n_isects
    within = slots - start_e
    ty = tminy_e + within // w_e
    tx = tminx_e + within % w_e
    image_id = e // N
    tile_key = image_id * n_tiles + ty * tile_width + tx
    tile_key = jnp.where(live_slot, tile_key, sentinel_key).astype(jnp.int32)
    depth_key = jnp.where(live_slot, dep_e, jnp.inf).astype(jnp.float32)
    flatten = jnp.where(live_slot, e, 0).astype(jnp.int32)

    if sort:
        tile_key, depth_key, flatten = jax.lax.sort(
            (tile_key, depth_key, flatten), num_keys=2, is_stable=True
        )

    return Isects(
        tiles_per_gauss=cnt.reshape(I, N),
        tile_keys=tile_key,
        depth_keys=depth_key,
        flatten_ids=flatten,
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
    IntersectTile.cu:925. A searchsorted with only I*n_tiles queries — cheap
    (the cost scales with query count, not list length).
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
    tile-pure. Gather-free except one small-table row gather.
    """
    P = tile_keys.shape[0]
    T = n_tiles_total
    A = _aligned_capacity(P, T, chunk)
    AC = -(-A // chunk)  # aligned chunk count (A may not divide evenly)

    bounds = jnp.searchsorted(
        tile_keys, jnp.arange(T + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)  # T+1 queries — cheap
    tile_starts = bounds[:-1]
    tile_counts = bounds[1:] - bounds[:-1]
    n_chunks = (tile_counts + chunk - 1) // chunk
    chunk_cum = jnp.cumsum(n_chunks)  # inclusive
    chunk_starts = chunk_cum - n_chunks

    # chunk-granular fill-forward (A/chunk elements instead of A — the
    # per-slot work below is pure [AC, chunk] broadcasting)
    t = _fill_forward_index(chunk_starts, n_chunks > 0, AC)  # [AC] -> tile

    # per-chunk attributes: small gathers over [AC]
    ttable = jnp.stack(
        [chunk_starts * chunk, tile_starts, tile_counts], axis=1
    )  # [T, 3] int32
    tat = ttable[t]  # [AC, 3]
    a_start = tat[:, 0:1]  # aligned start of the owning tile
    t_start = tat[:, 1:2]
    t_count = tat[:, 2:3]

    a = (
        jnp.arange(AC, dtype=jnp.int32)[:, None] * chunk
        + jnp.arange(chunk, dtype=jnp.int32)[None, :]
    )  # [AC, chunk]
    within = a - a_start
    valid = within < t_count
    src = jnp.where(valid, t_start + within, 0).astype(jnp.int32)

    return TileWorklist(
        src_idx=src.reshape(AC * chunk)[:A],
        valid=valid.reshape(AC * chunk)[:A],
        chunk_starts=chunk_starts.astype(jnp.int32),
        n_chunks=n_chunks.astype(jnp.int32),
        tile_starts=tile_starts,
        tile_counts=tile_counts,
    )


def _aligned_capacity(P: int, n_tiles_total: int, chunk: int) -> int:
    """Static aligned-buffer capacity for `build_tile_worklist`."""
    return P + n_tiles_total * chunk
