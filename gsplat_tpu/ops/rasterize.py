"""rasterize_to_pixels: the differentiable tile rasterization op.

Public analog of gsplat/cuda/_wrapper.py:rasterize_to_pixels (:1337) with a
jax.custom_vjp pairing the Pallas forward/backward kernels
(ops/rasterize_pallas.py). Differences from the CUDA design, by intent:

  * Images are computed in a tiled [n_tiles, D, 256] layout inside the
    kernels and reassembled here (tile_image/untile_image) — lane-friendly
    on TPU, one cheap XLA transpose outside.
  * Background blending, alpha composition, and tile masks happen in plain
    jnp outside the custom_vjp boundary (autodiff handles them); tile masks
    zero the per-tile chunk counts so masked tiles cost nothing
    (reference semantics: masked tiles render pure background with zero
    alpha — RasterizeToPixels3DGSSerialBatchFwd.cu:141-158).
  * Gradient accumulation to gaussians avoids atomics AND scatter-adds
    (both slow on TPU): per-slot gradients are sorted by gaussian id
    (jax.lax.sort — fast) and reduced with a cumulative-sum difference at
    the per-gaussian run boundaries. Deterministic, bandwidth-bound.
  * All reorderings use packed row-gathers (XLA TPU gathers cost per
    *element*, so one [M, 8] row gather beats eight [M] column gathers).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .isect import Isects, TileWorklist, build_tile_worklist
from .rasterize_pallas import DEFAULT_CHUNK, N_PIX, TILE, _bwd_call, _fwd_call


def tile_image(img: jax.Array, tile_size: int = TILE) -> jax.Array:
    """[I, H, W, D] -> [I*th*tw, D, ts*ts] (H, W padded up to tile multiples)."""
    I, H, W, D = img.shape
    ts = tile_size
    th, tw = -(-H // ts), -(-W // ts)
    img = jnp.pad(img, ((0, 0), (0, th * ts - H), (0, tw * ts - W), (0, 0)))
    x = img.reshape(I, th, ts, tw, ts, D)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # I, th, tw, D, ts, ts
    return x.reshape(I * th * tw, D, ts * ts)


def untile_image(
    x: jax.Array, I: int, th: int, tw: int, H: int, W: int, tile_size: int = TILE
) -> jax.Array:
    """[I*th*tw, D, ts*ts] -> [I, H, W, D] (cropping tile padding)."""
    ts = tile_size
    D = x.shape[1]
    x = x.reshape(I, th, tw, D, ts, ts)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # I, th, ts, tw, ts, D
    return x.reshape(I, th * ts, tw * ts, D)[:, :H, :W]


def _bitcast_f32(i: jax.Array) -> jax.Array:
    """int32 -> f32 for packed row-gather transport.

    NOT a bitcast: TPU vector units flush denormal floats to zero, and small
    int bit patterns are denormals. Plain conversion is exact for
    |i| < 2**24, which callers must guarantee.
    """
    return i.astype(jnp.float32)


def _bitcast_i32(f: jax.Array) -> jax.Array:
    return f.astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def _rasterize_core(
    m2f,  # [I*N, 2]
    cnf,  # [I*N, 3]
    clf,  # [I*N, D]
    opf,  # [I*N]
    m2abs,  # [I*N, 2] absgrad carrier (value unused; cotangent = abs grads)
    ids_data,  # [A] int32 gaussian flat id per aligned slot (0 for padding)
    slot_valid,  # [A] bool
    chunk_starts,  # [T] int32 (units of chunks)
    n_chunks,  # [T] int32
    gauss_bounds,  # [I*N, 2] int32 (start, end) emission run per gaussian
    chunk: int,
    n_channels: int,
    tiles_w: int,
    tiles_per_image: int,
    image_size: Tuple[int, int],  # (width, height)
    absgrad: bool,
):
    out, _ = _core_fwd(
        m2f, cnf, clf, opf, m2abs, ids_data, slot_valid, chunk_starts,
        n_chunks, gauss_bounds, chunk, n_channels, tiles_w, tiles_per_image,
        image_size, absgrad,
    )
    return out


def _core_fwd(
    m2f, cnf, clf, opf, m2abs, ids_data, slot_valid, chunk_starts, n_chunks,
    gauss_bounds,
    chunk, n_channels, tiles_w, tiles_per_image, image_size, absgrad,
):
    width, height = image_size
    D = n_channels
    # one packed row-gather builds the aligned worklist; transpose to
    # field-major [F_pad, A] for the kernel's 128-lane DMA chunks
    data_flat = jnp.concatenate(
        [m2f, cnf, opf[:, None], clf], axis=1
    )  # [I*N, 6+D]
    F = data_flat.shape[1]
    F_pad = -(-F // 8) * 8
    data_flat = jnp.pad(data_flat, ((0, 0), (0, F_pad - F)))
    rows = data_flat[ids_data]  # [A, F_pad] row gather
    # zero the opacity of padding slots so they contribute nothing
    op_col = jnp.where(slot_valid, rows[:, 5], 0.0)
    rows = jnp.concatenate([rows[:, :5], op_col[:, None], rows[:, 6:]], axis=1)
    isect_data = rows.T  # [F_pad, A]

    pix_out, t_final = _fwd_call(
        isect_data, chunk_starts, n_chunks,
        chunk=chunk, n_channels=n_channels, tiles_w=tiles_w,
        tiles_per_image=tiles_per_image, width=width, height=height,
        n_tiles=int(chunk_starts.shape[0]),
    )
    res = (
        isect_data, ids_data, slot_valid, chunk_starts, n_chunks,
        gauss_bounds, pix_out, t_final,
    )
    return (pix_out, t_final), res


def _core_bwd(
    chunk, n_channels, tiles_w, tiles_per_image, image_size, absgrad, res, cts
):
    (
        isect_data, ids_data, slot_valid, chunk_starts, n_chunks,
        gauss_bounds, pix_out, t_final,
    ) = res
    v_pix, v_tfinal = cts
    width, height = image_size
    D = n_channels
    A = ids_data.shape[0]
    IN = gauss_bounds.shape[0]

    (v_aligned,) = _bwd_call(
        isect_data, chunk_starts, n_chunks, v_pix, v_tfinal, pix_out, t_final,
        chunk=chunk, n_channels=n_channels, tiles_w=tiles_w,
        tiles_per_image=tiles_per_image, width=width, height=height,
        n_tiles=int(chunk_starts.shape[0]),
    )  # [F_pad, A] per-slot gradients, field-major

    # Deterministic per-gaussian reduction without scatters:
    # sort aligned slots by gaussian id (padding slots get id IN and sort
    # last), then each gaussian's slots form the contiguous run
    # gauss_bounds[e] — reduce with a cumsum difference at the boundaries.
    ids_sort = jnp.where(slot_valid, ids_data, IN)
    _, perm = jax.lax.sort(
        (ids_sort, jnp.arange(A, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    v_rows = v_aligned.T[perm][:, : 6 + D]  # [A, 6+D] row gather
    if absgrad:
        # per-tile |v_means2d| reduced alongside (AbsGS, arXiv:2404.10484;
        # same tile granularity as the reference's warp-reduced atomics)
        v_rows = jnp.concatenate([v_rows, jnp.abs(v_rows[:, 0:2])], axis=1)
    W = v_rows.shape[1]
    cs = jnp.concatenate(
        [jnp.zeros((1, W), v_rows.dtype), jnp.cumsum(v_rows, axis=0)], axis=0
    )  # [A+1, W]
    v_gauss = cs[gauss_bounds[:, 1]] - cs[gauss_bounds[:, 0]]  # [I*N, W]

    v_m2 = v_gauss[:, 0:2]
    v_cn = v_gauss[:, 2:5]
    v_op = v_gauss[:, 5]
    v_cl = v_gauss[:, 6 : 6 + D]
    v_m2abs = v_gauss[:, 6 + D :] if absgrad else jnp.zeros((IN, 2), v_m2.dtype)

    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (
        v_m2, v_cn, v_cl, v_op, v_m2abs,
        f0(ids_data), f0(slot_valid), f0(chunk_starts), f0(n_chunks),
        f0(gauss_bounds),
    )


_rasterize_core.defvjp(_core_fwd, _core_bwd)


def rasterize_to_pixels(
    means2d: jax.Array,  # [I, N, 2]
    conics: jax.Array,  # [I, N, 3]
    colors: jax.Array,  # [I, N, D]
    opacities: jax.Array,  # [I, N]
    image_width: int,
    image_height: int,
    isects: Isects,
    worklist: Optional[TileWorklist] = None,
    backgrounds: Optional[jax.Array] = None,  # [I, D]
    masks: Optional[jax.Array] = None,  # [I, th, tw] bool
    tile_size: int = TILE,
    chunk: int = DEFAULT_CHUNK,
    absgrad: bool = False,
    means2d_abs: Optional[jax.Array] = None,  # [I, N, 2] absgrad carrier
) -> Tuple[jax.Array, jax.Array]:
    """Rasterize depth-sorted gaussians to images.

    Returns (render_colors [I, H, W, D], render_alphas [I, H, W, 1]).
    Parity: gsplat/cuda/_wrapper.py:rasterize_to_pixels (:1337). The Pallas
    path currently requires tile_size == 16.
    """
    assert tile_size == TILE, "Pallas rasterizer requires tile_size == 16"
    assert chunk % 128 == 0, "chunk must be a multiple of 128 (DMA lane width)"
    assert isects.tile_keys.shape[0] % chunk == 0, (
        "isect capacity must be a multiple of chunk"
    )
    I, N = means2d.shape[0], means2d.shape[1]
    D = colors.shape[-1]
    P = isects.tile_keys.shape[0]
    assert I * N < 2**24, (
        "float transport of gaussian ids requires I*N < 2**24; "
        "use channel/image chunking for larger workloads"
    )
    th = -(-image_height // tile_size)
    tw = -(-image_width // tile_size)
    T = I * th * tw

    if worklist is None:
        worklist = build_tile_worklist(isects.tile_keys, T, chunk)
    assert worklist.chunk_starts.shape[0] == T, (
        "worklist was built for a different tile grid"
    )

    n_chunks = worklist.n_chunks
    if masks is not None:
        n_chunks = jnp.where(masks.reshape(T), n_chunks, 0)

    # transport sorted flatten ids to aligned order with one packed
    # row-gather (bit-exact via bitcast; column gathers are slow on TPU)
    sorted_pack = jnp.stack(
        [
            _bitcast_f32(isects.flatten_ids),
            isects.depth_keys,
            _bitcast_f32(isects.tile_keys),
            jnp.zeros_like(isects.depth_keys),
        ],
        axis=1,
    )  # [P, 4]
    aligned_pack = sorted_pack[worklist.src_idx]  # [A, 4]
    ids_raw = _bitcast_i32(aligned_pack[:, 0])
    ids_data = jnp.where(worklist.valid, ids_raw, 0)

    # per-gaussian emission-run boundaries (for the backward reduction),
    # clamped for capacity overflow
    cnt = isects.tiles_per_gauss.reshape(I * N)
    cum = jnp.cumsum(cnt)
    n_live = jnp.minimum(isects.n_isects, P)
    ends = jnp.minimum(cum, n_live)
    starts = jnp.minimum(cum - cnt, n_live)
    gauss_bounds = jnp.stack([starts, ends], axis=1).astype(jnp.int32)

    if means2d_abs is None:
        means2d_abs = jnp.zeros((I * N, 2), means2d.dtype)
    pix_out, t_final = _rasterize_core(
        means2d.reshape(I * N, 2),
        conics.reshape(I * N, 3),
        colors.reshape(I * N, D),
        opacities.reshape(I * N),
        means2d_abs.reshape(I * N, 2),
        ids_data,
        worklist.valid,
        worklist.chunk_starts,
        n_chunks,
        gauss_bounds,
        chunk,
        D,
        tw,
        th * tw,
        (image_width, image_height),
        absgrad,
    )

    render = untile_image(pix_out, I, th, tw, image_height, image_width)
    t_img = untile_image(t_final, I, th, tw, image_height, image_width)
    render_alphas = 1.0 - t_img
    if backgrounds is not None:
        render = render + t_img * backgrounds[:, None, None, :]
    return render, render_alphas
