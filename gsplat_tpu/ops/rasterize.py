"""rasterize_to_pixels: the differentiable tile rasterization op.

Public analog of gsplat/cuda/_wrapper.py:rasterize_to_pixels (:1337) with a
jax.custom_vjp around an entirely gather-free TPU pipeline (XLA gathers run
at per-element speed on TPU — every large reorder here is either a sort or
a Pallas windowed one-hot MXU selection, see ops/gather_pallas.py):

  forward:
    1. emission plan (XLA elementwise + cumsum): per-gaussian tile rects,
       emission runs, per-chunk source windows. Every gaussian emits
       max(tiles_covered, 1) slots; culled gaussians emit one sentinel-keyed
       dummy so windows stay bounded.
    2. expand_emission (Pallas): per-slot (tile_key, depth, flat_id) +
       render fields, field-major.
    3. jax.lax.sort by (tile_key, depth) with the fields as payload — the
       TPU replacement for the CUB radix sort (IntersectTile.cu:1078).
    4. tile worklist bounds (cheap searchsorted) + align_rows (Pallas):
       chunk-aligned per-tile layout [F, A].
    5. Pallas rasterization forward (ops/rasterize_pallas.py).

  backward:
    Pallas rasterization backward emits per-slot gradients [F, A]; they are
    payload-sorted by gaussian id and reduced with a cumulative-sum
    difference at per-gaussian run boundaries — deterministic, no atomics
    (a correctness upgrade over the CUDA atomicAdd path).

Images are computed in a tiled [n_tiles, D, 256] layout inside the kernels
and reassembled here (tile_image/untile_image); background blending and
alpha composition happen in plain jnp outside the custom_vjp (autodiff).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gather_pallas import (
    CH,
    LANE,
    W_A,
    _hi_lo,
    _recombine,
    align_rows,
    expand_emission,
)
from .isect import build_tile_worklist
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class EmissionPlan(NamedTuple):
    """Static-shape tile-emission layout (all int32, non-differentiable).

    Parity for the counting pass of gsplat/cuda/csrc/IntersectTile.cu:96-213
    (AABB coverage, matching _torch_impl.py:_isect_tiles) plus the TPU
    additions: min-one-emission runs and per-chunk source windows.
    """

    cnt: jax.Array  # [E] real tile count (0 for culled)
    cum_ex: jax.Array  # [E] exclusive cumsum of max(cnt, 1)
    cum_in: jax.Array  # [E] inclusive cumsum of max(cnt, 1)
    tminx: jax.Array  # [E]
    tminy: jax.Array  # [E]
    w_rect: jax.Array  # [E] (>= 1)
    im: jax.Array  # [E] image id (== I for culled -> sentinel keys)
    win_starts: jax.Array  # [K] source window base rows (LANE-aligned)
    n_slots: jax.Array  # [] emission slots incl. dummies (<= cap_total)
    n_isects: jax.Array  # [] real intersections (pre-truncation)
    overflow: jax.Array  # [] bool


def make_emission_plan(
    means2d: jax.Array,  # [I, N, 2]
    radii: jax.Array,  # [I, N, 2] int32
    tile_size: int,
    tile_width: int,
    tile_height: int,
    cap_total: int,
) -> EmissionPlan:
    I, N = means2d.shape[0], means2d.shape[1]
    E = I * N
    m2 = jax.lax.stop_gradient(means2d).reshape(E, 2)
    rad = radii.reshape(E, 2)

    tmean = m2 / tile_size
    trad = rad.astype(m2.dtype) / tile_size
    tmin = jnp.floor(tmean - trad).astype(jnp.int32)
    tmax = jnp.ceil(tmean + trad).astype(jnp.int32)
    tminx = jnp.clip(tmin[:, 0], 0, tile_width)
    tminy = jnp.clip(tmin[:, 1], 0, tile_height)
    tmaxx = jnp.clip(tmax[:, 0], 0, tile_width)
    tmaxy = jnp.clip(tmax[:, 1], 0, tile_height)
    w = tmaxx - tminx
    h = tmaxy - tminy
    alive = (rad > 0).all(axis=-1) & (w > 0) & (h > 0)
    cnt = jnp.where(alive, w * h, 0).astype(jnp.int32)

    cnt_p = jnp.maximum(cnt, 1)  # culled gaussians emit one dummy slot
    cum_in = jnp.cumsum(cnt_p).astype(jnp.int32)
    cum_ex = cum_in - cnt_p
    total = cum_in[-1]
    n_isects = jnp.sum(cnt).astype(jnp.int32)
    overflow = total > cap_total
    n_slots = jnp.minimum(total, cap_total)

    e_ids = jnp.arange(E, dtype=jnp.int32)
    im = jnp.where(alive, e_ids // N, I).astype(jnp.int32)
    tminx = jnp.where(alive, tminx, 0)
    tminy = jnp.where(alive, tminy, 0)
    w_rect = jnp.where(alive, jnp.maximum(w, 1), 1).astype(jnp.int32)

    K = cap_total // CH
    probes = jnp.arange(K, dtype=jnp.int32) * CH
    first = jnp.searchsorted(cum_in, probes, side="right").astype(jnp.int32)
    win = (first // LANE) * LANE
    win = jnp.clip(win, 0, E + W_A - W_A)  # E_pad = E + W_A

    return EmissionPlan(
        cnt=cnt, cum_ex=cum_ex, cum_in=cum_in, tminx=tminx, tminy=tminy,
        w_rect=w_rect, im=im, win_starts=win, n_slots=n_slots,
        n_isects=n_isects, overflow=overflow,
    )


def _pad_tail(x: jax.Array, n: int, value) -> jax.Array:
    return jnp.concatenate([x, jnp.full((n,), value, x.dtype)])


def expand_sort_align(
    field_rows,  # list of [E] f32 arrays (render fields, sanitized)
    depthf: jax.Array,  # [E] f32 (non-negative sort key)
    cnt, cum_ex, cum_in, rect_rows,  # plan arrays
    win_starts, n_slots_arr,
    cap_total: int,
    tile_width: int,
    tile_height: int,
    n_images: int,
):
    """Emission-expand, depth-sort, and chunk-align arbitrary field rows.

    The generic middle of the rasterization pipeline (kernel A -> payload
    sort -> worklist -> kernel B); shared by the 3DGS and 2DGS paths.
    Returns (aligned [F_s, A], ids_aligned [A], worklist).
    """
    R = len(field_rows)
    r_pad = _round_up(R + 5, 8)
    T = n_images * tile_width * tile_height
    K = cap_total // CH

    exh, exl = _hi_lo(cum_ex)
    inh, inl = _hi_lo(cum_in)
    tot_hi, tot_lo = _hi_lo(cum_in[-1:])
    pad_hi = jnp.broadcast_to(tot_hi, (W_A,))
    pad_lo = jnp.broadcast_to(tot_lo, (W_A,))
    f32 = lambda v: v.astype(jnp.float32)
    rows = [
        jnp.concatenate([exh, pad_hi]), jnp.concatenate([exl, pad_lo]),
        jnp.concatenate([inh, pad_hi]), jnp.concatenate([inl, pad_lo]),
        _pad_tail(f32(rect_rows[0]), W_A, 0.0),
        _pad_tail(f32(rect_rows[1]), W_A, 0.0),
        _pad_tail(f32(rect_rows[2]), W_A, 1.0),
        _pad_tail(f32(rect_rows[3]), W_A, float(n_images)),
        _pad_tail(depthf, W_A, 0.0),
    ] + [_pad_tail(r, W_A, 0.0) for r in field_rows]
    F_tab = _round_up(len(rows), 8)
    table = jnp.stack(
        rows + [jnp.zeros_like(rows[0])] * (F_tab - len(rows))
    )

    keys, depth_keys, flat_ids, fields = expand_emission(
        table, win_starts, n_slots_arr,
        n_render=R, r_pad=r_pad, tile_w=tile_width,
        tiles_per_im=tile_width * tile_height, sentinel=T, k=K,
    )

    operands = (keys, depth_keys, flat_ids) + tuple(
        fields[i] for i in range(R)
    )
    # unstable: (tile, depth) ties can only come from the same gaussian,
    # which emits at most one slot per tile — ordering is already unique
    s = jax.lax.sort(operands, num_keys=2, is_stable=False)
    keys_s, flat_s = s[0], s[2]
    fields_s = s[3:]

    wl = build_tile_worklist(keys_s, T, DEFAULT_CHUNK)
    A = wl.src_idx.shape[0]
    A2 = _round_up(A, CH)
    K2 = A2 // CH
    src = jnp.where(wl.valid, wl.src_idx, -1)
    src = _pad_tail(src, A2 - A, -1).reshape(K2, CH)
    win2 = jnp.min(jnp.where(src >= 0, src, 2**30), axis=1)
    win2 = jnp.clip((win2 // LANE) * LANE, 0, cap_total)

    idh, idl = _hi_lo(flat_s)
    stack_rows = list(fields_s) + [idh, idl]
    F_s = _round_up(len(stack_rows), 8)
    stack_rows += [jnp.zeros_like(idh)] * (F_s - len(stack_rows))
    sorted_rows = jnp.stack([_pad_tail(r, W_A, 0.0) for r in stack_rows])

    aligned = align_rows(sorted_rows, src, win2, k=K2)[:, :A]
    ids_aligned = _recombine(aligned[R], aligned[R + 1])
    return aligned, ids_aligned, wl


def reduce_slot_grads(
    v_aligned,  # [F_s, A] per-slot gradients (rows 0..n_rows-1 live)
    n_rows: int,
    ids_aligned, valid,  # [A]
    cnt, cum_ex, n_slots,  # plan arrays (+ scalar n_slots)
    E: int,
    extra_abs: int = 0,  # also reduce |rows[:extra_abs]| (absgrad)
):
    """Deterministic per-gaussian reduction: payload-sort by id + cumsum
    difference at run boundaries. Returns [E, n_rows (+extra_abs)]."""
    A = ids_aligned.shape[0]
    ids_sort = jnp.where(valid, ids_aligned, E)
    operands = (ids_sort,) + tuple(v_aligned[i] for i in range(n_rows))
    # unstable: within-gaussian run order only permutes the f32 summation
    s = jax.lax.sort(operands, num_keys=1, is_stable=False)
    v_rows = jnp.stack(s[1:], axis=1)  # [A, n_rows]
    if extra_abs:
        v_rows = jnp.concatenate(
            [v_rows, jnp.abs(v_rows[:, :extra_abs])], axis=1
        )
    Wc = v_rows.shape[1]
    cs = jnp.concatenate(
        [jnp.zeros((1, Wc), v_rows.dtype), jnp.cumsum(v_rows, axis=0)],
        axis=0,
    )
    vrc = jnp.clip(jnp.minimum(cum_ex + cnt, n_slots) - cum_ex, 0, cnt)
    ends = jnp.cumsum(vrc).astype(jnp.int32)
    starts = ends - vrc
    return cs[ends] - cs[starts]  # [E, Wc]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17, 18)
)
def _rasterize_core(
    m2f,  # [E, 2]
    cnf,  # [E, 3]
    clf,  # [E, D]
    opf,  # [E]
    m2abs,  # [E, 2] absgrad carrier (value unused; cotangent = abs grads)
    depthf,  # [E] (non-diff sort key; stop_gradient'ed by callers)
    cnt, cum_ex, cum_in, rect_rows,  # plan arrays (int32)
    win_starts, n_slots_arr,  # [K], [1]
    cap_total: int,
    n_channels: int,
    tile_width: int,
    tile_height: int,
    n_images: int,
    image_size: Tuple[int, int],
    absgrad: bool,
):
    out, _ = _core_fwd(
        m2f, cnf, clf, opf, m2abs, depthf, cnt, cum_ex, cum_in, rect_rows,
        win_starts, n_slots_arr, cap_total, n_channels, tile_width,
        tile_height, n_images, image_size, absgrad,
    )
    return out


def _core_fwd(
    m2f, cnf, clf, opf, m2abs, depthf, cnt, cum_ex, cum_in, rect_rows,
    win_starts, n_slots_arr,
    cap_total, n_channels, tile_width, tile_height, n_images, image_size,
    absgrad,
):
    width, height = image_size
    D = n_channels

    # Culled gaussians may carry NaN/inf fields (e.g. degenerate quats
    # project to NaN conics; the reference never touches culled gaussians
    # either). They MUST be zeroed here: the one-hot selection matmul
    # multiplies every window entry by 0/1 and sums, and 0 * NaN = NaN
    # would poison every slot whose window contains them.
    ok = cnt > 0
    m2f = jnp.where(ok[:, None], m2f, 0.0)
    cnf = jnp.where(ok[:, None], cnf, 0.0)
    clf = jnp.where(ok[:, None], clf, 0.0)
    opf = jnp.where(ok, opf, 0.0)
    depthf = jnp.where(ok, depthf, 0.0)

    field_rows = [
        m2f[:, 0], m2f[:, 1], cnf[:, 0], cnf[:, 1], cnf[:, 2], opf,
    ] + [clf[:, i] for i in range(D)]
    aligned, ids_aligned, wl = expand_sort_align(
        field_rows, depthf, cnt, cum_ex, cum_in, rect_rows,
        win_starts, n_slots_arr, cap_total, tile_width, tile_height,
        n_images,
    )

    pix_out, t_final = _fwd_call(
        aligned, wl.chunk_starts, wl.n_chunks,
        chunk=DEFAULT_CHUNK, n_channels=D, tiles_w=tile_width,
        tiles_per_image=tile_width * tile_height, width=width, height=height,
        n_tiles=n_images * tile_width * tile_height,
    )

    res = (
        aligned, ids_aligned, wl.valid, wl.chunk_starts, wl.n_chunks,
        cnt, cum_ex, n_slots_arr, pix_out, t_final,
    )
    return (pix_out, t_final), res


def _core_bwd(
    cap_total, n_channels, tile_width, tile_height, n_images, image_size,
    absgrad, res, cts,
):
    (
        aligned, ids_aligned, valid, chunk_starts, n_chunks,
        cnt, cum_ex, n_slots_arr, pix_out, t_final,
    ) = res
    v_pix, v_tfinal = cts
    width, height = image_size
    D = n_channels
    A = ids_aligned.shape[0]
    E = cnt.shape[0]
    T = n_images * tile_width * tile_height

    (v_aligned,) = _bwd_call(
        aligned, chunk_starts, n_chunks, v_pix, v_tfinal, pix_out, t_final,
        chunk=DEFAULT_CHUNK, n_channels=D, tiles_w=tile_width,
        tiles_per_image=tile_width * tile_height, width=width, height=height,
        n_tiles=T,
    )  # [F_s, A] per-slot grads, field-major (rows 0..5+D live)

    v_gauss = reduce_slot_grads(
        v_aligned, 6 + D, ids_aligned, valid, cnt, cum_ex,
        n_slots_arr[0], E, extra_abs=2 if absgrad else 0,
    )

    v_m2 = v_gauss[:, 0:2]
    v_cn = v_gauss[:, 2:5]
    v_op = v_gauss[:, 5]
    v_cl = v_gauss[:, 6 : 6 + D]
    v_m2abs = (
        v_gauss[:, 6 + D :] if absgrad else jnp.zeros((E, 2), v_m2.dtype)
    )

    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    zero_depth = jnp.zeros((E,), v_m2.dtype)
    return (
        v_m2, v_cn, v_cl, v_op, v_m2abs, zero_depth,
        f0(cnt), f0(cum_ex), f0(cum_ex), f0(jnp.zeros((4, E), jnp.int32)),
        f0(jnp.zeros((cap_total // CH,), jnp.int32)),
        f0(jnp.zeros((1,), jnp.int32)),
    )


_rasterize_core.defvjp(_core_fwd, _core_bwd)


def rasterize_to_pixels(
    means2d: jax.Array,  # [I, N, 2]
    conics: jax.Array,  # [I, N, 3]
    colors: jax.Array,  # [I, N, D]
    opacities: jax.Array,  # [I, N]
    image_width: int,
    image_height: int,
    radii: jax.Array,  # [I, N, 2] int32 (0 = culled)
    depths: jax.Array,  # [I, N]
    isect_capacity: int,
    backgrounds: Optional[jax.Array] = None,  # [I, D]
    masks: Optional[jax.Array] = None,  # [I, th, tw] bool
    tile_size: int = TILE,
    absgrad: bool = False,
    means2d_abs: Optional[jax.Array] = None,  # [I, N, 2] absgrad carrier
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Rasterize projected gaussians to images (sorting included).

    Returns (render_colors [I, H, W, D], render_alphas [I, H, W, 1], aux)
    with aux = {n_isects, isect_overflow, tiles_per_gauss}. `isect_capacity`
    bounds the REAL intersections; the internal buffer adds one dummy slot
    per gaussian (static shapes). Parity:
    gsplat/cuda/_wrapper.py:rasterize_to_pixels (:1337) + isect_tiles.
    """
    assert tile_size == TILE, "Pallas rasterizer requires tile_size == 16"
    I, N = means2d.shape[0], means2d.shape[1]
    E = I * N
    D = colors.shape[-1]
    th = -(-image_height // tile_size)
    tw = -(-image_width // tile_size)
    T = I * th * tw
    cap_total = _round_up(isect_capacity + E, CH)

    plan = make_emission_plan(
        means2d, radii, tile_size, tw, th, cap_total
    )

    if means2d_abs is None:
        means2d_abs = jnp.zeros((E, 2), means2d.dtype)

    rect_rows = jnp.stack([plan.tminx, plan.tminy, plan.w_rect, plan.im])

    # tile masks enter through the worklist chunk counts — but those are
    # computed inside the core; thread them via opacity zeroing instead:
    # masked tiles must render pure background with zero alpha
    # (Fwd.cu:141-158), which the outer mask application below guarantees.
    pix_out, t_final = _rasterize_core(
        means2d.reshape(E, 2),
        conics.reshape(E, 3),
        colors.reshape(E, D),
        opacities.reshape(E),
        means2d_abs.reshape(E, 2),
        jax.lax.stop_gradient(depths).reshape(E),
        plan.cnt, plan.cum_ex, plan.cum_in, rect_rows,
        plan.win_starts, plan.n_slots.reshape(1),
        cap_total, D, tw, th, I, (image_width, image_height), absgrad,
    )

    render = untile_image(pix_out, I, th, tw, image_height, image_width)
    t_img = untile_image(t_final, I, th, tw, image_height, image_width)
    render_alphas = 1.0 - t_img
    if backgrounds is not None:
        render = render + t_img * backgrounds[:, None, None, :]
    if masks is not None:
        # masked-off tiles show pure background with zero alpha
        mpix = jnp.repeat(
            jnp.repeat(masks, tile_size, axis=1), tile_size, axis=2
        )[:, :image_height, :image_width, None]
        bg = (
            backgrounds[:, None, None, :]
            if backgrounds is not None
            else jnp.zeros((I, 1, 1, D), render.dtype)
        )
        render = jnp.where(mpix, render, bg)
        render_alphas = jnp.where(mpix, render_alphas, 0.0)

    aux = {
        "n_isects": plan.n_isects,
        "isect_overflow": plan.overflow,
        "tiles_per_gauss": plan.cnt.reshape(I, N),
    }
    return render, render_alphas, aux
