"""Per-view 3D bilateral grids for in-training color correction.

Parity: examples/lib_bilagrid.py in the reference (BilateralGrid :177,
slice :110, total_variation_loss :91, color_affine_transform) — a learnable
low-resolution grid of 3x4 color affine transforms per training view,
sliced per pixel by (x, y, luminance) with trilinear interpolation
(grid_sample semantics: bilinear, align_corners=True, border padding).

TPU-first design: `F.grid_sample` is a per-pixel gather, which is the
slowest primitive on TPU (~1.5 ns/element).  We never gather.  Trilinear
interpolation factorizes as

    A(p) = sum_l hat_l(z_p) * [B_y G_l B_x^T](p)

so the full-image path is, per guidance level `l`, two small dense
matmuls (the separable bilinear spatial resize of the level's (H_g, W_g,
12) map onto the pixel lattice — MXU work) followed by a VPU
multiply-accumulate with the per-pixel luminance hat weights; a
`lax.scan` over the L levels keeps peak memory at one (H, W, 12) map.
The sampled-point path builds the per-point kronecker weight row
(P, H_g*W_g) once and runs one (P, H_g*W_g) @ (H_g*W_g, 12) matmul per
level under the same scan.

Grid layout is channel-last (N, L, H_g, W_g, 12) — the reference keeps
(N, 12, L, H, W) for grid_sample; channel-last keeps the 12 affine
coefficients in lanes on TPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# BT601 luma weights, as in the reference (lib_bilagrid.py:206).
_RGB2GRAY = (0.299, 0.587, 0.114)


def init_bilateral_grids(
    num: int, grid_x: int = 16, grid_y: int = 16, grid_w: int = 8
) -> jax.Array:
    """Identity-affine grids of shape (num, grid_w, grid_y, grid_x, 12).

    Parity: BilateralGrid._init_identity_grid (lib_bilagrid.py:209).
    """
    ident = jnp.array(
        [1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0], dtype=jnp.float32
    )
    return jnp.broadcast_to(ident, (num, grid_w, grid_y, grid_x, 12))


def color_affine_transform(affine: jax.Array, rgb: jax.Array) -> jax.Array:
    """Apply per-pixel 3x4 affine transforms to RGB values.

    affine: (..., 12) rows of a 3x4 matrix [M | t]; rgb: (..., 3).
    """
    mats = affine.reshape(affine.shape[:-1] + (3, 4))
    return jnp.einsum("...ij,...j->...i", mats[..., :3], rgb) + mats[..., 3]


def total_variation_loss(grids: jax.Array) -> jax.Array:
    """Mean-squared-difference TV over the three grid dimensions.

    Parity: lib_bilagrid.py:91 — for each non-batch, non-channel axis,
    sum of squared neighbor differences normalized by the element count
    of the difference tensor *including* the channel dim, summed over
    axes, divided by the batch size.  Our layout is (N, L, H, W, 12)
    with channels last (the reference's is (N, 12, L, H, W)); the math
    is layout-independent.
    """
    n = grids.shape[0]
    tv = jnp.float32(0.0)
    for axis in (1, 2, 3):
        size = grids.shape[axis]
        a = jax.lax.slice_in_dim(grids, 1, size, axis=axis)
        b = jax.lax.slice_in_dim(grids, 0, size - 1, axis=axis)
        count = max(a.size // n, 1)
        tv = tv + jnp.sum((a - b) ** 2) / count
    return tv / n


def _axis_weights(coords: jax.Array, size: int) -> jax.Array:
    """Linear-interpolation hat weights onto `size` grid points.

    `coords` in [-1, 1] map to grid positions u = (c+1)/2 * (size-1)
    (grid_sample align_corners=True); out-of-range coords clamp to the
    border (padding_mode='border').  Returns (..., size) with (at most)
    two nonzeros per row — built vectorized, no gathers.
    """
    u = (coords + 1.0) * 0.5 * (size - 1)
    u = jnp.clip(u, 0.0, float(size - 1))
    idx = jnp.arange(size, dtype=coords.dtype)
    w = 1.0 - jnp.abs(u[..., None] - idx)
    return jnp.maximum(w, 0.0)


def rgb_to_guidance(rgb: jax.Array) -> jax.Array:
    """Gray-scale guidance in [-1, 1] (lib_bilagrid.py:207)."""
    gray = (
        rgb[..., 0] * _RGB2GRAY[0]
        + rgb[..., 1] * _RGB2GRAY[1]
        + rgb[..., 2] * _RGB2GRAY[2]
    )
    return gray * 2.0 - 1.0


def slice_image(grid: jax.Array, rgb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Slice one bilateral grid over a full image lattice.

    grid: (L, H_g, W_g, 12); rgb: (H, W, 3) in [0, 1].  Pixel centers map
    to xy in [0, 1] as (j + 0.5)/W, (i + 0.5)/H (the reference trainer
    feeds the same normalized meshgrid).  Returns (rgb_out (H, W, 3),
    affine (H, W, 12)).
    """
    L, Hg, Wg, _ = grid.shape
    H, W = rgb.shape[:2]
    ys = ((jnp.arange(H, dtype=jnp.float32) + 0.5) / H) * 2.0 - 1.0
    xs = ((jnp.arange(W, dtype=jnp.float32) + 0.5) / W) * 2.0 - 1.0
    by = _axis_weights(ys, Hg)  # (H, Hg)
    bx = _axis_weights(xs, Wg)  # (W, Wg)
    z = rgb_to_guidance(rgb)  # (H, W)
    wz = _axis_weights(z, L)  # (H, W, L)

    def level(acc, args):
        g_l, wz_l = args  # (Hg, Wg, 12), (H, W)
        # separable bilinear resize onto the pixel lattice: two matmuls
        m = jnp.einsum("yh,hwc->ywc", by, g_l)  # (H, Wg, 12)
        m = jnp.einsum("xw,ywc->yxc", bx, m)  # (H, W, 12)
        return acc + m * wz_l[..., None], None

    wz_first = jnp.moveaxis(wz, -1, 0)  # (L, H, W)
    acc = jnp.zeros((H, W, 12), jnp.float32)
    affine, _ = jax.lax.scan(level, acc, (grid, wz_first))
    return color_affine_transform(affine, rgb), affine


def slice_points(
    grids: jax.Array, xy: jax.Array, rgb: jax.Array, grid_idx: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Slice per-point from a batch of grids (random-ray training).

    grids: (N, L, Hg, Wg, 12); xy: (P, 2) in [0, 1]; rgb: (P, 3);
    grid_idx: (P,) int32.  Parity: lib_bilagrid.py slice() :110 (the
    mixed-view branch).  Per-point grid selection is a (P, N) one-hot
    contraction folded into the weight row — still no gathers.
    """
    N, L, Hg, Wg, _ = grids.shape
    P = xy.shape[0]
    bx = _axis_weights(xy[:, 0] * 2.0 - 1.0, Wg)  # (P, Wg)
    by = _axis_weights(xy[:, 1] * 2.0 - 1.0, Hg)  # (P, Hg)
    wz = _axis_weights(rgb_to_guidance(rgb), L)  # (P, L)
    onehot = (
        grid_idx[:, None] == jnp.arange(N, dtype=grid_idx.dtype)[None, :]
    ).astype(jnp.float32)  # (P, N)
    # per-point spatial weight row over the (Hg*Wg) cells
    wyx = jnp.einsum("ph,pw->phw", by, bx).reshape(P, Hg * Wg)

    def level(acc, args):
        g_l, wz_l = args  # (N, Hg, Wg, 12), (P,)
        sel = jnp.einsum("pn,nkc->pkc", onehot, g_l.reshape(N, Hg * Wg, 12))
        out = jnp.einsum("pk,pkc->pc", wyx, sel)  # (P, 12)
        return acc + out * wz_l[:, None], None

    wz_first = jnp.moveaxis(wz, -1, 0)  # (L, P)
    grids_first = jnp.moveaxis(grids, 1, 0)  # (L, N, Hg, Wg, 12)
    acc = jnp.zeros((P, 12), jnp.float32)
    affine, _ = jax.lax.scan(level, acc, (grids_first, wz_first))
    return color_affine_transform(affine, rgb), affine
