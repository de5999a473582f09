"""Image-space geometry utilities (depth unprojection, surface normals).

Parity: gsplat/utils.py:depth_to_points / depth_to_normal (:180-250) and the
C++ mirrors depth_to_points_2dgs / depth_to_normal_2dgs
(cuda/csrc/Rendering.cpp:1749-1793).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_to_points(
    depths: jax.Array,  # [..., H, W, 1]
    camtoworlds: jax.Array,  # [..., 4, 4]
    Ks: jax.Array,  # [..., 3, 3]
    z_depth: bool = True,
) -> jax.Array:
    """Unproject a depth map to world-space points [..., H, W, 3]."""
    H, W = depths.shape[-3], depths.shape[-2]
    x = jnp.arange(W, dtype=depths.dtype)
    y = jnp.arange(H, dtype=depths.dtype)
    fx = Ks[..., 0, 0][..., None, None]
    fy = Ks[..., 1, 1][..., None, None]
    cx = Ks[..., 0, 2][..., None, None]
    cy = Ks[..., 1, 2][..., None, None]
    hw = depths.shape[:-1]
    dx = jnp.broadcast_to((x[None, :] - cx + 0.5) / fx, hw)  # [..., H, W]
    dy = jnp.broadcast_to((y[:, None] - cy + 0.5) / fy, hw)
    dirs = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)  # [..., H, W, 3]
    if not z_depth:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    R = camtoworlds[..., :3, :3]
    t = camtoworlds[..., :3, 3]
    world_dirs = jnp.einsum("...ij,...hwj->...hwi", R, dirs)
    return t[..., None, None, :] + depths * world_dirs


def depth_to_normal(
    depths: jax.Array,  # [..., H, W, 1]
    camtoworlds: jax.Array,  # [..., 4, 4]
    Ks: jax.Array,  # [..., 3, 3]
    z_depth: bool = True,
) -> jax.Array:
    """Surface normals from a depth map via point-difference cross products.

    Returns [..., H, W, 3], zero-padded at the 1-pixel border.
    """
    pts = depth_to_points(depths, camtoworlds, Ks, z_depth=z_depth)
    dx = pts[..., 2:, 1:-1, :] - pts[..., :-2, 1:-1, :]
    dy = pts[..., 1:-1, 2:, :] - pts[..., 1:-1, :-2, :]
    n = jnp.cross(dx, dy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    pad = [(0, 0)] * (n.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    return jnp.pad(n, pad)
