"""2DGS (surfel) projection: ray-transform matrices, normals, screen AABBs.

Behavior parity (independently implemented):
  - gsplat/cuda/_torch_impl_2dgs.py:_fully_fused_projection_2dgs (:27-108)
    (the reference's own test oracle) and
    gsplat/cuda/csrc/Projection2DGSFused.cu.

The surfel is the z=0 plane of the gaussian's local frame; M maps pixel-
space homogeneous coordinates into that local (u, v) frame. Everything here
is elementwise jnp — XLA fuses it, autodiff provides the backward.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .math import quat_to_rotmat

GAUSSIAN_EXTEND_2D = 3.33


def fully_fused_projection_2dgs(
    means: jax.Array,  # [..., N, 3]
    quats: jax.Array,  # [..., N, 4]
    scales: jax.Array,  # [..., N, 3] (activated; z scale unused)
    viewmats: jax.Array,  # [..., C, 4, 4]
    Ks: jax.Array,  # [..., C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    eps: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Project surfels to (radii, means2d, depths, ray_transforms, normals).

    Returns radii int32 [..., C, N, 2], means2d [..., C, N, 2], depths
    [..., C, N], ray_transforms M [..., C, N, 3, 3] (the paper's
    M = (WH)^T, already re-transposed like the reference output), and
    camera-frame normals [..., C, N, 3] (sign-flipped toward the camera).
    """
    R_cw = viewmats[..., :3, :3]  # [..., C, 3, 3]
    t_cw = viewmats[..., :3, 3]  # [..., C, 3]
    means_c = (
        jnp.einsum("...cij,...nj->...cni", R_cw, means, precision="highest")
        + t_cw[..., None, :]
    )  # [..., C, N, 3]

    R_wl = quat_to_rotmat(quats)  # [..., N, 3, 3]
    RS_wl = R_wl * scales[..., None, :]
    RS_cl = jnp.einsum(
        "...cij,...njk->...cnik", R_cw, RS_wl, precision="highest"
    )  # [..., C, N, 3, 3]

    # normals: local z axis, flipped toward the camera
    normals = RS_cl[..., 2]  # [..., C, N, 3]
    cos = -jnp.sum(normals * means_c, axis=-1, keepdims=True)
    normals = normals * jnp.where(cos > 0, 1.0, -1.0)

    # ray-transform: T = K [RS_:2 | mean_c]; M = T^T
    T_cl = jnp.concatenate(
        [RS_cl[..., :2], means_c[..., None]], axis=-1
    )  # [..., C, N, 3, 3]
    T_sl = jnp.einsum(
        "...cij,...cnjk->...cnik", Ks, T_cl, precision="highest"
    )
    M = jnp.swapaxes(T_sl, -1, -2)  # [..., C, N, 3, 3]

    # screen AABB from homogeneous extents
    test = jnp.asarray([1.0, 1.0, -1.0], M.dtype)
    d = jnp.sum(M[..., 2] * M[..., 2] * test, axis=-1, keepdims=True)
    valid = jnp.abs(d) > eps
    f = jnp.where(valid, test / jnp.where(d == 0, 1.0, d), 0.0)[..., None]
    means2d = jnp.sum(M[..., :2] * M[..., 2:3] * f, axis=-2)  # [..., C, N, 2]
    extents = jnp.sqrt(
        jnp.maximum(
            means2d**2 - jnp.sum(M[..., :2] * M[..., :2] * f, axis=-2),
            1e-4,
        )
    )

    depths = means_c[..., 2]
    radius = jnp.ceil(GAUSSIAN_EXTEND_2D * extents)

    ok = (
        valid[..., 0]
        & (depths > near_plane)
        & (depths < far_plane)
        & (means2d[..., 0] + radius[..., 0] > 0)
        & (means2d[..., 0] - radius[..., 0] < width)
        & (means2d[..., 1] + radius[..., 1] > 0)
        & (means2d[..., 1] - radius[..., 1] < height)
    )
    radii = jnp.where(ok[..., None], radius, 0.0).astype(jnp.int32)

    # reference returns M re-transposed (torch_impl :106-107)
    M_out = jnp.swapaxes(M, -1, -2)
    return radii, means2d, depths, M_out, normals
