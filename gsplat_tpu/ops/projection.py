"""Fused EWA projection of 3D Gaussians to 2D screen-space conics.

TPU-native formulation: fully scalarized elementwise jnp (no tiny-matrix
batched matmuls), so XLA fuses the whole projection into one VPU loop and
autodiff provides the backward for free.

Behavior parity (semantics only; independently implemented):
  - gsplat/cuda/csrc/ProjectionEWA3DGSFused.cu:38-219 (fwd math, culling,
    opacity-aware radius, compensation).
  - gsplat/cuda/_torch_impl.py:_persp_proj/_fisheye_proj/_ortho_proj/
    _world_to_cam/_fully_fused_projection (the test oracle of the reference).

Conventions:
  - conics are the upper triangle (a, b, c) of the inverse blurred 2D
    covariance; sigma(p) = 0.5*(a*dx^2 + c*dy^2) + b*dx*dy.
  - radii are int32 [..., C, N, 2]; 0 marks a culled Gaussian.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .math import _sym_mmT, quat_to_rotmat, triu_to_full

# Parity constants: gsplat/cuda/_constants.py and gsplat/cuda/include/Common.h:99
ALPHA_THRESHOLD = 1.0 / 255.0
MAX_ALPHA = 0.99
TRANSMITTANCE_THRESHOLD = 1e-4
MIN_COMPENSATION = 0.005
GAUSSIAN_EXTEND = 3.33


def _covar_world_from_inputs(
    covars: Optional[jax.Array],
    quats: Optional[jax.Array],
    scales: Optional[jax.Array],
) -> jax.Array:
    """World covariance [..., N, 3, 3] from either covars or (quats, scales)."""
    if covars is not None:
        if covars.shape[-1] == 6:
            return triu_to_full(covars)
        return covars
    assert quats is not None and scales is not None
    R = quat_to_rotmat(quats)  # [..., N, 3, 3]
    M = R * scales[..., None, :]
    return _sym_mmT(M)  # scalarized: full f32, VPU-only


def _world_to_cam_scalar(means, covar_w, viewmats):
    """World->cam for means + symmetric covariance, scalarized.

    Returns means_c components (tx, ty, tz) each [..., C, N] and the six
    camera-frame covariance entries (s00, s01, s02, s11, s12, s22).
    Parity: gsplat/cuda/_torch_impl.py:_world_to_cam.
    """
    R = viewmats[..., :3, :3]  # [..., C, 3, 3]
    t = viewmats[..., :3, 3]  # [..., C, 3]
    # means_c[c, n, i] = R[c, i, :] . means[n, :] + t[c, i]
    mx, my, mz = (means[..., None, :, i] for i in range(3))  # [..., 1, N]
    Rc = [[R[..., i, j][..., None] for j in range(3)] for i in range(3)]
    tx = Rc[0][0] * mx + Rc[0][1] * my + Rc[0][2] * mz + t[..., 0:1]
    ty = Rc[1][0] * mx + Rc[1][1] * my + Rc[1][2] * mz + t[..., 1:2]
    tz = Rc[2][0] * mx + Rc[2][1] * my + Rc[2][2] * mz + t[..., 2:3]

    # covar_c = R S R^T, using B = R S (S symmetric).
    S = [
        [covar_w[..., None, :, i, j] for j in range(3)] for i in range(3)
    ]  # each [..., 1, N]

    def rowdot(i, j):  # B[i][j] = sum_k R[i,k] S[k,j]
        return Rc[i][0] * S[0][j] + Rc[i][1] * S[1][j] + Rc[i][2] * S[2][j]

    B = [[rowdot(i, j) for j in range(3)] for i in range(3)]

    def sym(i, l):  # (B R^T)[i,l] = sum_k B[i,k] R[l,k]
        return B[i][0] * Rc[l][0] + B[i][1] * Rc[l][1] + B[i][2] * Rc[l][2]

    return (tx, ty, tz), (sym(0, 0), sym(0, 1), sym(0, 2), sym(1, 1), sym(1, 2), sym(2, 2))


def _persp_proj_scalar(tx, ty, tz, S, Ks, width, height):
    """Perspective EWA projection, scalarized.

    Parity: gsplat/cuda/_torch_impl.py:_persp_proj (incl. the 0.3*tan_fov
    frustum-margin clamp of tx/ty used for the Jacobian only).
    """
    s00, s01, s02, s11, s12, s22 = S
    fx = Ks[..., 0, 0][..., None]
    fy = Ks[..., 1, 1][..., None]
    cx = Ks[..., 0, 2][..., None]
    cy = Ks[..., 1, 2][..., None]
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy
    txc = tz * jnp.clip(tx / tz, -lim_x_neg, lim_x_pos)
    tyc = tz * jnp.clip(ty / tz, -lim_y_neg, lim_y_pos)

    rz = 1.0 / tz
    rz2 = rz * rz
    j00 = fx * rz
    j02 = -fx * txc * rz2
    j11 = fy * rz
    j12 = -fy * tyc * rz2

    c00 = j00 * (j00 * s00 + j02 * s02) + j02 * (j00 * s02 + j02 * s22)
    c01 = j00 * (j11 * s01 + j12 * s02) + j02 * (j11 * s12 + j12 * s22)
    c11 = j11 * (j11 * s11 + j12 * s12) + j12 * (j11 * s12 + j12 * s22)

    mean2d_x = fx * tx * rz + cx
    mean2d_y = fy * ty * rz + cy
    return (mean2d_x, mean2d_y), (c00, c01, c11)


def _ortho_proj_scalar(tx, ty, tz, S, Ks, width, height):
    """Orthographic projection. Parity: gsplat/cuda/_torch_impl.py:_ortho_proj."""
    s00, s01, s11 = S[0], S[1], S[3]
    fx = Ks[..., 0, 0][..., None]
    fy = Ks[..., 1, 1][..., None]
    cx = Ks[..., 0, 2][..., None]
    cy = Ks[..., 1, 2][..., None]
    return (fx * tx + cx, fy * ty + cy), (fx * fx * s00, fx * fy * s01, fy * fy * s11)


def _fisheye_proj_scalar(tx, ty, tz, S, Ks, width, height):
    """Equidistant fisheye projection. Parity: _torch_impl.py:_fisheye_proj."""
    s00, s01, s02, s11, s12, s22 = S
    fx = Ks[..., 0, 0][..., None]
    fy = Ks[..., 1, 1][..., None]
    cx = Ks[..., 0, 2][..., None]
    cy = Ks[..., 1, 2][..., None]

    eps = 1e-7
    xy_len = jnp.sqrt(tx * tx + ty * ty) + eps
    theta = jnp.arctan2(xy_len, tz + eps)
    m2x = tx * fx * theta / xy_len + cx
    m2y = ty * fy * theta / xy_len + cy

    x2 = tx * tx + eps
    y2 = ty * ty
    xy = tx * ty
    x2y2 = x2 + y2
    x2y2z2_inv = 1.0 / (x2y2 + tz * tz)
    b = jnp.arctan2(xy_len, tz) / xy_len / x2y2
    a = tz * x2y2z2_inv / x2y2
    j00 = fx * (x2 * a + y2 * b)
    j01 = fx * xy * (a - b)
    j02 = -fx * tx * x2y2z2_inv
    j10 = fy * xy * (a - b)
    j11 = fy * (y2 * a + x2 * b)
    j12 = -fy * ty * x2y2z2_inv

    # c = J S J^T for a full 2x3 Jacobian
    r0 = (j00 * s00 + j01 * s01 + j02 * s02,
          j00 * s01 + j01 * s11 + j02 * s12,
          j00 * s02 + j01 * s12 + j02 * s22)
    r1 = (j10 * s00 + j11 * s01 + j12 * s02,
          j10 * s01 + j11 * s11 + j12 * s12,
          j10 * s02 + j11 * s12 + j12 * s22)
    c00 = r0[0] * j00 + r0[1] * j01 + r0[2] * j02
    c01 = r0[0] * j10 + r0[1] * j11 + r0[2] * j12
    c11 = r1[0] * j10 + r1[1] * j11 + r1[2] * j12
    return (m2x, m2y), (c00, c01, c11)


def fully_fused_projection(
    means: jax.Array,  # [..., N, 3]
    covars: Optional[jax.Array],  # [..., N, 6] or [..., N, 3, 3] or None
    quats: Optional[jax.Array],  # [..., N, 4] or None
    scales: Optional[jax.Array],  # [..., N, 3] or None
    viewmats: jax.Array,  # [..., C, 4, 4]
    Ks: jax.Array,  # [..., C, 3, 3]
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    calc_compensations: bool = False,
    camera_model: str = "pinhole",
    opacities: Optional[jax.Array] = None,  # [..., N]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
    """Project 3D Gaussians to per-camera 2D conics, depths and pixel radii.

    Returns (radii int32 [..., C, N, 2], means2d [..., C, N, 2],
    depths [..., C, N], conics [..., C, N, 3], compensations or None).

    Parity: gsplat/cuda/csrc/ProjectionEWA3DGSFused.cu:38-219; the culling
    rules follow the CUDA kernel (strict-inequality frustum test, opacity-
    aware extend per arXiv:2402.00525 B.2, `radius_clip` on both axes,
    depth in (near_plane, far_plane)).
    """
    covar_w = _covar_world_from_inputs(covars, quats, scales)
    (tx, ty, tz), S = _world_to_cam_scalar(means, covar_w, viewmats)

    if camera_model == "pinhole":
        (m2x, m2y), (c00, c01, c11) = _persp_proj_scalar(tx, ty, tz, S, Ks, width, height)
    elif camera_model == "ortho":
        (m2x, m2y), (c00, c01, c11) = _ortho_proj_scalar(tx, ty, tz, S, Ks, width, height)
    elif camera_model == "fisheye":
        (m2x, m2y), (c00, c01, c11) = _fisheye_proj_scalar(tx, ty, tz, S, Ks, width, height)
    else:
        raise ValueError(f"unsupported camera_model: {camera_model!r}")

    det_orig = c00 * c11 - c01 * c01
    b00 = c00 + eps2d
    b11 = c11 + eps2d
    det = b00 * b11 - c01 * c01
    det = jnp.maximum(det, 1e-10)

    compensations = None
    if calc_compensations:
        compensations = jnp.sqrt(
            jnp.maximum(det_orig / det, MIN_COMPENSATION * MIN_COMPENSATION)
        )

    inv_det = 1.0 / det
    conic_a = b11 * inv_det
    conic_b = -c01 * inv_det
    conic_c = b00 * inv_det
    conics = jnp.stack([conic_a, conic_b, conic_c], axis=-1)

    depths = tz
    means2d = jnp.stack([m2x, m2y], axis=-1)

    # Opacity-aware bounding-box extend (arXiv:2402.00525 B.2);
    # parity: ProjectionEWA3DGSFused.cu:163-181.
    extend = jnp.asarray(GAUSSIAN_EXTEND, dtype=means.dtype)
    opac_valid = True
    if opacities is not None:
        op = opacities
        if compensations is not None:
            op = op * compensations
        else:
            op = jnp.broadcast_to(op[..., None, :], tz.shape)
        opac_valid = op >= ALPHA_THRESHOLD
        extend = jnp.minimum(
            GAUSSIAN_EXTEND,
            jnp.sqrt(2.0 * jnp.log(jnp.maximum(op, ALPHA_THRESHOLD) / ALPHA_THRESHOLD)),
        )

    radius_x = jnp.ceil(extend * jnp.sqrt(jnp.maximum(b00, 0.0)))
    radius_y = jnp.ceil(extend * jnp.sqrt(jnp.maximum(b11, 0.0)))

    valid = (tz >= near_plane) & (tz <= far_plane)
    if opacities is not None:
        valid &= opac_valid
    # radius_clip culls only when BOTH axes are small (Fused.cu:188).
    valid &= ~((radius_x <= radius_clip) & (radius_y <= radius_clip))
    # strict frustum test (Fused.cu:196-199)
    valid &= ~(
        (m2x + radius_x <= 0)
        | (m2x - radius_x >= width)
        | (m2y + radius_y <= 0)
        | (m2y - radius_y >= height)
    )

    radii = jnp.where(
        valid[..., None],
        jnp.stack([radius_x, radius_y], axis=-1),
        0.0,
    ).astype(jnp.int32)

    return radii, means2d, depths, conics, compensations


def proj(
    means: jax.Array,  # [..., C, N, 3] camera-frame means
    covars: jax.Array,  # [..., C, N, 3, 3] camera-frame covariances
    Ks: jax.Array,  # [..., C, 3, 3]
    width: int,
    height: int,
    camera_model: str = "pinhole",
) -> Tuple[jax.Array, jax.Array]:
    """Standalone camera projection op: (means2d [..., C, N, 2], covars2d [..., C, N, 2, 2]).

    Parity: gsplat/cuda/csrc/ProjectionEWASimple.cu via
    gsplat/cuda/_wrapper.py:proj (:590).
    """
    tx, ty, tz = (means[..., i] for i in range(3))
    S = (
        covars[..., 0, 0], covars[..., 0, 1], covars[..., 0, 2],
        covars[..., 1, 1], covars[..., 1, 2], covars[..., 2, 2],
    )
    if camera_model == "pinhole":
        (m2x, m2y), (c00, c01, c11) = _persp_proj_scalar(tx, ty, tz, S, Ks, width, height)
    elif camera_model == "ortho":
        (m2x, m2y), (c00, c01, c11) = _ortho_proj_scalar(tx, ty, tz, S, Ks, width, height)
    elif camera_model == "fisheye":
        (m2x, m2y), (c00, c01, c11) = _fisheye_proj_scalar(tx, ty, tz, S, Ks, width, height)
    else:
        raise ValueError(f"unsupported camera_model: {camera_model!r}")
    means2d = jnp.stack([m2x, m2y], axis=-1)
    covars2d = jnp.stack(
        [
            jnp.stack([c00, c01], axis=-1),
            jnp.stack([c01, c11], axis=-1),
        ],
        axis=-2,
    )
    return means2d, covars2d
