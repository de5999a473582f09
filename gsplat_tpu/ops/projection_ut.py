"""Unscented-transform (3DGUT) projection of 3D Gaussians through nonlinear
camera models (distortion, fisheye, f-theta, rolling shutter).

Behavior parity (independently implemented, pure jnp):
  - gsplat/cuda/_torch_impl_ut.py:_fully_fused_projection_with_ut (the
    reference's oracle for ProjectionUT3DGSFused.cu): sigma points, weight
    scheme, masked-cumulative validity, add_blur + compensation,
    PSD/diagonal culls, opacity-aware extend, eigenvalue-bounded radii,
    global_z_order depth choice.

TPU-native design: the 7 sigma points live on a leading size-7 axis that
vmaps through the camera model; everything is batched jnp so XLA fuses the
whole projection, and autodiff supplies the backward (the CUDA version
hand-writes it).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..sensors.cameras import (
    CameraModel,
    interpolate_shutter_pose,
    make_camera,
    viewmat_to_pose,
    world_point_to_image_point_shutter_pose,
)
from ..sensors.params import (
    FThetaCameraDistortionParameters,
    RollingShutterType,
    UnscentedTransformParameters,
)
from .math import quat_to_rotmat
from .projection import ALPHA_THRESHOLD, GAUSSIAN_EXTEND, MIN_COMPENSATION

Array = jax.Array


def _ut_weights(p: UnscentedTransformParameters, dtype) -> Tuple[Array, Array]:
    """(w_mean [7], w_cov [7]) — _torch_impl_ut.py:69-108."""
    D = 3.0
    lam = p.alpha * p.alpha * (D + p.kappa) - D
    w0m = lam / (D + lam)
    w0c = w0m + (1.0 - p.alpha * p.alpha + p.beta)
    wo = 1.0 / (2.0 * (D + lam))
    wm = jnp.asarray([w0m] + [wo] * 6, dtype)
    wc = jnp.asarray([w0c] + [wo] * 6, dtype)
    return wm, wc


def _sigma_points(
    means: Array, quats: Array, scales: Array, p: UnscentedTransformParameters
) -> Array:
    """[..., N, 7, 3] sigma points: center, mean +/- sqrt(D+lam)*s_i*R[:,i]."""
    D = 3.0
    lam = p.alpha * p.alpha * (D + p.kappa) - D
    R = quat_to_rotmat(quats)  # normalizes
    # deltas as rows: row i = sqrt(D+lam) * scales[i] * R[:, i]
    deltas = (math.sqrt(D + lam) * R * scales[..., None, :]).swapaxes(-2, -1)
    m = means[..., None, :]
    return jnp.concatenate([m, m + deltas, m - deltas], axis=-2)


def _add_blur(cov: Array, eps2d: float) -> Tuple[Array, Array, Array]:
    """(det_blur, cov+eps*I, compensation) — _torch_impl_ut.py:282-303."""
    det_orig = cov[..., 0, 0] * cov[..., 1, 1] - cov[..., 0, 1] * cov[..., 1, 0]
    cov = cov + eps2d * jnp.eye(2, dtype=cov.dtype)
    det_blur = cov[..., 0, 0] * cov[..., 1, 1] - cov[..., 0, 1] * cov[..., 1, 0]
    comp = jnp.sqrt(
        jnp.maximum(det_orig / det_blur, MIN_COMPENSATION * MIN_COMPENSATION)
    )
    return det_blur, cov, comp


def fully_fused_projection_ut(
    means: Array,  # [..., N, 3]
    quats: Array,  # [..., N, 4] wxyz
    scales: Array,  # [..., N, 3]
    opacities: Optional[Array],  # [..., N]
    viewmats: Array,  # [..., C, 4, 4]
    Ks: Array,  # [..., C, 3, 3]
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    calc_compensations: bool = False,
    camera_model: str = "pinhole",
    ut_params: Optional[UnscentedTransformParameters] = None,
    radial_coeffs: Optional[Array] = None,
    tangential_coeffs: Optional[Array] = None,
    thin_prism_coeffs: Optional[Array] = None,
    ftheta_coeffs: Optional[FThetaCameraDistortionParameters] = None,
    rolling_shutter: RollingShutterType = RollingShutterType.GLOBAL,
    viewmats_rs: Optional[Array] = None,  # [..., C, 4, 4]
    global_z_order: bool = True,
    camera: Optional[CameraModel] = None,
    lidar_coeffs=None,
    external_distortion=None,
) -> Tuple[Array, Array, Array, Array, Optional[Array]]:
    """UT projection: (radii int32 [..., C, N, 2], means2d, depths, conics,
    compensations|None). See module docstring for parity notes."""
    if ut_params is None:
        ut_params = UnscentedTransformParameters()
    dtype = means.dtype
    N = means.shape[-2]
    C = viewmats.shape[-3]

    focal_lengths = jnp.stack([Ks[..., 0, 0], Ks[..., 1, 1]], axis=-1)
    principal_points = Ks[..., :2, 2]
    if camera is None:
        camera = make_camera(
            camera_model,
            width,
            height,
            focal_lengths=None if camera_model == "ftheta" else focal_lengths,
            principal_points=principal_points,
            radial_coeffs=radial_coeffs,
            tangential_coeffs=tangential_coeffs,
            thin_prism_coeffs=thin_prism_coeffs,
            ftheta_coeffs=ftheta_coeffs,
            shutter_type=rolling_shutter,
            lidar_coeffs=lidar_coeffs,
            external_distortion=external_distortion,
        )

    pose_start = viewmat_to_pose(viewmats)  # [..., C, 7]
    if rolling_shutter != RollingShutterType.GLOBAL:
        assert viewmats_rs is not None, "rolling shutter needs viewmats_rs"
        pose_end = viewmat_to_pose(viewmats_rs)
        pose_mid = interpolate_shutter_pose(
            pose_start, pose_end, jnp.full(pose_start.shape[:-1], 0.5, dtype)
        )
        R_cam = quat_to_rotmat(pose_mid[..., 3:])
        t_cam = pose_mid[..., :3]
    else:
        pose_end = pose_start
        R_cam = viewmats[..., :3, :3]
        t_cam = viewmats[..., :3, 3]

    # Frustum cull on the transformed center point.
    means_cam = (
        jnp.einsum("...cij,...nj->...cni", R_cam, means) + t_cam[..., None, :]
    )  # [..., C, N, 3]
    center_z = means_cam[..., 2]
    in_frustum = (center_z >= near_plane) & (center_z <= far_plane)

    # Degenerate-gaussian cull (zero quat / near-zero scale).
    eps = jnp.finfo(dtype).eps
    valid_quat = (quats * quats).sum(-1) > eps
    valid_scale = (scales > eps).all(-1)
    in_frustum = in_frustum & valid_quat[..., None, :] & valid_scale[..., None, :]

    # Sigma points through the camera model: [..., N, 7, 3] -> [..., C, N*7, 3]
    sp = _sigma_points(means, quats, scales, ut_params)  # [..., N, 7, 3]
    B = means.shape[:-2]
    sp_flat = jnp.broadcast_to(sp[..., None, :, :, :], B + (C, N, 7, 3)).reshape(
        B + (C, N * 7, 3)
    )
    pts2d_flat, valid_flat = world_point_to_image_point_shutter_pose(
        camera, sp_flat, pose_start, pose_end,
        margin_factor=ut_params.in_image_margin_factor,
    )
    pts2d = pts2d_flat.reshape(B + (C, N, 7, 2))
    valid_pts = valid_flat.reshape(B + (C, N, 7))

    wm, wc = _ut_weights(ut_params, dtype)
    if ut_params.require_all_sigma_points_valid:
        # CUDA early-exits at the first invalid sigma point; emulate with a
        # cumulative-validity weight mask.
        cum_valid = jnp.cumprod(valid_pts.astype(dtype), axis=-1)
        valid_gaussian = cum_valid[..., -1] > 0.0
        wm_eff = wm * cum_valid
        wc_eff = wc * cum_valid
        mean2d = (wm_eff[..., None] * pts2d).sum(-2)
        d2 = pts2d - mean2d[..., None, :]
        outer = d2[..., :, None] * d2[..., None, :]
        cov2d = (wc_eff[..., None, None] * outer).sum(-3)
    else:
        valid_gaussian = valid_pts.any(-1)
        mean2d = jnp.einsum("i,...nij->...nj", wm, pts2d)
        d2 = pts2d - mean2d[..., None, :]
        outer = d2[..., :, None] * d2[..., None, :]
        cov2d = jnp.einsum("i,...nijk->...njk", wc, outer)

    valid_gaussian = valid_gaussian & in_frustum

    det, cov2d, compensations = _add_blur(cov2d, eps2d)
    valid_gaussian = valid_gaussian & (det > 0.0)

    # The negative UT center weight can break PSD-ness; cull those.
    c00, c01, c11 = cov2d[..., 0, 0], cov2d[..., 0, 1], cov2d[..., 1, 1]
    valid_gaussian = valid_gaussian & (c00 > 0.0) & (c11 > 0.0)

    # Conic = inverse of (cov + 1e-6 I) — the epsilon keeps autograd finite
    # on singular covariances of already-culled gaussians.
    b00, b11 = c00 + 1e-6, c11 + 1e-6
    inv_det = 1.0 / (b00 * b11 - c01 * c01)
    conics = jnp.stack(
        [b11 * inv_det, -c01 * inv_det, b00 * inv_det], axis=-1
    )

    extend = jnp.full(valid_gaussian.shape, GAUSSIAN_EXTEND, dtype)
    if opacities is not None:
        opacity = opacities[..., None, :] * compensations
        valid_gaussian = valid_gaussian & (opacity >= ALPHA_THRESHOLD)
        extend = jnp.minimum(
            extend,
            jnp.sqrt(
                2.0 * jnp.log(jnp.maximum(opacity / ALPHA_THRESHOLD, 1.0))
            ),
        )

    # Eigenvalue-bounded radii (arXiv:2402.00525 B.2).
    trace = c00 + c11
    b = 0.5 * trace
    v1 = b + jnp.sqrt(jnp.maximum(b * b - det, 0.01))
    r1 = extend * jnp.sqrt(jnp.maximum(v1, 0.0))
    cov_diag = jnp.stack([c00, c11], axis=-1)
    radius = jnp.ceil(
        jnp.minimum(
            extend[..., None] * jnp.sqrt(jnp.maximum(cov_diag, 0.0)),
            r1[..., None],
        )
    )

    valid_gaussian = valid_gaussian & (radius.max(-1) > radius_clip)
    if camera_model != "lidar":
        # lidar culls against its FOV inside the camera model
        in_image = (
            (mean2d + radius > 0.0)
            & (mean2d - radius < jnp.asarray([width, height], dtype))
        ).all(-1)
        valid_gaussian = valid_gaussian & in_image

    radii = jnp.where(valid_gaussian[..., None], radius, 0.0).astype(jnp.int32)
    means2d = jnp.where(valid_gaussian[..., None], mean2d, 0.0)
    depth = center_z if global_z_order else jnp.linalg.norm(means_cam, axis=-1)
    depths = jnp.where(valid_gaussian, depth, 0.0)
    conics = jnp.where(valid_gaussian[..., None], conics, 0.0)
    if calc_compensations:
        compensations = jnp.where(valid_gaussian, compensations, 0.0)
    else:
        compensations = None
    return radii, means2d, depths, conics, compensations
