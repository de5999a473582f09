"""Functional camera models: perfect/OpenCV pinhole, orthographic, OpenCV
fisheye, and f-theta, with rolling-shutter pose interpolation.

Behavior parity (independently implemented, pure jnp):
  - gsplat/cuda/_torch_cameras.py (the reference's own test oracle for its
    sensors CUDA kernels): projection/unprojection math, validity rules,
    Newton undistortion, fisheye max-angle precompute, rolling-shutter
    iteration scheme.
  - gsplat/cuda/_math.py: polynomial proxies + Newton polynomial inverse.

TPU-native design notes:
  - No classes-with-kernels: one frozen parameter record (`CameraModel`)
    plus stateless functions. Everything is traceable, differentiable and
    vmap-able; Newton loops run a static number of iterations with `where`
    masking (no data-dependent control flow under jit).
  - Shapes: camera params carry batch dims ``[..., C, k]``; point arguments
    add one trailing point axis: ``[..., C, M, k]``. Poses are 7-vectors
    ``[tx, ty, tz, qw, qx, qy, qz]`` (wxyz quaternions).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.math import quat_inverse, quat_rotate, quat_slerp, rotmat_to_quat
from .params import (
    CameraLinearParams,
    FThetaCameraDistortionParameters,
    FThetaPolynomialType,
    RollingShutterType,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Small numerics helpers
# ---------------------------------------------------------------------------


def _safe_normalize(v: Array, axis: int = -1) -> Array:
    """v/||v|| where ||v||>0 else v (parity: _math.py:SafeNormalize)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return jnp.where(n > 0.0, v / jnp.where(n > 0.0, n, 1.0), v)


def _stable_norm2(x: Array, y: Array) -> Array:
    """sqrt(x^2+y^2) computed scale-invariantly (parity:
    _math.py:_numerically_stable_norm2)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    r = lo / jnp.where(hi > 0.0, hi, 1.0)
    return hi * jnp.sqrt(1.0 + r * r)


def eval_poly_full(coeffs: Array, x: Array) -> Array:
    """Horner eval of c0 + c1 x + ... Coefficient slices ``coeffs[..., i]``
    must broadcast against ``x`` (pass ``coeffs[..., None, :]`` for a point
    axis)."""
    k = coeffs.shape[-1]
    r = coeffs[..., k - 1]
    for i in range(k - 2, -1, -1):
        r = r * x + coeffs[..., i]
    return r


def eval_poly_odd(coeffs: Array, x: Array) -> Array:
    """c0 x + c1 x^3 + c2 x^5 + ..."""
    return x * eval_poly_full(coeffs, x * x)


def eval_poly_even(coeffs: Array, x: Array) -> Array:
    """c0 + c1 x^2 + c2 x^4 + ..."""
    return eval_poly_full(coeffs, x * x)


def poly_inverse_newton(
    f, df, x0: Array, y: Array, n_iterations: int, tol: float = 1e-6
) -> Tuple[Array, Array]:
    """Solve f(x) = y by Newton from x0; fixed iteration count.

    Parity: _math.py:_eval_poly_inverse_horner_newton — converged lanes are
    frozen; `converged` is advisory (|dx| < tol at some iteration).
    """
    x = x0
    converged = jnp.zeros(jnp.shape(x0), dtype=bool)
    for _ in range(n_iterations):
        dx = (f(x) - y) / df(x)
        x = jnp.where(converged, x, x - dx)
        converged = converged | (jnp.abs(dx) < tol)
    return x, converged


# ---------------------------------------------------------------------------
# Poses (7-vector [t, q_wxyz])
# ---------------------------------------------------------------------------


def viewmat_to_pose(viewmat: Array) -> Array:
    """4x4 world-to-camera matrix -> 7D pose (parity: _torch_cameras.py:114)."""
    R = viewmat[..., :3, :3]
    t = viewmat[..., :3, 3]
    return jnp.concatenate([t, rotmat_to_quat(R)], axis=-1)


def pose_camera_world_position(pose: Array) -> Array:
    """Camera center in world coords: R^-1 (-t)."""
    t, q = pose[..., :3], pose[..., 3:]
    return quat_rotate(quat_inverse(q), -t)


def pose_world_points_to_camera_ray(pose: Array, world_points: Array) -> Array:
    """p_cam = R p_world + t (parity: _torch_cameras.py:210)."""
    t, q = pose[..., :3], pose[..., 3:]
    return quat_rotate(q, world_points) + t


def pose_camera_ray_to_world_ray(
    pose: Array, camera_ray: Array
) -> Tuple[Array, Array]:
    """(origin, direction) of a camera-frame ray in world coords."""
    t, q = pose[..., :3], pose[..., 3:]
    q_inv = quat_inverse(q)
    return quat_rotate(q_inv, -t), quat_rotate(q_inv, camera_ray)


def interpolate_shutter_pose(
    pose_start: Array, pose_end: Array, relative_time: Array
) -> Array:
    """Lerp translation + slerp rotation (parity: _torch_cameras.py:2168)."""
    a = relative_time[..., None]
    t = (1.0 - a) * pose_start[..., :3] + a * pose_end[..., :3]
    q = quat_slerp(pose_start[..., 3:], pose_end[..., 3:], a)
    return jnp.concatenate([t, _safe_normalize(q)], axis=-1)


# ---------------------------------------------------------------------------
# Camera parameter record
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CameraModel:
    """Parameter record for one batched camera model.

    `kind` selects the projection math; per-camera arrays have shape
    ``[..., C, k]``. Built by `make_camera` (which precomputes the fisheye
    max-angle and f-theta derivative polynomials).
    """

    kind: str  # pinhole | opencv_pinhole | ortho | fisheye | ftheta
    width: int
    height: int
    shutter_type: RollingShutterType
    focal_lengths: Array  # [..., C, 2]
    principal_points: Array  # [..., C, 2]
    # OpenCV pinhole
    radial_coeffs: Optional[Array] = None  # [..., C, 6]
    tangential_coeffs: Optional[Array] = None  # [..., C, 2]
    thin_prism_coeffs: Optional[Array] = None  # [..., C, 4]
    # Fisheye (precomputed)
    fisheye_fwd_poly: Optional[Array] = None  # [..., C, 5] odd in theta
    fisheye_dfwd_poly: Optional[Array] = None  # [..., C, 5] even in theta
    fisheye_approx_bwd: Optional[Array] = None  # [..., C, 2] full in delta
    max_angle: Optional[Array] = None  # [..., C] (fisheye + ftheta)
    # F-theta (precomputed)
    ftheta_reference_poly: Optional[FThetaPolynomialType] = None
    ftheta_linear_cde: Optional[Array] = None  # [..., C, 3]
    ftheta_p2a: Optional[Array] = None  # [..., C, 6]
    ftheta_a2p: Optional[Array] = None  # [..., C, 6]
    ftheta_dref: Optional[Array] = None  # [..., C, 5]
    # external ray-space warp applied before (forward) / after (inverse)
    # the base model (sensors/external.py, windshield model)
    external_distortion: Optional[object] = None
    opts: CameraLinearParams = CameraLinearParams()


def _smallest_positive_root_1_axx3(a: Array, b: Array, c: Array) -> Array:
    """Smallest positive root of 1 + a x + b x^2 + c x^3, else +inf.

    Branch-free evaluation of all cases composed with `where`
    (parity: _torch_cameras.py:_compute_max_angle).
    """
    INF = jnp.inf
    is_c_zero = jnp.abs(c) < 1e-10
    is_linear = is_c_zero & (jnp.abs(b) < 1e-10)
    a_safe = jnp.where(jnp.abs(a) > 0, a, 1.0)
    linear_result = jnp.where(a >= 0.0, INF, -1.0 / a_safe)

    delta_quad = a * a - 4.0 * b
    has_quad = is_c_zero & ~is_linear & (delta_quad >= 0.0)
    delta_term = jnp.sqrt(jnp.maximum(delta_quad, 0.0)) - a
    quad_result = jnp.where(delta_term > 0.0, 2.0 / jnp.where(delta_term != 0, delta_term, 1.0), INF)

    c_safe = jnp.where(is_c_zero, 1.0, c)
    boc = b / c_safe
    boc2 = boc * boc
    t1 = (9.0 * a * boc - 2.0 * b * boc2 - 27.0) / c_safe
    t2 = 3.0 * a / c_safe - boc2
    delta_cubic = t1 * t1 + 4.0 * t2 * t2 * t2

    has_real_root = ~is_c_zero & (delta_cubic >= 0.0)
    d2 = jnp.sqrt(jnp.maximum(delta_cubic, 0.0))
    half = (d2 + t1) / 2.0
    cube_root = jnp.sign(half) * jnp.abs(half) ** (1.0 / 3.0)
    cr_safe = jnp.where(cube_root != 0, cube_root, 1.0)
    real_root = jnp.where(
        cube_root != 0, (cube_root - t2 / cr_safe - boc) / 3.0, INF
    )
    real_root = jnp.where(real_root > 0.0, real_root, INF)

    theta = jnp.arctan2(jnp.sqrt(jnp.maximum(-delta_cubic, 0.0)), t1) / 3.0
    t3 = 2.0 * jnp.sqrt(jnp.maximum(-t2, 0.0))
    soln = jnp.full_like(a, INF)
    for i in (-1, 0, 1):
        s = (t3 * jnp.cos(theta + i * (2.0 * math.pi / 3.0)) - boc) / 3.0
        soln = jnp.minimum(soln, jnp.where(s > 0.0, s, INF))

    return jnp.where(
        is_linear,
        linear_result,
        jnp.where(
            has_quad,
            quad_result,
            jnp.where(has_real_root, real_root, jnp.where(~is_c_zero, soln, INF)),
        ),
    )


def make_camera(
    camera_model: str,
    width: int = 0,
    height: int = 0,
    focal_lengths: Optional[Array] = None,  # [..., C, 2]
    principal_points: Optional[Array] = None,  # [..., C, 2]
    radial_coeffs: Optional[Array] = None,  # [..., C, <=6] / fisheye [..., C, 4]
    tangential_coeffs: Optional[Array] = None,  # [..., C, 2]
    thin_prism_coeffs: Optional[Array] = None,  # [..., C, 4]
    ftheta_coeffs: Optional[FThetaCameraDistortionParameters] = None,
    shutter_type: RollingShutterType = RollingShutterType.GLOBAL,
    opts: CameraLinearParams = CameraLinearParams(),
    lidar_coeffs=None,
    external_distortion=None,
):
    """Build a `CameraModel` (parity: _BaseCameraModel.create, including the
    pinhole->opencv_pinhole promotion when any distortion is given).
    camera_model="lidar" returns the LidarModel from `lidar_coeffs`
    directly (see sensors/lidars.py)."""
    if camera_model == "lidar":
        assert lidar_coeffs is not None, "lidar requires lidar_coeffs"
        return lidar_coeffs
    assert principal_points is not None
    pp = jnp.asarray(principal_points, jnp.float32)
    B = pp.shape[:-1]
    dtype = pp.dtype

    if camera_model == "pinhole":
        assert focal_lengths is not None
        fl = jnp.asarray(focal_lengths, dtype)
        if radial_coeffs is None and tangential_coeffs is None and thin_prism_coeffs is None:
            return CameraModel(
                "pinhole", width, height, shutter_type, fl, pp,
                external_distortion=external_distortion, opts=opts,
            )
        rad = jnp.zeros(B + (6,), dtype)
        if radial_coeffs is not None:
            rc = jnp.asarray(radial_coeffs, dtype)
            rad = rad.at[..., : rc.shape[-1]].set(rc)
        tan = (
            jnp.asarray(tangential_coeffs, dtype)
            if tangential_coeffs is not None
            else jnp.zeros(B + (2,), dtype)
        )
        tp = (
            jnp.asarray(thin_prism_coeffs, dtype)
            if thin_prism_coeffs is not None
            else jnp.zeros(B + (4,), dtype)
        )
        return CameraModel(
            "opencv_pinhole", width, height, shutter_type, fl, pp,
            radial_coeffs=rad, tangential_coeffs=tan, thin_prism_coeffs=tp,
            external_distortion=external_distortion, opts=opts,
        )

    if camera_model == "ortho":
        assert focal_lengths is not None
        return CameraModel(
            "ortho", width, height, shutter_type,
            jnp.asarray(focal_lengths, dtype), pp,
            external_distortion=external_distortion, opts=opts,
        )

    if camera_model == "fisheye":
        assert focal_lengths is not None
        fl = jnp.asarray(focal_lengths, dtype)
        k = (
            jnp.asarray(radial_coeffs, dtype)
            if radial_coeffs is not None
            else jnp.zeros(B + (4,), dtype)
        )
        k1, k2, k3, k4 = (k[..., i] for i in range(4))
        one = jnp.ones_like(k1)
        fwd = jnp.stack([one, k1, k2, k3, k4], axis=-1)
        dfwd = jnp.stack([one, 3 * k1, 5 * k2, 7 * k3, 9 * k4], axis=-1)

        fx, fy = fl[..., 0], fl[..., 1]
        cx, cy = pp[..., 0], pp[..., 1]
        mdx = jnp.maximum(width - cx, cx)
        mdy = jnp.maximum(height - cy, cy)
        max_radius_px = jnp.sqrt(mdx * mdx + mdy * mdy)

        # max angle: where the derivative polynomial hits zero
        k4_zero = jnp.abs(k4) < 1e-10
        ang_k4z = jnp.sqrt(
            jnp.maximum(
                _smallest_positive_root_1_axx3(3.0 * k1, 5.0 * k2, 7.0 * k3), 0.0
            )
        )
        ddfwd = jnp.stack([6 * k1, 20 * k2, 42 * k3, 72 * k4], axis=-1)
        ang_nz, conv = poly_inverse_newton(
            lambda x: eval_poly_even(dfwd, x),
            lambda x: eval_poly_odd(ddfwd, x),
            jnp.full_like(k1, 1.57),
            jnp.zeros_like(k1),
            n_iterations=opts.newton_iterations,
        )
        ang_nz = jnp.where(conv & (ang_nz > 0.0), ang_nz, jnp.inf)
        max_angle = jnp.where(k4_zero, ang_k4z, ang_nz)
        max_angle = jnp.minimum(
            max_angle, jnp.maximum(max_radius_px / fx, max_radius_px / fy)
        )

        max_norm_dist = jnp.maximum(width / 2.0 / fx, height / 2.0 / fy)
        approx_bwd = jnp.stack(
            [jnp.zeros_like(max_angle), max_angle / max_norm_dist], axis=-1
        )
        return CameraModel(
            "fisheye", width, height, shutter_type, fl, pp,
            radial_coeffs=k, fisheye_fwd_poly=fwd, fisheye_dfwd_poly=dfwd,
            fisheye_approx_bwd=approx_bwd, max_angle=max_angle,
            external_distortion=external_distortion, opts=opts,
        )

    if camera_model == "ftheta":
        assert ftheta_coeffs is not None
        ft = ftheta_coeffs
        # image origin = center of first pixel => principal point +0.5
        pp = pp + 0.5
        p2a = jnp.broadcast_to(
            jnp.asarray(ft.pixeldist_to_angle_poly, dtype), B + (6,)
        )
        a2p = jnp.broadcast_to(
            jnp.asarray(ft.angle_to_pixeldist_poly, dtype), B + (6,)
        )
        cde = jnp.broadcast_to(jnp.asarray(ft.linear_cde, dtype), B + (3,))
        ref = p2a if ft.reference_poly == FThetaPolynomialType.PIXELDIST_TO_ANGLE else a2p
        dref = ref[..., 1:] * jnp.arange(1.0, 6.0, dtype=dtype)
        # focal length proxy (for projecting sigma points etc.)
        if ft.reference_poly == FThetaPolynomialType.PIXELDIST_TO_ANGLE:
            f = 1.0 / p2a[..., 1]
        else:
            f = a2p[..., 1]
        fl = jnp.stack([f, f], axis=-1)
        max_angle = jnp.broadcast_to(jnp.asarray(ft.max_angle, dtype), B)
        return CameraModel(
            "ftheta", width, height, shutter_type, fl, pp,
            ftheta_reference_poly=ft.reference_poly, ftheta_linear_cde=cde,
            ftheta_p2a=p2a, ftheta_a2p=a2p, ftheta_dref=dref,
            max_angle=max_angle, external_distortion=external_distortion,
            opts=dataclasses.replace(opts, newton_iterations=3),
        )

    raise ValueError(f"unsupported camera model: {camera_model!r}")


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def check_image_bounds(cam: CameraModel, points_2d: Array, margin_factor: float) -> Array:
    """In-bounds test with a relative margin (parity: _torch_cameras.py:660)."""
    u, v = points_2d[..., 0], points_2d[..., 1]
    mx = cam.width * margin_factor
    my = cam.height * margin_factor
    return (u >= -mx) & (u < cam.width + mx) & (v >= -my) & (v < cam.height + my)


def shutter_relative_frame_time(cam: CameraModel, pixel_coords: Array) -> Array:
    """Per-pixel shutter time in [0, 1] (parity: _torch_cameras.py:424)."""
    if cam.kind == "lidar":
        from .lidars import lidar_shutter_relative_frame_time

        return lidar_shutter_relative_frame_time(cam, pixel_coords)
    st = cam.shutter_type
    px, py = pixel_coords[..., 0], pixel_coords[..., 1]
    if st == RollingShutterType.GLOBAL:
        return jnp.zeros_like(px)
    if st == RollingShutterType.ROLLING_TOP_TO_BOTTOM:
        return jnp.floor(py) / float(cam.height - 1) if cam.height > 1 else jnp.full_like(py, 0.5)
    if st == RollingShutterType.ROLLING_LEFT_TO_RIGHT:
        return jnp.floor(px) / float(cam.width - 1) if cam.width > 1 else jnp.full_like(px, 0.5)
    if st == RollingShutterType.ROLLING_BOTTOM_TO_TOP:
        return (cam.height - jnp.ceil(py)) / float(cam.height - 1) if cam.height > 1 else jnp.full_like(py, 0.5)
    assert st == RollingShutterType.ROLLING_RIGHT_TO_LEFT
    return (cam.width - jnp.ceil(px)) / float(cam.width - 1) if cam.width > 1 else jnp.full_like(px, 0.5)


def _fl_pp(cam: CameraModel) -> Tuple[Array, Array]:
    """Focal/principal broadcast over one point axis."""
    return cam.focal_lengths[..., None, :], cam.principal_points[..., None, :]


def _opencv_distortion(cam: CameraModel, uv: Array) -> Tuple[Array, Array, Array]:
    """(icD, delta, r2) of the OpenCV rational+tangential+thin-prism model
    (parity: _torch_cameras.py:999)."""
    k = cam.radial_coeffs[..., None, :]  # [..., C, 1, 6]
    p = cam.tangential_coeffs[..., None, :]
    s = cam.thin_prism_coeffs[..., None, :]
    u, v = uv[..., 0], uv[..., 1]
    u2, v2 = u * u, v * v
    r2 = u2 + v2
    a1 = 2.0 * u * v
    a2 = r2 + 2.0 * u2
    a3 = r2 + 2.0 * v2
    num = 1.0 + r2 * (k[..., 0] + r2 * (k[..., 1] + r2 * k[..., 2]))
    den = 1.0 + r2 * (k[..., 3] + r2 * (k[..., 4] + r2 * k[..., 5]))
    icD = num / den
    dx = p[..., 0] * a1 + p[..., 1] * a2 + r2 * (s[..., 0] + r2 * s[..., 1])
    dy = p[..., 0] * a3 + p[..., 1] * a1 + r2 * (s[..., 2] + r2 * s[..., 3])
    return icD, jnp.stack([dx, dy], axis=-1), r2


# ---------------------------------------------------------------------------
# camera_ray_to_image_point
# ---------------------------------------------------------------------------


def camera_ray_to_image_point(
    cam: CameraModel, cam_ray: Array, margin_factor: float
) -> Tuple[Array, Array]:
    """Project camera-frame rays/points [..., C, M, 3] to pixels.

    Returns (image_point [..., C, M, 2], valid [..., C, M]).
    """
    if cam.kind == "lidar":
        from .lidars import lidar_ray_to_image_point

        return lidar_ray_to_image_point(cam, cam_ray, margin_factor)
    if cam.external_distortion is not None:
        from .external import apply_external_distortion

        cam_ray = apply_external_distortion(cam.external_distortion, cam_ray)
    fl, pp = _fl_pp(cam)
    z = cam_ray[..., 2]

    if cam.kind in ("pinhole", "opencv_pinhole"):
        valid_depth = z > 0.0
        uv = cam_ray[..., :2] / cam_ray[..., 2:3]
        if cam.kind == "opencv_pinhole":
            icD, delta, _ = _opencv_distortion(cam, uv)
            valid_dist = icD > 0.8
            pt = (icD[..., None] * uv + delta) * fl + pp
            # CUDA zeroes only depth-invalid points on the perfect model;
            # the OpenCV model keeps coordinates (matches torch oracle).
            valid = valid_depth & valid_dist & check_image_bounds(cam, pt, margin_factor)
            return pt, valid
        pt = uv * fl + pp
        pt = jnp.where(valid_depth[..., None], pt, 0.0)
        return pt, valid_depth & check_image_bounds(cam, pt, margin_factor)

    if cam.kind == "ortho":
        valid_depth = z > 0.0
        pt = cam_ray[..., :2] * fl + pp
        pt = jnp.where(valid_depth[..., None], pt, 0.0)
        return pt, valid_depth & check_image_bounds(cam, pt, margin_factor)

    if cam.kind == "fisheye":
        valid = z > 0.0
        xy_norm = _stable_norm2(cam_ray[..., 0], cam_ray[..., 1])
        xy_norm = jnp.where(xy_norm <= 0.0, jnp.finfo(cam_ray.dtype).eps, xy_norm)
        theta_full = jnp.arctan2(xy_norm, z)
        ma = cam.max_angle[..., None]
        theta = jnp.minimum(theta_full, ma)
        delta = eval_poly_odd(cam.fisheye_fwd_poly[..., None, :], theta) / xy_norm
        valid = valid & (delta > 0.0)
        pt = delta[..., None] * cam_ray[..., :2] * fl + pp
        valid = valid & (theta_full < ma) & check_image_bounds(cam, pt, margin_factor)
        return pt, valid

    if cam.kind == "ftheta":
        not_behind = z > 0.0
        xy_norm = _stable_norm2(cam_ray[..., 0], cam_ray[..., 1])
        xy_norm = jnp.where(xy_norm <= 0.0, jnp.finfo(cam_ray.dtype).eps, xy_norm)
        theta_full = jnp.arctan2(xy_norm, z)
        ma = cam.max_angle[..., None]
        theta = jnp.minimum(theta_full, ma)
        a2p = cam.ftheta_a2p[..., None, :]
        p2a = cam.ftheta_p2a[..., None, :]
        dref = cam.ftheta_dref[..., None, :]
        if cam.ftheta_reference_poly == FThetaPolynomialType.PIXELDIST_TO_ANGLE:
            # forward via Newton inverse of the reference backward poly;
            # Newton's convergence flag is advisory (see torch oracle note
            # at _torch_cameras.py:2003-2016) — trust delta.
            delta, _ = poly_inverse_newton(
                lambda x: eval_poly_full(p2a, x),
                lambda x: eval_poly_full(dref, x),
                eval_poly_full(a2p, theta),
                theta,
                n_iterations=cam.opts.newton_iterations,
            )
        else:
            delta = eval_poly_full(a2p, theta)
        ix = delta * cam_ray[..., 0] / xy_norm
        iy = delta * cam_ray[..., 1] / xy_norm
        cde = cam.ftheta_linear_cde[..., None, :]
        c, d, e = cde[..., 0], cde[..., 1], cde[..., 2]
        pt = jnp.stack(
            [c * ix + d * iy + pp[..., 0], e * ix + iy + pp[..., 1]], axis=-1
        )
        valid = not_behind & (theta_full < ma) & check_image_bounds(cam, pt, margin_factor)
        pt = pt * not_behind[..., None]
        return pt, valid

    raise ValueError(f"unsupported camera kind: {cam.kind!r}")


# ---------------------------------------------------------------------------
# image_point_to_camera_ray
# ---------------------------------------------------------------------------


def _opencv_undistort_newton(cam: CameraModel, uv0: Array) -> Tuple[Array, Array]:
    """Newton-Raphson undistortion (parity: _torch_cameras.py:1131-1311)."""
    k = cam.radial_coeffs[..., None, :]
    p = cam.tangential_coeffs[..., None, :]
    s = cam.thin_prism_coeffs[..., None, :]
    eps = 1e-6

    def res_jac(xy):
        x, y = xy[..., 0], xy[..., 1]
        xd, yd = uv0[..., 0], uv0[..., 1]
        r = x * x + y * y
        r2 = r * r
        alpha = 1.0 + r * (k[..., 0] + r * (k[..., 1] + r * k[..., 2]))
        beta = 1.0 + r * (k[..., 3] + r * (k[..., 4] + r * k[..., 5]))
        d = alpha / beta
        valid = d > 0.0
        p1, p2 = p[..., 0], p[..., 1]
        s1, s2, s3, s4 = (s[..., i] for i in range(4))
        fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) + s1 * r + s2 * r2 - xd
        fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) + s3 * r + s4 * r2 - yd
        alpha_r = k[..., 0] + r * (2.0 * k[..., 1] + r * (3.0 * k[..., 2]))
        beta_r = k[..., 3] + r * (2.0 * k[..., 4] + r * (3.0 * k[..., 5]))
        d_r = (alpha_r * beta - alpha * beta_r) / (beta * beta)
        d_x, d_y = 2.0 * x * d_r, 2.0 * y * d_r
        fx_x = d + d_x * x + 2 * p1 * y + 6 * p2 * x + 2 * x * (s1 + 2 * s2 * r)
        fx_y = d_y * x + 2 * p1 * x + 2 * p2 * y + 2 * y * (s1 + 2 * s2 * r)
        fy_x = d_x * y + 2 * p2 * y + 2 * p1 * x + 2 * x * (s3 + 2 * s4 * r)
        fy_y = d + d_y * y + 2 * p2 * x + 6 * p1 * y + 2 * y * (s3 + 2 * s4 * r)
        z = jnp.zeros_like(fx)
        m = valid
        return (
            jnp.where(m, fx, z), jnp.where(m, fy, z),
            jnp.where(m, fx_x, z), jnp.where(m, fx_y, z),
            jnp.where(m, fy_x, z), jnp.where(m, fy_y, z),
            valid,
        )

    uv_hat = uv0
    converged = jnp.zeros(uv0.shape[:-1], dtype=bool)
    valid_points = jnp.ones(uv0.shape[:-1], dtype=bool)
    for _ in range(cam.opts.max_undistortion_iterations):
        fx, fy, fxx, fxy, fyx, fyy, valid_jac = res_jac(uv_hat)
        valid_points = valid_points & valid_jac
        det = fxx * fyy - fxy * fyx
        valid_points = valid_points & (jnp.abs(det) >= eps)
        det_safe = jnp.where(jnp.abs(det) >= eps, det, 1.0)
        step = -jnp.stack(
            [(fx * fyy - fy * fxy) / det_safe, (fy * fxx - fx * fyx) / det_safe],
            axis=-1,
        )
        frozen = converged | ~valid_points
        uv_hat = jnp.where(frozen[..., None], uv_hat, uv_hat + step)
        step_conv = (jnp.abs(step[..., 0]) < eps) & (jnp.abs(step[..., 1]) < eps)
        converged = converged | (valid_points & step_conv)
    return uv_hat, converged


def image_point_to_camera_ray(
    cam: CameraModel, image_point: Array
) -> Tuple[Array, Array]:
    """Unproject pixels [..., C, M, 2] to unit camera rays [..., C, M, 3]."""
    if cam.kind == "lidar":
        from .lidars import lidar_image_point_to_ray

        return lidar_image_point_to_ray(cam, image_point)
    if cam.external_distortion is not None:
        from .external import apply_external_distortion

        ray, valid = _image_point_to_camera_ray_base(cam, image_point)
        return (
            apply_external_distortion(
                cam.external_distortion, ray, inverse=True
            ),
            valid,
        )
    return _image_point_to_camera_ray_base(cam, image_point)


def _image_point_to_camera_ray_base(
    cam: CameraModel, image_point: Array
) -> Tuple[Array, Array]:
    fl, pp = _fl_pp(cam)

    if cam.kind == "pinhole":
        uv = (image_point - pp) / fl
        ray = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
        return _safe_normalize(ray), jnp.ones(ray.shape[:-1], dtype=bool)

    if cam.kind == "opencv_pinhole":
        uv0 = (image_point - pp) / fl
        uv, converged = _opencv_undistort_newton(cam, uv0)
        ray = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
        return _safe_normalize(ray), converged

    if cam.kind == "ortho":
        z = jnp.zeros_like(image_point[..., :1])
        ray = jnp.concatenate([z, z, jnp.ones_like(z)], axis=-1)
        return ray, jnp.ones(ray.shape[:-1], dtype=bool)

    if cam.kind == "fisheye":
        uv = (image_point - pp) / fl
        delta = jnp.linalg.norm(uv, axis=-1)
        fwd = cam.fisheye_fwd_poly[..., None, :]
        dfwd = cam.fisheye_dfwd_poly[..., None, :]
        theta, converged = poly_inverse_newton(
            lambda x: eval_poly_odd(fwd, x),
            lambda x: eval_poly_even(dfwd, x),
            eval_poly_full(cam.fisheye_approx_bwd[..., None, :], delta),
            delta,
            n_iterations=cam.opts.newton_iterations,
        )
        ma = cam.max_angle[..., None]
        valid = (theta >= 0.0) & (theta < ma) & converged
        is_center = delta < cam.opts.min_2d_norm
        delta_safe = jnp.where(is_center, 1.0, delta)
        sf = jnp.sin(theta) / delta_safe
        ray = jnp.stack([sf * uv[..., 0], sf * uv[..., 1], jnp.cos(theta)], axis=-1)
        straight = jnp.stack(
            [jnp.zeros_like(theta), jnp.zeros_like(theta), jnp.ones_like(theta)],
            axis=-1,
        )
        return jnp.where(is_center[..., None], straight, ray), valid

    if cam.kind == "ftheta":
        cde = cam.ftheta_linear_cde[..., None, :]
        c, d, e = cde[..., 0], cde[..., 1], cde[..., 2]
        px = image_point[..., 0] - pp[..., 0]
        py = image_point[..., 1] - pp[..., 1]
        det_inv = 1.0 / (c - e * d)
        uv = jnp.stack(
            [(px - d * py) * det_inv, (-e * px + c * py) * det_inv], axis=-1
        )
        delta = jnp.linalg.norm(uv, axis=-1)
        a2p = cam.ftheta_a2p[..., None, :]
        p2a = cam.ftheta_p2a[..., None, :]
        dref = cam.ftheta_dref[..., None, :]
        if cam.ftheta_reference_poly == FThetaPolynomialType.PIXELDIST_TO_ANGLE:
            theta = eval_poly_full(p2a, delta)
            converged = jnp.ones_like(theta, dtype=bool)
        else:
            theta, converged = poly_inverse_newton(
                lambda x: eval_poly_full(a2p, x),
                lambda x: eval_poly_full(dref, x),
                eval_poly_full(p2a, delta),
                delta,
                n_iterations=cam.opts.newton_iterations,
            )
        is_center = delta < cam.opts.min_2d_norm
        delta_safe = jnp.where(is_center, 1.0, delta)
        sf = jnp.sin(theta) / delta_safe
        ray = jnp.stack([sf * uv[..., 0], sf * uv[..., 1], jnp.cos(theta)], axis=-1)
        straight = jnp.stack(
            [jnp.zeros_like(theta), jnp.zeros_like(theta), jnp.ones_like(theta)],
            axis=-1,
        )
        ray = jnp.where((is_center | ~converged)[..., None], straight, ray)
        return _safe_normalize(ray), converged

    raise ValueError(f"unsupported camera kind: {cam.kind!r}")


# ---------------------------------------------------------------------------
# Shutter-pose composition
# ---------------------------------------------------------------------------


def image_point_to_world_ray_shutter_pose(
    cam: CameraModel,
    image_point: Array,  # [..., C, M, 2]
    shutter_pose_start: Array,  # [..., C, 7]
    shutter_pose_end: Array,  # [..., C, 7]
) -> Tuple[Array, Array, Array]:
    """Pixels -> world rays through the time-interpolated shutter pose."""
    camera_ray, valid = image_point_to_camera_ray(cam, image_point)
    t = shutter_relative_frame_time(cam, image_point)
    pose = interpolate_shutter_pose(
        shutter_pose_start[..., None, :], shutter_pose_end[..., None, :], t
    )
    org, dirn = pose_camera_ray_to_world_ray(pose, camera_ray)
    v = valid[..., None].astype(org.dtype)
    return org * v, dirn * v, valid


def generate_rays(
    cam: CameraModel,
    width: int,
    height: int,
    viewmats: Array,  # [..., C, 4, 4]
    viewmats_rs: Optional[Array] = None,  # [..., C, 4, 4]
) -> Array:
    """World-space rays for every pixel center: [..., C, H, W, 6].

    Parity: gsplat/cuda/_torch_impl_eval3d.py:_generate_rays — pixel centers
    at (x+0.5, y+0.5), unprojected through the camera model and the
    (optionally time-interpolated) shutter pose.
    """
    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(px, py, indexing="xy")  # [H, W]
    pix = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # [P, 2]

    pose_start = viewmat_to_pose(viewmats)  # [..., C, 7]
    pose_end = (
        viewmat_to_pose(viewmats_rs) if viewmats_rs is not None else pose_start
    )
    B = pose_start.shape[:-1]
    pix = jnp.broadcast_to(pix, B + pix.shape)  # [..., C, P, 2]
    org, dirn, _valid = image_point_to_world_ray_shutter_pose(
        cam, pix, pose_start, pose_end
    )
    rays = jnp.concatenate([org, dirn], axis=-1)  # [..., C, P, 6]
    return rays.reshape(B + (height, width, 6))


def world_point_to_image_point_shutter_pose(
    cam: CameraModel,
    world_points: Array,  # [..., C, M, 3]
    shutter_pose_start: Array,  # [..., C, 7]
    shutter_pose_end: Array,  # [..., C, 7]
    margin_factor: float,
    rolling_shutter_iterations: int = 10,
) -> Tuple[Array, Array]:
    """Project world points with iterative rolling-shutter refinement
    (parity: _torch_cameras.py:554-658; fixed iteration count)."""
    ps = shutter_pose_start[..., None, :]
    pt_start, valid_start = camera_ray_to_image_point(
        cam, pose_world_points_to_camera_ray(ps, world_points), margin_factor
    )
    shutter = (
        RollingShutterType.ROLLING_LEFT_TO_RIGHT
        if cam.kind == "lidar"
        else cam.shutter_type
    )
    if shutter == RollingShutterType.GLOBAL or shutter_pose_end is shutter_pose_start:
        return pt_start, valid_start

    pe = shutter_pose_end[..., None, :]
    pt_end, valid_end = camera_ray_to_image_point(
        cam, pose_world_points_to_camera_ray(pe, world_points), margin_factor
    )
    init_pt = jnp.where(valid_start[..., None], pt_start, pt_end)
    valid = valid_start | valid_end

    pt_prev = init_pt
    valid_rs = valid
    for _ in range(rolling_shutter_iterations):
        t = shutter_relative_frame_time(cam, pt_prev)
        pose_rs = interpolate_shutter_pose(ps, pe, t)
        pt_prev, valid_rs = camera_ray_to_image_point(
            cam, pose_world_points_to_camera_ray(pose_rs, world_points), margin_factor
        )
    final_pt = jnp.where(valid[..., None], pt_prev, init_pt)
    return final_pt, valid & valid_rs
