"""Quaternion / SE3 / trajectory functional API (pure jnp, differentiable).

Behavior parity with gsplat/geometry/functional (pose.py + quaternion.py,
implementations in geometry/kernels/{pose_ops,quaternion_ops}.py and the
CUDA kernels geometry/kernels/cuda/csrc/{pose.cu,quaternion.cu}).

Convention: this module uses **xyzw** quaternions like the reference
geometry package (the splatting core uses wxyz — see ops/math.py). All ops
are elementwise jnp: XLA fuses them and autodiff supplies gradients, which
is the TPU-native replacement for the reference's fused CUDA kernels.
"""

from __future__ import annotations

from typing import Dict, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = [
    "frame_transform_poses_tquat",
    "se3_interpolate_tracks",
    "se3pose_compose",
    "se3pose_from_matrix",
    "se3pose_inverse_transform_direction",
    "se3pose_inverse_transform_point",
    "se3pose_to_inverse_matrix",
    "se3pose_to_matrix",
    "se3pose_transform_direction",
    "se3pose_transform_point",
    "trajectory_get_rotation_2poses",
    "trajectory_transform_point_1pose",
    "trajectory_transform_point_2poses",
    "quat_angular_distance",
    "quat_conjugate",
    "quat_from_axis_angle",
    "quat_identity",
    "quat_inverse",
    "quat_lerp",
    "quat_manifold_interp",
    "quat_multiply",
    "quat_normalize_safe",
    "quat_rotate_vector",
    "quat_slerp",
    "quat_to_matrix",
]


# ---------------------------------------------------------------------------
# quaternions (xyzw)
# ---------------------------------------------------------------------------


def quat_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    q = jnp.zeros(tuple(shape) + (4,), dtype)
    return q.at[..., 3].set(1.0)


def quat_normalize_safe(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize; near-zero quaternions fall back to identity."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    safe = q / jnp.maximum(n, eps)
    return jnp.where(n > eps, safe, quat_identity(q.shape[:-1], q.dtype))


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_inverse(q: jax.Array) -> jax.Array:
    return quat_conjugate(q) / jnp.maximum(
        jnp.sum(q * q, axis=-1, keepdims=True), 1e-20
    )


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_rotate_vector(q: jax.Array, v: jax.Array) -> jax.Array:
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12
    )
    half = jnp.asarray(angle)[..., None] * 0.5
    return jnp.concatenate(
        [axis * jnp.sin(half), jnp.cos(half)], axis=-1
    )


def quat_to_matrix(q: jax.Array) -> jax.Array:
    q = quat_normalize_safe(q)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_angular_distance(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Geodesic angle between rotations (radians)."""
    q1 = quat_normalize_safe(q1)
    q2 = quat_normalize_safe(q2)
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(dot, 0.0, 1.0))


def _t_col(t, like: jax.Array) -> jax.Array:
    t = jnp.asarray(t, like.dtype)
    if t.ndim == 0:
        return t
    return t.reshape(t.shape + (1,) * (like.ndim - t.ndim))


def quat_lerp(q1: jax.Array, q2: jax.Array, t) -> jax.Array:
    """Normalized linear interpolation along the short arc."""
    q1 = quat_normalize_safe(q1)
    q2 = quat_normalize_safe(q2)
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(dot < 0, -q2, q2)
    tt = jnp.asarray(t, q1.dtype)
    tt = tt[..., None] if tt.ndim == q1.ndim - 1 else tt
    return quat_normalize_safe(q1 + (q2 - q1) * tt)


def quat_slerp(q1: jax.Array, q2: jax.Array, t) -> jax.Array:
    """Spherical interpolation (short arc; lerp fallback near parallel)."""
    q1 = quat_normalize_safe(q1)
    q2 = quat_normalize_safe(q2)
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(dot < 0, -q2, q2)
    dot = jnp.clip(jnp.abs(dot), 0.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - 1e-7))
    sin_t = jnp.sin(theta)
    tt = jnp.asarray(t, q1.dtype)
    tt = tt[..., None] if tt.ndim == q1.ndim - 1 else tt
    near = dot > 1.0 - 1e-6
    w0 = jnp.where(near, 1.0 - tt, jnp.sin((1.0 - tt) * theta) / sin_t)
    w1 = jnp.where(near, tt, jnp.sin(tt * theta) / sin_t)
    return quat_normalize_safe(w0 * q1 + w1 * q2)


def quat_manifold_interp(q1: jax.Array, q2: jax.Array, t) -> jax.Array:
    """q1 * exp(t * log(q1^-1 * q2)) — SO(3) manifold interpolation.

    Parity: geometry/kernels/quaternion_ops.py:quat_manifold_interp (:747).
    """
    q1 = quat_normalize_safe(q1)
    q2 = quat_normalize_safe(q2)
    d = quat_multiply(quat_conjugate(q1), q2)
    d = quat_normalize_safe(d)
    # log: angle-axis of d
    w = jnp.clip(d[..., 3:4], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(jnp.abs(w))
    sign = jnp.where(w < 0, -1.0, 1.0)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-20))
    axis = sign * d[..., :3] / sin_half
    small = angle[..., 0] < 1e-6
    tt = jnp.asarray(t, q1.dtype)
    tt_a = tt[..., None] if tt.ndim == q1.ndim - 1 else tt
    half = 0.5 * tt_a * angle
    step = jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)
    step = jnp.where(
        small[..., None], quat_identity(q1.shape[:-1], q1.dtype), step
    )
    return quat_normalize_safe(quat_multiply(q1, step))


# ---------------------------------------------------------------------------
# SE3 poses: (translation [.., 3], rotation xyzw [.., 4])
# ---------------------------------------------------------------------------


def se3pose_compose(
    t1: jax.Array, q1: jax.Array, t2: jax.Array, q2: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Compose pose1 o pose2: x -> R1 (R2 x + t2) + t1."""
    q1n = quat_normalize_safe(q1)
    return quat_rotate_vector(q1n, t2) + t1, quat_multiply(q1n, q2)


def se3pose_transform_point(t: jax.Array, q: jax.Array, p: jax.Array):
    return quat_rotate_vector(quat_normalize_safe(q), p) + t


def se3pose_transform_direction(t: jax.Array, q: jax.Array, d: jax.Array):
    return quat_rotate_vector(quat_normalize_safe(q), d)


def se3pose_inverse_transform_point(t: jax.Array, q: jax.Array, p: jax.Array):
    qc = quat_conjugate(quat_normalize_safe(q))
    return quat_rotate_vector(qc, p - t)


def se3pose_inverse_transform_direction(t, q, d):
    return quat_rotate_vector(quat_conjugate(quat_normalize_safe(q)), d)


def se3pose_to_matrix(t: jax.Array, q: jax.Array) -> jax.Array:
    R = quat_to_matrix(q)
    M = jnp.zeros(t.shape[:-1] + (4, 4), t.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(t)
    return M.at[..., 3, 3].set(1.0)


def se3pose_to_inverse_matrix(t: jax.Array, q: jax.Array) -> jax.Array:
    R = quat_to_matrix(q)
    Rt = jnp.swapaxes(R, -1, -2)
    M = jnp.zeros(t.shape[:-1] + (4, 4), t.dtype)
    M = M.at[..., :3, :3].set(Rt)
    M = M.at[..., :3, 3].set(
        -jnp.einsum("...ij,...j->...i", Rt, t)
    )
    return M.at[..., 3, 3].set(1.0)


def se3pose_from_matrix(M: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """4x4 matrices -> (translation, xyzw quaternion)."""
    from ..ops.math import rotmat_to_quat

    q_wxyz = rotmat_to_quat(M[..., :3, :3])
    q = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)
    return M[..., :3, 3], q


def frame_transform_poses_tquat(
    poses_t: jax.Array,  # [N, 3]
    poses_q: jax.Array,  # [N, 4] xyzw
    rotation: Tuple[float, float, float, float],  # frame quat xyzw
    translation: Tuple[float, float, float],
) -> Tuple[jax.Array, jax.Array]:
    """Apply a fixed frame transform to pose arrays. Parity: pose_ops:1434."""
    qf = jnp.asarray(rotation, poses_q.dtype)
    tf = jnp.asarray(translation, poses_t.dtype)
    return se3pose_compose(
        jnp.broadcast_to(tf, poses_t.shape),
        jnp.broadcast_to(qf, poses_q.shape),
        poses_t, poses_q,
    )


# ---------------------------------------------------------------------------
# trajectories
# ---------------------------------------------------------------------------


def _traj_alpha(time0, time1, query_time):
    span = time1 - time0
    safe = jnp.where(span == 0, 1.0, span)
    alpha = jnp.where(span == 0, 0.0, (query_time - time0) / safe)
    return alpha


def trajectory_get_rotation_2poses(
    trans0, rot0, time0, trans1, rot1, time1, query_time
) -> Dict[str, jax.Array]:
    """Slerped rotation along a 2-pose trajectory (extrapolating)."""
    alpha = _traj_alpha(time0, time1, query_time)
    lo = jnp.minimum(time0, time1)
    hi = jnp.maximum(time0, time1)
    oob = (query_time < lo) | (query_time > hi)
    return {
        "rotation": quat_slerp(rot0, rot1, alpha),
        "out_of_bounds": oob,
    }


def trajectory_transform_point_2poses(
    trans0, rot0, time0, trans1, rot1, time1, point, query_time
) -> Dict[str, jax.Array]:
    """Transform points by the pose interpolated (or extrapolated) at
    query_time. Parity: pose_ops:trajectory_transform_point_2poses (:1316)."""
    alpha = _traj_alpha(time0, time1, query_time)
    t = trans0 + (trans1 - trans0) * alpha[..., None]
    q = quat_slerp(rot0, rot1, alpha)
    lo = jnp.minimum(time0, time1)
    hi = jnp.maximum(time0, time1)
    oob = (query_time < lo) | (query_time > hi)
    return {
        "point": se3pose_transform_point(t, q, point),
        "out_of_bounds": oob,
    }


def trajectory_transform_point_1pose(
    trans, rot, time, point, query_time
) -> Dict[str, jax.Array]:
    """Single-keyframe trajectory: the pose is constant in time."""
    del time, query_time  # a single keyframe is valid for all times
    return {
        "point": se3pose_transform_point(trans, rot, point),
        "out_of_bounds": jnp.zeros(point.shape[:-1], bool),
    }


def se3_interpolate_tracks(
    pose_translations: jax.Array,  # [M, 3]
    pose_rotations: jax.Array,  # [M, 4] xyzw
    pose_times: jax.Array,  # [M]
    pose_offsets: jax.Array,  # [C]
    pose_counts: jax.Array,  # [C]
    query_time: Union[float, jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Interpolate packed SE3 keyframe tracks at query times.

    Parity: geometry/kernels/pose_ops.py:se3_interpolate_tracks (:1247):
    per-track binary search over its keyframe range, lerp translations +
    slerp rotations, clamped outside the track span.
    """
    M = pose_times.shape[0]
    C = pose_offsets.shape[0]
    offsets = pose_offsets.reshape(C).astype(jnp.int32)
    counts = pose_counts.reshape(C).astype(jnp.int32)
    times = pose_times.reshape(M)
    qt = jnp.broadcast_to(jnp.asarray(query_time, times.dtype), (C,))

    # index of the last keyframe with time <= qt, within each track,
    # via a masked searchsorted over the packed array
    def one(off, cnt, q):
        idxs = off + jnp.arange(M)  # static bound; mask by cnt
        valid = jnp.arange(M) < cnt
        t = jnp.where(valid, times[jnp.minimum(idxs, M - 1)], jnp.inf)
        hi = jnp.sum(t <= q).astype(jnp.int32)  # first index with time > q
        i1 = jnp.clip(hi, 1, jnp.maximum(cnt - 1, 1))
        i0 = i1 - 1
        k0 = off + i0
        k1 = off + jnp.minimum(i1, cnt - 1)
        t0, t1 = times[k0], times[k1]
        span = t1 - t0
        a = jnp.where(span == 0, 0.0, (q - t0) / jnp.where(span == 0, 1, span))
        a = jnp.clip(a, 0.0, 1.0)
        tr = pose_translations[k0] + (
            pose_translations[k1] - pose_translations[k0]
        ) * a
        ro = quat_slerp(pose_rotations[k0], pose_rotations[k1], a)
        return tr, ro

    return jax.vmap(one)(offsets, counts, qt)
