"""Core Gaussian math: quaternions, covariance construction, camera transforms.

Pure-jnp building blocks shared by the reference (oracle) path and the fused
pipelines. Behavior parity targets (see reference, not copied):
  - quat -> rotmat + covariance/precision: gsplat/cuda/_math.py
    (`_quat_to_rotmat`, `_quat_scale_to_covar_preci`) and
    gsplat/cuda/csrc/include/Utils.cuh (`quat_scale_to_covar_preci`).
  - Quaternion convention is wxyz and inputs need not be normalized.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis`, safe for zero vectors AND their grads.

    The clamp sits on the squared sum (not the norm): sqrt's derivative at
    zero is infinite, and `0 * inf = NaN` would leak through `where`/`max`
    into gradients of culled gaussians (zero quats -> NaN everywhere).
    Zero vectors normalize to zero, matching torch.nn.functional.normalize
    (the reference's _torch_impl renders zero quats as identity rotations).
    """
    s = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(s, eps * eps))


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """Convert (unnormalized) wxyz quaternions [..., 4] to rotation matrices [..., 3, 3].

    Parity: gsplat/cuda/_math.py:_quat_to_rotmat (normalizes first).
    """
    quats = normalize(quats, axis=-1)
    w, x, y, z = jnp.moveaxis(quats, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rot = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return rot.reshape(quats.shape[:-1] + (3, 3))


def rotmat_to_quat(rotmats: jax.Array) -> jax.Array:
    """Rotation matrices [..., 3, 3] -> wxyz quaternions [..., 4] (w >= 0).

    Branch-free Shepperd-style construction evaluated with `where` so it is
    jit/grad friendly. Parity: gsplat/cuda/_math.py:_rotmat_to_quat.
    """
    m = rotmats
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def _quat(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # Four candidate constructions; pick the numerically best one.
    q0 = _quat(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1 = _quat(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = _quat(m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21)
    q3 = _quat(m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11)

    case = jnp.where(
        tr > 0.0,
        0,
        jnp.where(
            (m00 >= m11) & (m00 >= m22), 1, jnp.where(m11 >= m22, 2, 3)
        ),
    )
    case = case[..., None]
    q = jnp.select(
        [case == 0, case == 1, case == 2, case == 3], [q0, q1, q2, q3]
    )
    q = normalize(q, axis=-1, eps=1e-12)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_scale_to_covar_preci(
    quats: jax.Array,
    scales: jax.Array,
    compute_covar: bool = True,
    compute_preci: bool = True,
    triu: bool = False,
) -> Tuple[Optional[jax.Array], Optional[jax.Array]]:
    """Build 3D covariance (R S S^T R^T) and/or precision from quat+scale.

    Parity: gsplat/cuda/_math.py:_quat_scale_to_covar_preci and
    gsplat/cuda/csrc/QuatScaleToCovarCUDA.cu. `triu` returns the upper
    triangle [(..., 6)] in row-major order (xx, xy, xz, yy, yz, zz).
    """
    R = quat_to_rotmat(quats)  # [..., 3, 3]
    covars = precis = None
    if compute_covar:
        M = R * scales[..., None, :]  # R @ diag(S)
        covars = _sym_mmT(M)
        if triu:
            covars = _to_triu(covars)
    if compute_preci:
        P = R * (1.0 / scales)[..., None, :]
        precis = _sym_mmT(P)
        if triu:
            precis = _to_triu(precis)
    return covars, precis


def _sym_mmT(M: jax.Array) -> jax.Array:
    """M @ M^T for [..., 3, 3], scalarized (full f32 precision; no MXU).

    Tiny batched matmuls hit the MXU with bf16-reduced default precision and
    terrible tiling; explicit elementwise products keep the whole chain on
    the VPU at full float32.
    """
    rows = [M[..., i, :] for i in range(3)]

    def dot(a, b):
        return jnp.sum(a * b, axis=-1)

    e = {
        (i, j): dot(rows[i], rows[j]) for i in range(3) for j in range(i, 3)
    }
    return jnp.stack(
        [
            jnp.stack([e[(0, 0)], e[(0, 1)], e[(0, 2)]], axis=-1),
            jnp.stack([e[(0, 1)], e[(1, 1)], e[(1, 2)]], axis=-1),
            jnp.stack([e[(0, 2)], e[(1, 2)], e[(2, 2)]], axis=-1),
        ],
        axis=-2,
    )


def _to_triu(mats: jax.Array) -> jax.Array:
    """Symmetric [..., 3, 3] -> upper triangle [..., 6] (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [
            mats[..., 0, 0], mats[..., 0, 1], mats[..., 0, 2],
            mats[..., 1, 1], mats[..., 1, 2], mats[..., 2, 2],
        ],
        axis=-1,
    )


def triu_to_full(triu: jax.Array) -> jax.Array:
    """Upper triangle [..., 6] -> full symmetric [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = jnp.moveaxis(triu, -1, 0)
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of wxyz quaternions. Parity: gsplat/cuda/_math.py:_quat_multiply."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_inverse(q: jax.Array) -> jax.Array:
    """Inverse of a unit wxyz quaternion (conjugate). Parity: _math.py:_quat_inverse."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4] (wxyz)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quaternions (wxyz).

    Parity: gsplat/cuda/_math.py:_quat_slerp and
    gsplat/geometry/kernels/cuda/csrc/quaternion.cu. Takes the short arc;
    falls back to lerp for nearly-parallel quaternions.
    """
    q0 = normalize(q0, axis=-1, eps=1e-12)
    q1 = normalize(q1, axis=-1, eps=1e-12)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    near = dot > 1.0 - 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / sin_theta)
    w1 = jnp.where(near, t, jnp.sin(t * theta) / sin_theta)
    return normalize(w0 * q0 + w1 * q1, axis=-1, eps=1e-12)


def world_to_cam(
    means: jax.Array,  # [..., N, 3]
    covars: jax.Array,  # [..., N, 3, 3]
    viewmats: jax.Array,  # [..., C, 4, 4]
) -> Tuple[jax.Array, jax.Array]:
    """Transform means/covariances from world to camera frame.

    Parity: gsplat/cuda/_torch_impl.py:_world_to_cam. Returns
    means_c [..., C, N, 3] and covars_c [..., C, N, 3, 3].
    """
    R = viewmats[..., :3, :3]  # [..., C, 3, 3]
    t = viewmats[..., :3, 3]  # [..., C, 3]
    means_c = (
        jnp.einsum("...cij,...nj->...cni", R, means, precision="highest")
        + t[..., None, :]
    )
    covars_c = jnp.einsum(
        "...cij,...njk,...clk->...cnil", R, covars, R, precision="highest"
    )
    return means_c, covars_c
