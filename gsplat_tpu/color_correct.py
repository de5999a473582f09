"""Per-image color correction for eval metrics (multinerf-style).

Parity: gsplat/color_correct.py (:21 quadratic, :98 affine) — least-squares
color warps from a rendered image to a reference, with saturation-aware
masking. Pure jnp (lstsq via normal equations; jittable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lstsq(A: jax.Array, b: jax.Array) -> jax.Array:
    """Least squares via regularized normal equations (TPU-friendly)."""
    AtA = A.T @ A
    Atb = A.T @ b
    AtA = AtA + 1e-6 * jnp.eye(AtA.shape[0], dtype=A.dtype)
    return jnp.linalg.solve(AtA, Atb)


def color_correct_quadratic(
    img: jax.Array, ref: jax.Array, num_iters: int = 5, eps: float = 0.5 / 255
) -> jax.Array:
    """Quadratic color warp of `img` toward `ref`. Parity: color_correct.py:21."""
    assert img.shape[-1] == ref.shape[-1]
    C = img.shape[-1]
    img_mat = img.reshape(-1, C)
    ref_mat = ref.reshape(-1, C)

    def unclipped(z):
        return (z >= eps) & (z <= 1 - eps)

    mask0 = unclipped(img_mat)
    for _ in range(num_iters):
        a_mat = []
        for c in range(C):
            a_mat.append(img_mat[:, c : c + 1] * img_mat[:, c:])  # quadratic
        a_mat.append(img_mat)  # linear
        a_mat.append(jnp.ones_like(img_mat[:, :1]))  # bias
        a_mat = jnp.concatenate(a_mat, axis=-1)
        warp = []
        for c in range(C):
            b = ref_mat[:, c]
            m = mask0[:, c] & unclipped(img_mat[:, c]) & unclipped(b)
            ma = jnp.where(m[:, None], a_mat, 0.0)
            mb = jnp.where(m, b, 0.0)
            warp.append(_lstsq(ma, mb))
        warp = jnp.stack(warp, axis=-1)
        img_mat = jnp.clip(a_mat @ warp, 0.0, 1.0)
    return img_mat.reshape(img.shape)


def color_correct_affine(img: jax.Array, ref: jax.Array) -> jax.Array:
    """Per-channel affine fit ref -> img, inverted and applied to img.

    Parity: color_correct.py:color_correct_affine (:98).
    """
    assert img.shape[-1] == ref.shape[-1]
    C = img.shape[-1]
    img_mat = img.reshape(-1, C)
    ref_mat = ref.reshape(-1, C)
    out = []
    for c in range(C):
        x = ref_mat[:, c]
        y = img_mat[:, c]
        mx, my = x.mean(), y.mean()
        cov = jnp.mean((x - mx) * (y - my))
        var = jnp.maximum(jnp.mean((x - mx) ** 2), 1e-12)
        a = cov / var  # y ~ a x + b
        b = my - a * mx
        # invert: x ~ (y - b) / a
        out.append((y - b) / jnp.where(jnp.abs(a) < 1e-8, 1.0, a))
    return jnp.clip(
        jnp.stack(out, axis=-1).reshape(img.shape), 0.0, 1.0
    )
