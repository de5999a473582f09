"""Spherical-harmonics color evaluation (degrees 0..4, Sloan fast bases).

Parity: gsplat/cuda/_torch_impl.py:_eval_sh_bases_fast/:_spherical_harmonics
and gsplat/cuda/csrc/SphericalHarmonicsCUDA.cu. The constants are the
standard real-SH constants from Sloan, "Efficient Spherical Harmonic
Evaluation", JCGT 2013.

TPU notes: the evaluation is a [N, K] basis times [N, K, D] coefficient
contraction; we compute bases elementwise (VPU) and contract with a single
einsum that XLA maps to the MXU for large D, or fuses for D=3.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh_bases(basis_dim: int, dirs: jax.Array) -> jax.Array:
    """Evaluate real SH bases [..., basis_dim] at unit directions [..., 3].

    Supports basis_dim in {1, 4, 9, 16, 25}.
    """
    if basis_dim not in (1, 4, 9, 16, 25):
        raise ValueError(f"basis_dim must be a square in [1, 25], got {basis_dim}")
    x, y, z = jnp.moveaxis(dirs, -1, 0)
    out = [jnp.full(x.shape, 0.2820947917738781, dtype=dirs.dtype)]
    if basis_dim <= 1:
        return jnp.stack(out, axis=-1)

    fTmpA = -0.48860251190292
    out += [fTmpA * y, -fTmpA * z, fTmpA * x]
    if basis_dim <= 4:
        return jnp.stack(out, axis=-1)

    z2 = z * z
    fTmpB = -1.092548430592079 * z
    fTmpA2 = 0.5462742152960395
    fC1 = x * x - y * y
    fS1 = 2.0 * x * y
    out += [
        fTmpA2 * fS1,                       # 4
        fTmpB * y,                          # 5
        0.9461746957575601 * z2 - 0.3153915652525201,  # 6
        fTmpB * x,                          # 7
        fTmpA2 * fC1,                       # 8
    ]
    if basis_dim <= 9:
        return jnp.stack(out, axis=-1)

    fTmpC = -2.285228997322329 * z2 + 0.4570457994644658
    fTmpB3 = 1.445305721320277 * z
    fTmpA3 = -0.5900435899266435
    fC2 = x * fC1 - y * fS1
    fS2 = x * fS1 + y * fC1
    out += [
        fTmpA3 * fS2,                       # 9
        fTmpB3 * fS1,                       # 10
        fTmpC * y,                          # 11
        z * (1.865881662950577 * z2 - 1.119528997770346),  # 12
        fTmpC * x,                          # 13
        fTmpB3 * fC1,                       # 14
        fTmpA3 * fC2,                       # 15
    ]
    if basis_dim <= 16:
        return jnp.stack(out, axis=-1)

    fTmpD = z * (-4.683325804901025 * z2 + 2.007139630671868)
    fTmpC4 = 3.31161143515146 * z2 - 0.47308734787878
    fTmpB4 = -1.770130769779931 * z
    fTmpA4 = 0.6258357354491763
    fC3 = x * fC2 - y * fS2
    fS3 = x * fS2 + y * fC2
    out += [
        fTmpA4 * fS3,                       # 16
        fTmpB4 * fS2,                       # 17
        fTmpC4 * fS1,                       # 18
        fTmpD * y,                          # 19
        1.984313483298443 * z2 * (1.865881662950577 * z2 - 1.119528997770346)
        + -1.006230589874905 * (0.9461746957575601 * z2 - 0.3153915652525201),  # 20
        fTmpD * x,                          # 21
        fTmpC4 * fC1,                       # 22
        fTmpB4 * fC2,                       # 23
        fTmpA4 * fC3,                       # 24
    ]
    return jnp.stack(out, axis=-1)


def spherical_harmonics(
    degrees_to_use: int,
    dirs: jax.Array,  # [..., N, 3]
    coeffs: jax.Array,  # [N, K, D] or [..., N, K, D]
    masks: Optional[jax.Array] = None,  # [..., N] bool
) -> jax.Array:
    """Evaluate SH colors at directions; returns [..., N, D].

    Coefficients beyond (degrees_to_use + 1)^2 bases are ignored, matching
    gsplat/cuda/_wrapper.py:spherical_harmonics (:434): only the active bands
    contribute (and receive gradients).
    """
    num_bases = num_sh_bases(degrees_to_use)
    K = coeffs.shape[-2]
    assert num_bases <= K, (num_bases, K)
    # normalize directions (parity: _torch_impl.py:_spherical_harmonics)
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_n = dirs / jnp.maximum(norm, 1e-12)
    bases = eval_sh_bases(num_bases, dirs_n)  # [..., N, num_bases]
    colors = jnp.einsum(
        "...nk,...nkd->...nd", bases, coeffs[..., :num_bases, :]
    )
    if masks is not None:
        colors = jnp.where(masks[..., None], colors, 0.0)
    return colors
