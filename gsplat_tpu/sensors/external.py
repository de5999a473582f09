"""External distortion models (windshield-style camera-ray warps).

Behavior parity (independently implemented, pure jnp):
  gsplat/cuda/include/ExternalDistortion.cuh — the bivariate windshield
  model warps a CAMERA-FRAME RAY before/after the base camera model:
    phi = asin(x/|r|), theta = asin(y/|r|)
    x' = sin(P_h(phi, theta)), y' = sin(P_v(phi, theta))
    z' = sqrt(1 - min(x'^2+y'^2, 1)) * sign(z)
  with P_* bivariate polynomials in MAX_ORDER=5 triangular Horner layout
  (21 coefficients, zero padded; pad_coefficients_to_max_order). Forward
  polynomials distort (world ray -> apparent in-camera ray); the inverse
  pair undistorts (camera ray -> world ray).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MAX_ORDER = 5
MAX_COEFFS = 21  # (MAX_ORDER + 1)(MAX_ORDER + 2) / 2

_TRIANGULAR_ORDERS = {1: 0, 3: 1, 6: 2, 10: 3, 15: 4, 21: 5}


class ExternalDistortionModelParameters:
    """Base marker (parity: _wrapper.py:ExternalDistortionModelParameters)."""


def pad_coefficients_to_max_order(src: Sequence[float]) -> np.ndarray:
    """Zero-pad triangular coefficients to the MAX_ORDER layout.

    Group k (y^k term) holds (order - k + 1) x-coefficients; in the padded
    layout each group k has (MAX_ORDER - k + 1) slots
    (parity: ExternalDistortion.cuh:pad_coefficients_to_max_order).
    """
    src = np.asarray(src, np.float32).reshape(-1)
    if len(src) not in _TRIANGULAR_ORDERS:
        raise ValueError(
            f"invalid coefficient count {len(src)}; expected one of "
            f"{sorted(_TRIANGULAR_ORDERS)}"
        )
    order = _TRIANGULAR_ORDERS[len(src)]
    dst = np.zeros(MAX_COEFFS, np.float32)
    so = do = 0
    for k in range(MAX_ORDER + 1):
        dsz = MAX_ORDER - k + 1
        ssz = order - k + 1 if k <= order else 0
        dst[do : do + ssz] = src[so : so + ssz]
        so += ssz
        do += dsz
    return dst


@dataclasses.dataclass(frozen=True)
class BivariateWindshieldModelParameters(ExternalDistortionModelParameters):
    """Forward + inverse bivariate polynomial pairs (triangular coeffs)."""

    horizontal_poly: Sequence[float]
    vertical_poly: Sequence[float]
    horizontal_poly_inverse: Sequence[float]
    vertical_poly_inverse: Sequence[float]

    MAX_ORDER = MAX_ORDER
    MAX_COEFFS = MAX_COEFFS

    def padded(self):
        """(h, v, h_inv, v_inv) jnp arrays in MAX_ORDER layout."""
        return tuple(
            jnp.asarray(pad_coefficients_to_max_order(p))
            for p in (
                self.horizontal_poly, self.vertical_poly,
                self.horizontal_poly_inverse, self.vertical_poly_inverse,
            )
        )

    @classmethod
    def identity(cls) -> "BivariateWindshieldModelParameters":
        """Polynomials P_h(phi, theta) = phi, P_v = theta (no-op warp)."""
        return cls(
            horizontal_poly=(0.0, 1.0, 0.0),
            vertical_poly=(0.0, 0.0, 1.0),
            horizontal_poly_inverse=(0.0, 1.0, 0.0),
            vertical_poly_inverse=(0.0, 0.0, 1.0),
        )


def eval_bivariate_poly(coeffs: Array, x: Array, y: Array) -> Array:
    """Nested Horner over the MAX_ORDER triangular layout
    (parity: ExternalDistortion.cuh:eval_bivariate_poly)."""
    outer = []
    start = 0
    for inner_order in range(MAX_ORDER, -1, -1):
        r = jnp.zeros_like(x)
        for idx in range(start + inner_order, start - 1, -1):
            r = r * x + coeffs[idx]
        outer.append(r)
        start += inner_order + 1
    result = jnp.zeros_like(y)
    for idx in range(MAX_ORDER, -1, -1):
        result = result * y + outer[idx]
    return result


def distort_camera_ray(
    h_poly: Array, v_poly: Array, ray: Array
) -> Array:
    """Warp camera-frame rays [..., 3] through the bivariate model."""
    length = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    safe = length[..., 0] >= 1e-6
    lin = jnp.where(length < 1e-6, 1.0, length)
    phi = jnp.arcsin(jnp.clip(ray[..., 0] / lin[..., 0], -1.0, 1.0))
    theta = jnp.arcsin(jnp.clip(ray[..., 1] / lin[..., 0], -1.0, 1.0))
    x = jnp.sin(eval_bivariate_poly(h_poly, phi, theta))
    y = jnp.sin(eval_bivariate_poly(v_poly, phi, theta))
    z = jnp.sqrt(1.0 - jnp.minimum(x * x + y * y, 1.0)) * jnp.sign(
        jnp.where(ray[..., 2] == 0, 1.0, ray[..., 2])
    )
    out = jnp.stack([x, y, z], axis=-1)
    return jnp.where(safe[..., None], out, ray)


def apply_external_distortion(
    params: BivariateWindshieldModelParameters, ray: Array, inverse: bool = False
) -> Array:
    """Forward distort (or inverse-undistort) camera rays."""
    h, v, hi, vi = params.padded()
    if inverse:
        return distort_camera_ray(hi, vi, ray)
    return distort_camera_ray(h, v, ray)
