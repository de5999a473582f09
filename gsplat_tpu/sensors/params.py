"""Sensor parameter types.

Behavior parity (independently implemented):
  - RollingShutterType / FThetaPolynomialType enums:
    gsplat/cuda/_wrapper.py:192-202.
  - FThetaCameraDistortionParameters: the CUDA custom class bound at
    gsplat/cuda/include/Cameras.h (6+6 poly coeffs, linear [c,d;e,1]
    transform, max_angle).
  - UnscentedTransformParameters defaults: Cameras.h:59-65
    (alpha=0.1, beta=2, kappa=0, in_image_margin_factor=0.1,
    require_all_sigma_points_valid=False).
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum
from typing import Sequence


class RollingShutterType(IntEnum):
    ROLLING_TOP_TO_BOTTOM = 0
    ROLLING_LEFT_TO_RIGHT = 1
    ROLLING_BOTTOM_TO_TOP = 2
    ROLLING_RIGHT_TO_LEFT = 3
    GLOBAL = 4


class FThetaPolynomialType(IntEnum):
    PIXELDIST_TO_ANGLE = 0
    ANGLE_TO_PIXELDIST = 1


@dataclasses.dataclass(frozen=True)
class FThetaCameraDistortionParameters:
    """F-theta polynomial camera distortion.

    One of the two polynomials is the calibrated "reference"; the other
    direction is computed by Newton inversion of the reference
    (gsplat/cuda/_torch_cameras.py:1786-2165).
    """

    reference_poly: FThetaPolynomialType
    pixeldist_to_angle_poly: Sequence[float]  # 6 coeffs, full polynomial
    angle_to_pixeldist_poly: Sequence[float]  # 6 coeffs, full polynomial
    max_angle: float
    # Linear transform A = [[c, d], [e, 1]] applied to distorted coords.
    linear_cde: Sequence[float] = (1.0, 0.0, 0.0)

    def __post_init__(self):
        assert len(self.pixeldist_to_angle_poly) == 6
        assert len(self.angle_to_pixeldist_poly) == 6
        assert len(self.linear_cde) == 3


@dataclasses.dataclass(frozen=True)
class UnscentedTransformParameters:
    """Sigma-point parameterization (Wan & van der Merwe 2000)."""

    alpha: float = 0.1
    beta: float = 2.0
    kappa: float = 0.0
    in_image_margin_factor: float = 0.1
    require_all_sigma_points_valid: bool = False

    def __post_init__(self):
        D = 3
        if not self.alpha * self.alpha * (D + self.kappa) > 0.0:
            raise ValueError(
                "UT parameters invalid: alpha^2 * (D + kappa) must be > 0"
            )


@dataclasses.dataclass(frozen=True)
class CameraLinearParams:
    """Static per-model Newton/validity knobs (not traced)."""

    max_undistortion_iterations: int = 5
    newton_iterations: int = 20
    min_2d_norm: float = 1e-6
