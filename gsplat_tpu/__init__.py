"""gsplat_tpu — a TPU-native 3D Gaussian Splatting framework in JAX/Pallas.

A from-scratch reimplementation of the capabilities of
nerfstudio-project/gsplat with an idiomatic XLA/Pallas/pjit architecture.
Public surface mirrors the reference's curated exports
(gsplat/__init__.py:19-102) as features land.
"""

from . import ops, sensors
from .ops import (
    fully_fused_projection,
    fully_fused_projection_ut,
    isect_offset_encode,
    isect_tiles,
    proj,
    quat_scale_to_covar_preci,
    spherical_harmonics,
)
from .ops.rasterize import rasterize_to_pixels
from .rendering import rasterization, rasterization_2dgs
from .sensors import (
    FThetaCameraDistortionParameters,
    FThetaPolynomialType,
    RollingShutterType,
    UnscentedTransformParameters,
)

__version__ = "0.1.0"

__all__ = [
    "FThetaCameraDistortionParameters",
    "FThetaPolynomialType",
    "RollingShutterType",
    "UnscentedTransformParameters",
    "fully_fused_projection",
    "fully_fused_projection_ut",
    "isect_offset_encode",
    "isect_tiles",
    "ops",
    "sensors",
    "proj",
    "quat_scale_to_covar_preci",
    "rasterization",
    "rasterization_2dgs",
    "rasterize_to_pixels",
    "spherical_harmonics",
]
