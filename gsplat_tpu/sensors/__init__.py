"""Sensor models: cameras (pinhole/fisheye/ftheta + distortion, rolling
shutter) as pure-jnp functional ops.

TPU-native analog of the reference's ``gsplat/sensors`` package
(design doc: gsplat/sensors/design.md:1-67) and the torch reference
implementations in gsplat/cuda/_torch_cameras.py and _math.py. Instead of
CUDA kernels + TorchScript classes, every model is a stateless jnp function
over a parameter dataclass; fixed-iteration Newton solves replace the
data-dependent loops so everything jits and differentiates.
"""

from .params import (
    CameraLinearParams,
    FThetaCameraDistortionParameters,
    FThetaPolynomialType,
    RollingShutterType,
    UnscentedTransformParameters,
)
from .external import (
    BivariateWindshieldModelParameters,
    ExternalDistortionModelParameters,
    apply_external_distortion,
)
from .cameras import (
    CameraModel,
    generate_rays,
    make_camera,
    camera_ray_to_image_point,
    image_point_to_camera_ray,
    image_point_to_world_ray_shutter_pose,
    interpolate_shutter_pose,
    pose_camera_ray_to_world_ray,
    pose_world_points_to_camera_ray,
    shutter_relative_frame_time,
    viewmat_to_pose,
    world_point_to_image_point_shutter_pose,
)

__all__ = [
    "BivariateWindshieldModelParameters",
    "CameraLinearParams",
    "ExternalDistortionModelParameters",
    "apply_external_distortion",
    "CameraModel",
    "FThetaCameraDistortionParameters",
    "FThetaPolynomialType",
    "RollingShutterType",
    "UnscentedTransformParameters",
    "camera_ray_to_image_point",
    "generate_rays",
    "image_point_to_camera_ray",
    "image_point_to_world_ray_shutter_pose",
    "interpolate_shutter_pose",
    "make_camera",
    "pose_camera_ray_to_world_ray",
    "pose_world_points_to_camera_ray",
    "shutter_relative_frame_time",
    "viewmat_to_pose",
    "world_point_to_image_point_shutter_pose",
]
