from .metrics import lpips, load_lpips_weights, psnr
from .pose import (
    apply_appearance,
    apply_pose_deltas,
    init_appearance,
    init_pose_deltas,
    rotation_6d_to_matrix,
)
from .schedulers import exponential_lr, two_stage_lr

__all__ = [
    "exponential_lr",
    "two_stage_lr",
    "psnr",
    "lpips",
    "load_lpips_weights",
    "init_pose_deltas",
    "apply_pose_deltas",
    "rotation_6d_to_matrix",
    "init_appearance",
    "apply_appearance",
]
