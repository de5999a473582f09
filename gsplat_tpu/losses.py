"""Training losses (pure jnp; XLA fuses everything).

Behavior parity with gsplat/losses.py (independently implemented):
l1/mse (:53,:66), windowed SSIM (:84-205, Wang et al. 2004 with an 11-tap
sigma-1.5 Gaussian window and symmetric padding via conv), disparity-space
depth L1 (:209), pearson depth (:279), masked l1/ssim (:328,:360), total
variation (:642), opacity/scale regs (:675,:689), huber/smooth-l1/bce/ce
(:708-797), normal cosine (:828), reducers (:986-1062), per-gaussian regs
(:1064-1161). The reference's fused CUDA per-gaussian losses
(GaussianLossesCUDA.cu) need no TPU kernel — XLA fuses these elementwise
chains into one pass.

Image layout convention: [..., H, W, C] (channels-last, the rasterizer's
output layout). The reference uses NCHW; pure layout difference.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


@functools.lru_cache(maxsize=8)
def _ssim_window(window_size: int, dtype_name: str):
    # cache NUMPY (a jnp constant created inside a jit trace would leak)
    import numpy as np

    sigma = 1.5
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    return (g / g.sum()).astype(dtype_name)


def _blur2d(img: jax.Array, w1d: jax.Array) -> jax.Array:
    """Separable depthwise Gaussian blur over [..., H, W, C], zero-padded.

    Matches torch F.conv2d(..., padding=ws//2) semantics (zero padding).
    """
    ws = w1d.shape[0]
    pad = ws // 2
    lead = img.shape[:-3]
    H, W, C = img.shape[-3:]
    x = img.reshape((-1, H, W, C))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (ws, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
    )
    w1d = jnp.asarray(w1d, x.dtype)
    kh = jnp.tile(w1d.reshape(ws, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(w1d.reshape(1, ws, 1, 1), (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=dn, feature_group_count=C,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=dn, feature_group_count=C,
    )
    return x.reshape(lead + (H, W, C))


def ssim(
    img1: jax.Array,  # [..., H, W, C] in [0, 1]
    img2: jax.Array,
    window_size: int = 11,
) -> jax.Array:
    """Mean SSIM (Wang et al. 2004). Parity: gsplat torch_ssim_loss (:110)."""
    w1d = _ssim_window(window_size, str(img1.dtype))
    mu1 = _blur2d(img1, w1d)
    mu2 = _blur2d(img2, w1d)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # clamp variances at 0: f32 cancellation in flat regions can make
    # E[x^2] - E[x]^2 slightly negative, collapsing the denominator and
    # producing SSIM > 1 on exactly the degenerate renders where the
    # metric matters most (torchmetrics clamps the same way)
    sigma1_sq = jnp.maximum(_blur2d(img1 * img1, w1d) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_blur2d(img2 * img2, w1d) - mu2_sq, 0.0)
    sigma12 = _blur2d(img1 * img2, w1d) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def ssim_loss(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """1 - SSIM. Parity: gsplat/losses.py:ssim_loss (:154)."""
    return 1.0 - ssim(img1, img2, window_size)


def depth_l1_loss(
    pred_depth: jax.Array, gt_depth: jax.Array, scene_scale: float = 1.0
) -> jax.Array:
    """L1 in disparity space. Parity: losses.py:depth_l1_loss (:209)."""
    disp = jnp.where(pred_depth > 0.0, 1.0 / pred_depth, 0.0)
    disp_gt = jnp.where(gt_depth > 0.0, 1.0 / gt_depth, 0.0)
    return jnp.mean(jnp.abs(disp - disp_gt)) * scene_scale


def pearson_depth_loss(pred_depth: jax.Array, gt_depth: jax.Array) -> jax.Array:
    """1 - Pearson correlation of depths. Parity: losses.py:279."""
    p = pred_depth.reshape(-1)
    g = gt_depth.reshape(-1)
    p = p - jnp.mean(p)
    g = g - jnp.mean(g)
    corr = jnp.sum(p * g) / jnp.maximum(
        jnp.linalg.norm(p) * jnp.linalg.norm(g), 1e-8
    )
    return 1.0 - corr


def masked_l1(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean |pred-gt| over masked elements (mask broadcasts over channels).

    Parity: losses.py:masked_l1 (:328).
    """
    m = jnp.broadcast_to(mask.astype(pred.dtype), pred.shape)
    return jnp.sum(jnp.abs(pred - gt) * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_ssim(
    pred: jax.Array, gt: jax.Array, mask: jax.Array, window_size: int = 11
) -> jax.Array:
    """SSIM over masked pixels (mask applied to the ssim map mean).

    Parity: losses.py:masked_ssim (:360) — the reference computes the SSIM
    map on masked-out images and averages over the mask.
    """
    m = mask.astype(pred.dtype)
    w1d = _ssim_window(window_size, str(pred.dtype))
    img1 = pred * m
    img2 = gt * m
    mu1 = _blur2d(img1, w1d)
    mu2 = _blur2d(img2, w1d)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # variance clamp: see ssim()
    sigma1_sq = jnp.maximum(_blur2d(img1 * img1, w1d) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_blur2d(img2 * img2, w1d) - mu2_sq, 0.0)
    sigma12 = _blur2d(img1 * img2, w1d) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    mb = jnp.broadcast_to(m, ssim_map.shape)
    return jnp.sum(ssim_map * mb) / jnp.maximum(jnp.sum(mb), 1.0)


def total_variation_loss(x: jax.Array) -> jax.Array:
    """Anisotropic TV over [..., H, W, C]. Parity: losses.py:642."""
    dh = jnp.abs(x[..., 1:, :, :] - x[..., :-1, :, :])
    dw = jnp.abs(x[..., :, 1:, :] - x[..., :, :-1, :])
    return jnp.mean(dh) + jnp.mean(dw)


def opacity_reg_loss(opacities: jax.Array) -> jax.Array:
    """Mean |sigmoid-activated opacity|. Parity: losses.py:675."""
    return jnp.mean(jnp.abs(opacities))


def scale_reg_loss(scales: jax.Array) -> jax.Array:
    """Mean |exp-activated scale|. Parity: losses.py:689."""
    return jnp.mean(jnp.abs(scales))


def huber_loss(pred: jax.Array, target: jax.Array, delta: float = 1.0) -> jax.Array:
    d = jnp.abs(pred - target)
    return jnp.mean(
        jnp.where(d <= delta, 0.5 * d * d, delta * (d - 0.5 * delta))
    )


def smooth_l1_loss(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def bce_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    eps = 1e-12
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def bce_with_logits_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_clipped(pred: jax.Array, target: jax.Array, eps: float = 0.001) -> jax.Array:
    """BCE with inputs clipped to [eps, 1-eps]. Parity: losses.py:779."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def cross_entropy_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    if target.ndim == logits.ndim:
        return -jnp.mean(jnp.sum(target * logp, axis=-1))
    return -jnp.mean(jnp.take_along_axis(logp, target[..., None], axis=-1))


def depth_inverse_mse(pred: jax.Array, target: jax.Array, eps: float = 1e-6) -> jax.Array:
    """MSE of inverse depths. Parity: losses.py:799."""
    return jnp.mean((1.0 / (pred + eps) - 1.0 / (target + eps)) ** 2)


def log_l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    """log(1 + |pred - target|) mean. Parity: losses.py:815."""
    return jnp.mean(jnp.log1p(jnp.abs(pred - target)))


def normal_cosine_loss(pred_normal: jax.Array, gt_normal: jax.Array) -> jax.Array:
    """1 - cos similarity of unit normals [..., 3]. Parity: losses.py:828."""
    dot = jnp.sum(pred_normal * gt_normal, axis=-1)
    return jnp.mean(1.0 - dot)


# ---------------------------------------------------------------------------
# Reducers + per-gaussian regularizers (losses.py:986-1161; fused CUDA
# equivalents in GaussianLossesCUDA.cu — XLA fuses these for free)
# ---------------------------------------------------------------------------


def reduce_mean(value: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    if mask is None:
        return jnp.mean(value)
    m = mask.astype(value.dtype)
    return jnp.sum(value * m) / jnp.maximum(jnp.sum(m), 1.0)


def reduce_quantile(value: jax.Array, quantile: float) -> jax.Array:
    """Mean of the values above the given quantile. Parity: losses.py:1025."""
    q = jnp.quantile(value, quantile)
    m = (value >= q).astype(value.dtype)
    return jnp.sum(value * m) / jnp.maximum(jnp.sum(m), 1.0)


def reduce_sum(value: jax.Array) -> jax.Array:
    return jnp.sum(value)


def gaussian_scale_reg(
    scales: jax.Array, visibility: Optional[jax.Array] = None
) -> jax.Array:
    """Per-gaussian scale magnitude reg (activated scales [N, 3]).

    Parity: losses.py:gaussian_scale_reg (:1064) — mean |scale| over
    (optionally visible) gaussians.
    """
    v = jnp.abs(scales).sum(-1)
    return reduce_mean(v, visibility)


def gaussian_density_reg(
    densities: jax.Array, visibility: Optional[jax.Array] = None
) -> jax.Array:
    """Mean opacity reg over (visible) gaussians. Parity: losses.py:1091."""
    return reduce_mean(densities, visibility)


def gaussian_z_scale_reg(z_scales: jax.Array, threshold: float) -> jax.Array:
    """relu(z_scale - threshold) mean — flatness prior. Parity: :1119."""
    return jnp.mean(jnp.maximum(z_scales - threshold, 0.0))


def out_of_bound_loss(positions: jax.Array, cuboid_dims: jax.Array) -> jax.Array:
    """relu(|p| - dims/2) mean over axes. Parity: losses.py:1141."""
    return jnp.mean(jnp.maximum(jnp.abs(positions) - cuboid_dims / 2.0, 0.0))


# ---------------------------------------------------------------------------
# Lidar losses (parity: gsplat/losses.py:474-641). Masked reductions use
# weighted means ((v*m).sum()/max(m.sum(),1)) instead of boolean indexing so
# they stay jit-compatible with static shapes.
# ---------------------------------------------------------------------------

_LOSS_FNS = None


def _resolve_loss_fn(loss_fn):
    """Name -> elementwise loss fn (parity: losses.py:_resolve_loss_fn)."""
    global _LOSS_FNS
    if _LOSS_FNS is None:
        _LOSS_FNS = {
            "l1": l1_loss,
            "mse": mse_loss,
            "huber": huber_loss,
            "smooth_l1": smooth_l1_loss,
            "bce": bce_loss,
            "bce_clipped": bce_clipped,
            "bce_with_logits": bce_with_logits_loss,
        }
    if callable(loss_fn):
        return loss_fn
    if loss_fn not in _LOSS_FNS:
        raise ValueError(f"unknown loss_fn {loss_fn!r}")
    return _LOSS_FNS[loss_fn]


def _elementwise(fn, pred, target):
    """Apply fn elementwise; l1/mse here reduce, so inline their cores."""
    if fn is l1_loss:
        return jnp.abs(pred - target)
    if fn is mse_loss:
        return (pred - target) ** 2
    return fn(pred, target)


def _masked_mean(v: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(v)
    m = mask.reshape(v.shape).astype(v.dtype)
    return (v * m).sum() / jnp.maximum(m.sum(), 1.0)


def lidar_distance_loss(
    pred_distance: jax.Array,
    gt_distance: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    loss_fn="l1",
) -> jax.Array:
    """Loss on lidar hit distance in direct distance space (losses.py:474)."""
    fn = _resolve_loss_fn(loss_fn)
    v = _elementwise(fn, pred_distance.reshape(-1), gt_distance.reshape(-1))
    return _masked_mean(v, valid_mask)


def lidar_intensity_loss(
    pred_intensity: jax.Array,
    gt_intensity: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    loss_fn="l1",
) -> jax.Array:
    """Loss on lidar return intensity (losses.py:513)."""
    fn = _resolve_loss_fn(loss_fn)
    v = _elementwise(fn, pred_intensity.reshape(-1), gt_intensity.reshape(-1))
    return _masked_mean(v, valid_mask)


def lidar_raydrop_loss(
    pred_raydrop: jax.Array,
    gt_raydrop: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    loss_fn="bce_with_logits",
) -> jax.Array:
    """Loss on lidar ray-drop prediction (losses.py:549)."""
    fn = _resolve_loss_fn(loss_fn)
    v = _elementwise(
        fn, pred_raydrop.reshape(-1), gt_raydrop.reshape(-1).astype(jnp.float32)
    )
    return _masked_mean(v, valid_mask)


def lidar_background_loss(
    pred_opacity: jax.Array,
    background_mask: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    loss_fn="bce",
) -> jax.Array:
    """Penalize opacity on background/sky lidar rays (losses.py:587).

    Target is 0 for background rays, 1 for foreground.
    """
    fn = _resolve_loss_fn(loss_fn)
    pred = jnp.clip(pred_opacity.reshape(-1), 0.0, 1.0)
    target = (~background_mask.reshape(-1).astype(bool)).astype(jnp.float32)
    v = _elementwise(fn, pred, target)
    return _masked_mean(v, valid_mask)


def binocular_disparity_l1(
    pred_depth: jax.Array,
    gt_depth: jax.Array,
    mask: Optional[jax.Array] = None,
    eps: float = 1e-7,
) -> jax.Array:
    """L1 in inverse-depth space; pairs valid only when BOTH depths are
    (losses.py:227, the G-SHARP binocular branch)."""
    valid_pred = jnp.abs(pred_depth) > eps
    valid_gt = jnp.abs(gt_depth) > eps
    pair = valid_pred & valid_gt
    pred_inv = 1.0 / jnp.where(valid_pred, pred_depth, 1.0)
    gt_inv = 1.0 / jnp.where(valid_gt, gt_depth, 1.0)
    m = pair.astype(pred_depth.dtype)
    if mask is not None:
        m = m * mask.astype(pred_depth.dtype)
    return masked_l1(pred_inv, gt_inv, m)


def relu_sum(value: jax.Array, eps: float) -> jax.Array:
    """relu(value - eps).sum() (losses.py:858)."""
    return jnp.maximum(value - eps, 0.0).sum()


def weights_reg(weights_list, dim: int = 1) -> jax.Array:
    """Mean of squared weight norms (losses.py:871)."""
    return jnp.mean(
        jnp.concatenate([(w**2).sum(dim).reshape(-1) for w in weights_list])
    )


def identity_distance(
    grid: jax.Array, num_rows: int = 3, num_cols: int = 4
) -> jax.Array:
    """Frobenius distance of an affine grid from identity (losses.py:884)."""
    B = grid.shape[0]
    rest = grid.shape[2:]
    reshaped = grid.reshape(B, num_rows, num_cols, *rest)
    eye = jnp.eye(num_rows, num_cols).reshape(
        1, num_rows, num_cols, *([1] * len(rest))
    )
    diff = reshaped - eye
    return jnp.sqrt((diff**2).sum(axis=(1, 2)))


def total_variation_temporal(x: jax.Array, loss_mask: jax.Array) -> jax.Array:
    """TV along the temporal (leading) dim (losses.py:906)."""
    if x.shape[0] <= 1:
        return jnp.zeros((1,), x.dtype)
    tv_t = jnp.mean(jnp.diff(x, axis=0) ** 2, axis=(1, 2, 3, 4))
    return tv_t * loss_mask


class LinearLambdaScheduler:
    """Linear loss-weight ramp between (start_step, start) and
    (end_step, end) (parity: losses.py:931)."""

    def __init__(self, start: float, end: float, start_step: int, end_step: int):
        assert end_step >= start_step
        self.start, self.end = float(start), float(end)
        self.start_step, self.end_step = int(start_step), int(end_step)

    def __call__(self, step) -> jax.Array:
        t = (jnp.asarray(step, jnp.float32) - self.start_step) / max(
            self.end_step - self.start_step, 1
        )
        t = jnp.clip(t, 0.0, 1.0)
        return self.start + t * (self.end - self.start)


def fused_gaussian_losses(
    scales: jax.Array,  # [N, 3] post-activation
    densities: jax.Array,  # [N]
    z_scales: jax.Array,  # [N]
    positions: jax.Array,  # [N, 3]
    cuboid_dims: jax.Array,  # [N, 3]
    z_scale_threshold: float = 0.0,
    visibility: Optional[jax.Array] = None,
):
    """All four per-gaussian regularizers in one jitted call.

    The reference fuses these in a CUDA kernel (GaussianLossesCUDA.cu:33-80
    via losses_fused.py:FusedGaussianLosses); under XLA a single jit of the
    four elementwise terms fuses to one pass automatically. Returns
    (loss_scale, loss_density, loss_z_scale, loss_oob), each UNREDUCED
    per-element like the CUDA op.
    """
    loss_scale = jnp.abs(scales)
    loss_density = jnp.abs(densities)
    if visibility is not None:
        v = visibility.reshape(-1)
        loss_scale = loss_scale * v[:, None]
        loss_density = loss_density * v
    loss_z = jnp.maximum(z_scales - z_scale_threshold, 0.0)
    loss_oob = jnp.maximum(jnp.abs(positions) - cuboid_dims / 2.0, 0.0)
    return loss_scale, loss_density, loss_z, loss_oob
