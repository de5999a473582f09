"""Evaluation metrics: PSNR and LPIPS (VGG) in pure JAX.

Parity: the reference evaluates PSNR/SSIM/LPIPS via torchmetrics
(simple_trainer.py:257, lpips_net="vgg"|"alex").  SSIM lives in
gsplat_tpu.losses; here are PSNR and an LPIPS implementation that runs the
standard VGG16-feature + linear-head pipeline from a local weights file.

LPIPS needs pretrained weights (VGG16 features + LPIPS linear heads).
This environment has no network egress and ships no weights, so
`lpips()` requires `weights_path` pointing to an .npz with arrays:
  conv{i}_w, conv{i}_b  for i in 0..12   (VGG16 conv stack, OIHW)
  lin{j}_w               for j in 0..4    (LPIPS 1x1 heads, [C_j])
Convert them once from the torchmetrics/lpips checkpoint with
`scripts/export_lpips_weights.py` on a machine that has them.  Without a
weights file, callers should skip the metric (report None), never fake it.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, n_convs_in_block)
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# LPIPS taps the activations after the last conv of each block (post-ReLU)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def psnr(img: jax.Array, ref: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean((img - ref) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


def _vgg_features(x: jax.Array, w) -> list:
    """x: [B, H, W, 3] in [-1, 1] (LPIPS convention). Returns block taps."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    taps = []
    ci = 0
    for _, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            kernel = w[f"conv{ci}_w"]  # OIHW
            bias = w[f"conv{ci}_b"]
            x = jax.lax.conv_general_dilated(
                x, jnp.transpose(kernel, (2, 3, 1, 0)),  # -> HWIO
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            x = jax.nn.relu(x)
            ci += 1
        taps.append(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return taps


def load_lpips_weights(weights_path: str):
    w = np.load(weights_path)
    return {k: jnp.asarray(w[k]) for k in w.files}


def lpips(
    img0: jax.Array,  # [B, H, W, 3] in [0, 1]
    img1: jax.Array,
    weights,  # dict from load_lpips_weights, or a path string
) -> jax.Array:
    """LPIPS(VGG) distance per batch element [B].

    Pipeline parity with the standard implementation: inputs scaled to
    [-1, 1], VGG16 block taps, per-channel unit-normalize, squared diff,
    1x1 linear heads, spatial mean, sum over taps.
    """
    if isinstance(weights, (str, os.PathLike)):
        weights = load_lpips_weights(weights)
    x0 = img0 * 2.0 - 1.0
    x1 = img1 * 2.0 - 1.0
    f0 = _vgg_features(x0, weights)
    f1 = _vgg_features(x1, weights)
    total = 0.0
    for j, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2  # [B, H, W, C]
        lin = weights[f"lin{j}_w"].reshape(1, 1, 1, -1)  # [C]
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total
