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


# ---------------------------------------------------------------------------
# Self-contained perceptual distance (no pretrained weights required)
# ---------------------------------------------------------------------------

_PROXY_CHANNELS = (32, 64, 128)
_proxy_weights_cache = {}


def _proxy_weights(seed: int = 0):
    """Fixed-seed random conv stack (VGG-shaped, 3 blocks).

    Randomly initialized CNN features are a known usable perceptual
    metric (Zhang et al. 2018, Table 5: untrained nets reach ~80% 2AFC
    vs ~69% for pixel metrics) — weaker than trained LPIPS but
    self-contained and deterministic.  Used as `lpips_proxy` when no VGG
    weights file is available (this environment has no egress);
    reported under its own name, never as LPIPS.
    """
    if seed in _proxy_weights_cache:
        return _proxy_weights_cache[seed]
    key = jax.random.PRNGKey(seed)
    ws = []
    cin = 3
    for cout in _PROXY_CHANNELS:
        key, k1 = jax.random.split(key)
        # He-normal 3x3 kernels, HWIO
        w = jax.random.normal(k1, (3, 3, cin, cout), jnp.float32)
        w = w * jnp.sqrt(2.0 / (9 * cin))
        ws.append(w)
        cin = cout
    _proxy_weights_cache[seed] = ws
    return ws


def _proxy_features(x: jax.Array, ws) -> list:
    taps = []
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x)
        taps.append(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return taps


def lpips_proxy(img1: jax.Array, img2: jax.Array, seed: int = 0) -> jax.Array:
    """Perceptual distance from fixed-random conv features.

    Inputs [.., H, W, 3] in [0, 1].  Per tap: channel-unit-normalize,
    squared difference, spatial+channel mean; sum over taps — the LPIPS
    recipe with equal (untrained) head weights.  0 for identical images;
    grows with structural distortion.  NOT comparable to published LPIPS
    numbers (report as `lpips_proxy`).

    Returns a per-image [B] array (scalar if the inputs were unbatched),
    matching the reference lpips contract so the two are drop-in
    interchangeable per view.
    """
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    ws = _proxy_weights(seed)
    x1 = _proxy_features(img1 * 2.0 - 1.0, ws)
    x2 = _proxy_features(img2 * 2.0 - 1.0, ws)
    total = 0.0
    for a, b in zip(x1, x2):
        na = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        # spatial mean of the channel-summed squared difference, per image
        total = total + jnp.mean(jnp.sum((na - nb) ** 2, axis=-1), axis=(1, 2))
    return total[0] if squeeze else total
