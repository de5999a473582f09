"""Fit random 3D gaussians to a single image (the simplest e2e target).

Analog of the reference's examples/image_fitting.py:32 (SimpleTrainer):
random gaussians on one fov-90 camera at z=+8, Adam(lr=0.01) on all
parameters, MSE loss. Runs on CPU or TPU.

Usage:
    python examples/image_fitting.py --height 256 --width 256 --iterations 1000
"""

from __future__ import annotations

import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gsplat_tpu.losses import mse_loss
from gsplat_tpu.optimizers import adam_init, adam_update
from gsplat_tpu.rendering import rasterization


def default_target(height: int, width: int) -> np.ndarray:
    """Synthetic target (no bundled assets): smooth color gradients + rings."""
    y, x = np.mgrid[0:height, 0:width].astype(np.float32)
    u, v = x / width, y / height
    r = np.sqrt((u - 0.5) ** 2 + (v - 0.5) ** 2)
    img = np.stack(
        [u, v, 0.5 + 0.5 * np.sin(12.0 * r)], axis=-1
    ).astype(np.float32)
    return np.clip(img, 0, 1)


class SimpleTrainer:
    """Trains random gaussians to fit an image. Parity: image_fitting.py:32."""

    def __init__(self, gt_image: np.ndarray, num_points: int = 2000, seed: int = 42):
        self.gt_image = jnp.asarray(gt_image)
        self.num_points = num_points
        self.H, self.W = gt_image.shape[0], gt_image.shape[1]
        fov_x = math.pi / 2.0
        self.focal = 0.5 * float(self.W) / math.tan(0.5 * fov_x)

        rng = np.random.default_rng(seed)
        bd = 2.0
        means = bd * (rng.random((num_points, 3), dtype=np.float32) - 0.5)
        scales = rng.random((num_points, 3), dtype=np.float32)
        rgbs = rng.random((num_points, 3), dtype=np.float32)
        u, v, w = (
            rng.random((num_points, 1), dtype=np.float32) for _ in range(3)
        )
        quats = np.concatenate(
            [
                np.sqrt(1.0 - u) * np.sin(2 * math.pi * v),
                np.sqrt(1.0 - u) * np.cos(2 * math.pi * v),
                np.sqrt(u) * np.sin(2 * math.pi * w),
                np.sqrt(u) * np.cos(2 * math.pi * w),
            ],
            axis=-1,
        )
        self.params = {
            "means": jnp.asarray(means),
            "scales": jnp.asarray(scales),
            "quats": jnp.asarray(quats),
            "rgbs": jnp.asarray(rgbs),
            "opacities": jnp.ones(num_points, jnp.float32),
        }
        self.viewmat = jnp.asarray(
            [
                [1.0, 0.0, 0.0, 0.0],
                [0.0, 1.0, 0.0, 0.0],
                [0.0, 0.0, 1.0, 8.0],
                [0.0, 0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )[None]
        self.K = jnp.asarray(
            [
                [self.focal, 0, self.W / 2],
                [0, self.focal, self.H / 2],
                [0, 0, 1],
            ],
            dtype=jnp.float32,
        )[None]

    def render(self, params):
        colors, _, _ = rasterization(
            params["means"],
            params["quats"],
            params["scales"],
            jax.nn.sigmoid(params["opacities"]),
            jax.nn.sigmoid(params["rgbs"]),
            self.viewmat,
            self.K,
            self.W,
            self.H,
            isect_capacity=max(16 * self.num_points, 1 << 14),
        )
        return colors[0]

    def train(self, iterations: int = 1000, lr: float = 0.01):
        opt_state = adam_init(self.params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                return mse_loss(self.render(p), self.gt_image)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt_state = adam_update(
                params, grads, opt_state, lr, eps=1e-8
            )
            return loss, params, opt_state

        params = self.params
        t0 = time.time()
        for it in range(iterations):
            loss, params, opt_state = step(params, opt_state)
            if it % 100 == 0 or it == iterations - 1:
                print(f"iter {it}: mse {float(loss):.6f}", flush=True)
        jax.block_until_ready(params)
        print(f"total {time.time() - t0:.1f}s")
        self.params = params
        return float(loss)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--num_points", type=int, default=2000)
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--img_path", type=str, default=None)
    args = p.parse_args()

    if args.img_path:
        from PIL import Image

        gt = np.asarray(Image.open(args.img_path).convert("RGB"), np.float32) / 255.0
    else:
        gt = default_target(args.height, args.width)
    trainer = SimpleTrainer(gt, num_points=args.num_points)
    trainer.train(iterations=args.iterations, lr=args.lr)


if __name__ == "__main__":
    main()
