"""Test/bench data loading (garden scene npz).

Behavior parity with gsplat/_helper.py:load_test_data (:51-103): crop to a
scene AABB, optionally replicate the scene into an odd grid to mimic large
scenes, and attach randomized gaussian attributes (scales in [1e-4, 0.02],
random unit quats, uniform opacities). Randomness here is numpy with a fixed
seed so runs are reproducible.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

DEFAULT_DATA_PATH = "/root/reference/assets/test_garden.npz"


def load_test_data(
    data_path: str | None = None,
    scene_crop: Tuple[float, float, float, float, float, float] = (-2, -2, -2, 2, 2, 2),
    scene_grid: int = 1,
    seed: int = 42,
):
    """Returns (means, quats, scales, opacities, colors, viewmats, Ks, width, height) as np arrays."""
    assert scene_grid % 2 == 1, "scene_grid must be odd"
    if data_path is None:
        data_path = os.environ.get("GSPLAT_TPU_TEST_DATA", DEFAULT_DATA_PATH)
    data = np.load(data_path)
    height, width = int(data["height"]), int(data["width"])
    viewmats = data["viewmats"].astype(np.float32)
    Ks = data["Ks"].astype(np.float32)
    means = data["means3d"].astype(np.float32)
    colors = (data["colors"] / 255.0).astype(np.float32)

    aabb = np.array(scene_crop, dtype=np.float32)
    edges = aabb[3:] - aabb[:3]
    sel = ((means >= aabb[:3]) & (means <= aabb[3:])).all(axis=-1)
    means, colors = means[sel], colors[sel]

    repeats = scene_grid
    r = np.arange(-(repeats // 2), repeats // 2 + 1)
    gridx, gridy = np.meshgrid(r, r, indexing="ij")
    grid = np.stack([gridx, gridy, np.zeros_like(gridx)], axis=-1).reshape(-1, 3)
    means = (means[None, :, :] + grid[:, None, :] * edges[None, None, :]).reshape(-1, 3)
    colors = np.tile(colors, (repeats**2, 1))

    N = len(means)
    rng = np.random.default_rng(seed)
    scales = (rng.random((N, 3)) * (0.02 - 1e-4) + 1e-4).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacities = rng.random((N,)).astype(np.float32)

    return (
        means.astype(np.float32),
        quats,
        scales,
        opacities,
        colors,
        viewmats,
        Ks,
        width,
        height,
    )
