"""PNG-based splat compression (Self-Organizing Gaussian Grids).

Behavior parity with gsplat/compression/png_compression.py (:31-440): crop
to a square count, spatially sort into a 2D grid, quantize per attribute
(16-bit log-transformed means, 8-bit scales/quats/opacities/sh0), K-means
codebook for shN, npz fallback for anything else; round-trippable through
`compress()` / `decompress()`.

Dependency substitutions (both reference deps are unavailable here):
  * PLAS (parallel linear assignment sort) -> Morton-order grid sort
    (gsplat_tpu.exporter.sort_centers). Same role — spatial locality in the
    2D grid for PNG entropy coding — with a simpler algorithm.
  * torchpq K-means -> numpy Lloyd iterations with k-means++ style init.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Callable, Dict

import numpy as np

from ..exporter import sort_centers


def log_transform(x: np.ndarray) -> np.ndarray:
    """sign(x) * log1p(|x|). Parity: compression/utils or png_compression."""
    return np.sign(x) * np.log1p(np.abs(x))


def inverse_log_transform(y: np.ndarray) -> np.ndarray:
    return np.sign(y) * np.expm1(np.abs(y))


def _write_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)


def _read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def _compress_png(
    compress_dir: str, name: str, params: np.ndarray, n_sidelen: int, **kw
) -> Dict[str, Any]:
    """8-bit min-max quantization to PNG. Parity: _compress_png (:158)."""
    grid = params.reshape((n_sidelen, n_sidelen, -1))
    mins = grid.min(axis=(0, 1))
    maxs = grid.max(axis=(0, 1))
    norm = (grid - mins) / np.where(maxs - mins == 0, 1, maxs - mins)
    img = (norm * 255).round().astype(np.uint8)
    if img.shape[-1] == 1:
        img = img[..., 0]
    elif img.shape[-1] == 4:
        pass  # RGBA
    elif img.shape[-1] not in (1, 3, 4):
        # split into groups of <=4 channels
        metas = []
        for i in range(0, img.shape[-1], 4):
            sub = img[..., i : i + 4]
            if sub.shape[-1] == 1:
                sub = sub[..., 0]
            _write_png(
                os.path.join(compress_dir, f"{name}_{i // 4}.png"), sub
            )
        return {
            "shape": list(params.shape),
            "dtype": str(params.dtype),
            "mins": mins.tolist(),
            "maxs": maxs.tolist(),
            "split": int(np.ceil(img.shape[-1] / 4)),
        }
    _write_png(os.path.join(compress_dir, f"{name}.png"), img)
    return {
        "shape": list(params.shape),
        "dtype": str(params.dtype),
        "mins": mins.tolist(),
        "maxs": maxs.tolist(),
    }


def _decompress_png(
    compress_dir: str, name: str, meta: Dict[str, Any]
) -> np.ndarray:
    if "split" in meta:
        parts = [
            _read_png(os.path.join(compress_dir, f"{name}_{i}.png"))
            for i in range(meta["split"])
        ]
        parts = [p[..., None] if p.ndim == 2 else p for p in parts]
        img = np.concatenate(parts, axis=-1)
    else:
        img = _read_png(os.path.join(compress_dir, f"{name}.png"))
        if img.ndim == 2:
            img = img[..., None]
    mins = np.array(meta["mins"], np.float32)
    maxs = np.array(meta["maxs"], np.float32)
    norm = img.astype(np.float32) / 255.0
    vals = norm * (maxs - mins) + mins
    return vals.reshape(meta["shape"]).astype(meta["dtype"])


def _compress_png_16bit(
    compress_dir: str, name: str, params: np.ndarray, n_sidelen: int, **kw
) -> Dict[str, Any]:
    """16-bit quantization split into two 8-bit PNGs. Parity: :230."""
    grid = params.reshape((n_sidelen, n_sidelen, -1))
    mins = grid.min(axis=(0, 1))
    maxs = grid.max(axis=(0, 1))
    norm = (grid - mins) / np.where(maxs - mins == 0, 1, maxs - mins)
    q = (norm * 65535).round().astype(np.uint16)
    _write_png(os.path.join(compress_dir, f"{name}_l.png"), (q & 0xFF).astype(np.uint8))
    _write_png(os.path.join(compress_dir, f"{name}_u.png"), (q >> 8).astype(np.uint8))
    return {
        "shape": list(params.shape),
        "dtype": str(params.dtype),
        "mins": mins.tolist(),
        "maxs": maxs.tolist(),
    }


def _decompress_png_16bit(
    compress_dir: str, name: str, meta: Dict[str, Any]
) -> np.ndarray:
    lo = _read_png(os.path.join(compress_dir, f"{name}_l.png")).astype(np.uint16)
    hi = _read_png(os.path.join(compress_dir, f"{name}_u.png")).astype(np.uint16)
    q = (hi << 8) | lo
    mins = np.array(meta["mins"], np.float32)
    maxs = np.array(meta["maxs"], np.float32)
    vals = q.astype(np.float32) / 65535.0 * (maxs - mins) + mins
    return vals.reshape(meta["shape"]).astype(meta["dtype"])


def _kmeans(x: np.ndarray, k: int, iters: int = 10, seed: int = 0):
    """Lloyd K-means, jitted jnp (torchpq replacement, chip-speed).

    The assignment distance |x - c|^2 = |x|^2 - 2 x c^T + |c|^2 is one
    matmul per chunk (MXU-friendly); the center update is a segment-sum.
    Runs on whatever backend is active (TPU at garden scale, CPU in CI).
    """
    import jax
    import jax.numpy as jnp

    n = x.shape[0]
    k = min(k, n)
    rng = np.random.default_rng(seed)
    centers0 = x[rng.choice(n, k, replace=False)].astype(np.float32)

    CH = 4096  # chunk rows so the (CH, k) distance block fits on device
    n_pad = -(-n // CH) * CH
    xp = np.zeros((n_pad, x.shape[1]), np.float32)
    xp[:n] = x
    xj = jnp.asarray(xp)
    valid = jnp.arange(n_pad) < n

    @jax.jit
    def step(centers):
        c2 = jnp.sum(centers**2, axis=-1)

        def lab_chunk(xb):
            # HIGHEST: default TPU matmul precision is bf16, which degrades
            # cluster assignments vs the exact NumPy path this replaced
            d = c2[None, :] - 2.0 * jnp.matmul(
                xb, centers.T, precision=jax.lax.Precision.HIGHEST
            )
            return jnp.argmin(d, axis=1).astype(jnp.int32)

        labels = jax.lax.map(
            lab_chunk, xj.reshape(-1, CH, xj.shape[1])
        ).reshape(-1)
        lab_eff = jnp.where(valid, labels, k)  # pad rows -> dropped bucket
        sums = jax.ops.segment_sum(
            jnp.where(valid[:, None], xj, 0.0), lab_eff, num_segments=k + 1
        )[:k]
        counts = jax.ops.segment_sum(
            valid.astype(jnp.float32), lab_eff, num_segments=k + 1
        )[:k]
        new = jnp.where(
            (counts > 0)[:, None],
            sums / jnp.maximum(counts, 1.0)[:, None],
            centers,
        )
        return new, labels

    centers = jnp.asarray(centers0)
    labels = None
    for _ in range(iters):
        centers, labels = step(centers)
    return (
        np.asarray(centers),
        np.asarray(labels[: n]).astype(np.int64),
    )


def _compress_kmeans(
    compress_dir: str, name: str, params: np.ndarray, n_sidelen: int,
    codebook_size: int = 2**16, quantization: int = 8, **kw,
) -> Dict[str, Any]:
    """K-means codebook + quantized centroids + label PNG. Parity: :337."""
    shape = params.shape
    x = params.reshape(shape[0], -1).astype(np.float32)
    centers, labels = _kmeans(x, codebook_size)
    mins, maxs = centers.min(), centers.max()
    norm = (centers - mins) / max(maxs - mins, 1e-12)
    q = (norm * (2**quantization - 1)).round().astype(np.uint8)
    np.savez_compressed(
        os.path.join(compress_dir, f"{name}_codebook.npz"), centroids=q
    )
    lab = labels.astype(np.uint32).reshape(n_sidelen, n_sidelen)
    img = np.stack(
        [(lab >> 8) & 0xFF, lab & 0xFF], axis=-1
    ).astype(np.uint8)  # 16-bit labels as 2 channels
    _write_png(
        os.path.join(compress_dir, f"{name}_labels.png"),
        np.concatenate([img, np.zeros_like(img[..., :1])], axis=-1),
    )
    return {
        "shape": list(shape),
        "dtype": str(params.dtype),
        "mins": float(mins),
        "maxs": float(maxs),
        "quantization": quantization,
    }


def _decompress_kmeans(
    compress_dir: str, name: str, meta: Dict[str, Any]
) -> np.ndarray:
    data = np.load(os.path.join(compress_dir, f"{name}_codebook.npz"))
    q = data["centroids"].astype(np.float32)
    centers = q / (2 ** meta["quantization"] - 1) * (
        meta["maxs"] - meta["mins"]
    ) + meta["mins"]
    img = _read_png(os.path.join(compress_dir, f"{name}_labels.png"))
    labels = (img[..., 0].astype(np.uint32) << 8) | img[..., 1].astype(
        np.uint32
    )
    vals = centers[labels.reshape(-1)]
    return vals.reshape(meta["shape"]).astype(meta["dtype"])


def _compress_npz(compress_dir, name, params, **kw) -> Dict[str, Any]:
    np.savez_compressed(
        os.path.join(compress_dir, f"{name}.npz"), arr=np.asarray(params)
    )
    return {"shape": list(np.asarray(params).shape)}


def _decompress_npz(compress_dir, name, meta) -> np.ndarray:
    return np.load(os.path.join(compress_dir, f"{name}.npz"))["arr"]


def _unit_normalize(x: np.ndarray) -> np.ndarray:
    """Per-channel min-max normalization to [0, 1]."""
    mins = x.min(axis=0)
    maxs = x.max(axis=0)
    return (x - mins) / np.where(maxs - mins == 0, 1, maxs - mins)


def sort_splats(
    splats: Dict[str, np.ndarray], method: str = "morton"
) -> Dict[str, np.ndarray]:
    """Spatial sort for grid locality.

    method="morton" (default): Morton order of the 3D centers — measured
    smallest on the garden scene (STANDINS.md).  method="plas":
    self-organizing grid sort over the concatenated attribute vectors
    (the reference's PLAS role, sort.py:47-56), warm-started from the
    Morton order — see compression/plas.py.
    """
    n = splats["means"].shape[0]
    if method == "morton":
        idx = sort_centers(
            inverse_log_transform(splats["means"]),
            np.arange(n),
        )
    else:
        from .plas import plas_sort_indices

        # means dominate compressed size (16-bit planes) and their spatial
        # coherence is what PNG's predictors exploit — upweight them so the
        # 11 appearance channels don't outvote the 3 position channels
        # (measured: equal weights inflate means_u.png ~2.4x vs Morton)
        keys = [("means", 8.0), ("quats", 1.0), ("scales", 1.0),
                ("opacities", 1.0), ("sh0", 1.0)]
        vecs = np.concatenate(
            [
                w * _unit_normalize(np.asarray(splats[k]).reshape(n, -1))
                for k, w in keys
                if k in splats
            ],
            axis=-1,
        )
        # warm-start from the Morton order: the annealed swaps inherit its
        # global position structure and refine appearance-channel locality
        morton = sort_centers(
            inverse_log_transform(splats["means"]), np.arange(n)
        )
        idx = plas_sort_indices(
            vecs, int(n**0.5), normalize=False, init_order=morton
        )
    return {k: v[idx] for k, v in splats.items()}


@dataclass
class PngCompression:
    """PNG splat compression. Parity: compression/png_compression.py:31."""

    use_sort: bool = True
    # "morton" | "plas": measured on the garden scene (STANDINS.md), Morton
    # compresses 4-7% smaller than the jnp PLAS — the annealed-swap PLAS
    # trades means-plane coherence for appearance-channel locality and the
    # 16-bit means planes dominate.  PLAS kept for sources whose appearance
    # channels dominate.
    sort_method: str = "morton"
    verbose: bool = False

    _COMPRESS: Dict[str, Callable] = None  # type: ignore

    def _compress_fn(self, name: str) -> Callable:
        return {
            "means": _compress_png_16bit,
            "scales": _compress_png,
            "quats": _compress_png,
            "opacities": _compress_png,
            "sh0": _compress_png,
            "shN": _compress_kmeans,
        }.get(name, _compress_npz)

    def _decompress_fn(self, name: str) -> Callable:
        return {
            "means": _decompress_png_16bit,
            "scales": _decompress_png,
            "quats": _decompress_png,
            "opacities": _decompress_png,
            "sh0": _decompress_png,
            "shN": _decompress_kmeans,
        }.get(name, _decompress_npz)

    def compress(self, compress_dir: str, splats: Dict[str, Any]) -> None:
        os.makedirs(compress_dir, exist_ok=True)
        splats = {k: np.asarray(v) for k, v in splats.items()}
        splats["means"] = log_transform(splats["means"])
        splats["quats"] = splats["quats"] / np.linalg.norm(
            splats["quats"], axis=-1, keepdims=True
        )

        n_gs = len(splats["means"])
        n_sidelen = int(n_gs**0.5)
        n_crop = n_gs - n_sidelen**2
        if n_crop != 0:
            # drop the lowest-opacity splats (reference _crop_n_splats)
            keep = np.argsort(splats["opacities"].reshape(n_gs))[n_crop:]
            splats = {k: v[keep] for k, v in splats.items()}

        if self.use_sort:
            splats = sort_splats(splats, method=self.sort_method)

        meta = {}
        for name, value in splats.items():
            meta[name] = self._compress_fn(name)(
                compress_dir, name, value, n_sidelen=n_sidelen
            )
        with open(os.path.join(compress_dir, "meta.json"), "w") as f:
            json.dump(meta, f)

    def decompress(self, compress_dir: str) -> Dict[str, np.ndarray]:
        with open(os.path.join(compress_dir, "meta.json")) as f:
            meta = json.load(f)
        splats = {
            name: self._decompress_fn(name)(compress_dir, name, m)
            for name, m in meta.items()
        }
        splats["means"] = inverse_log_transform(splats["means"])
        return splats
