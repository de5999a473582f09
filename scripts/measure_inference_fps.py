"""Inference FPS at bench scale: exact path vs the bf16-packed fast path.

VERDICT item 7: an inference-FPS story at 2.79M splats, 1080p and 4k.
Writes a markdown table to stdout; paste into README/STANDINS.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.rendering import rasterization
from gsplat_tpu.utils.data import load_test_data


def grid_upsample(means, quats, scales, opac, colors, k=5):
    """Replicate the garden cloud on a k-offset jitter grid (bench.py's
    scene construction: 138k -> ~2.79M gaussians)."""
    rng = np.random.default_rng(0)
    n = len(means)
    target = 2_794_625
    reps = -(-target // n)
    spread = np.median(np.abs(means - np.median(means, 0)), 0) * 0.02
    outs = [
        means + rng.normal(size=(n, 3)).astype(np.float32) * spread
        for _ in range(reps)
    ]
    m = np.concatenate(outs)[:target]
    t = lambda x: np.concatenate([x] * reps)[:target]
    return m, t(quats), t(scales), t(opac), t(colors)


def main():
    # GSPLAT_TPU_INFER_TILE=32 folds the round-5 tile win into inference
    # (fwd-only, so the ts32 bwd-kernel VMEM constraint does not apply);
    # GSPLAT_TPU_INFER_MODES=fast trims the matrix to the fast path only
    # (each config is a fresh whole-module Mosaic compile on this host).
    ts = int(os.environ.get("GSPLAT_TPU_INFER_TILE", "16"))
    modes = os.environ.get("GSPLAT_TPU_INFER_MODES", "exact,fast").split(",")
    means, quats, scales, opac, colors, viewmats, Ks, W0, H0 = load_test_data()
    m, q, s, o, c = grid_upsample(means, quats, scales, opac, colors)
    print(f"n_gaussians {len(m)} tile {ts}", flush=True)
    results = {}
    cap_scale = 1.0 if ts == 16 else 0.75
    for label, (W, H, cap) in {
        "1080p": (1920, 1080, int(6 * 1024 * 1024 * cap_scale)),
        "4k": (3840, 2160, int(9 * 1024 * 1024 * cap_scale)),
    }.items():
        Ks2 = Ks[:1].copy()
        sc = W / W0
        Ks2[:, 0, :] *= sc
        Ks2[:, 1, :] *= H / H0
        args = (
            jnp.asarray(m), jnp.asarray(q), jnp.asarray(s), jnp.asarray(o),
            jnp.asarray(c)[None], jnp.asarray(viewmats[:1]),
            jnp.asarray(Ks2),
        )
        for mode, fast in (("exact", False), ("fast", True)):
            if mode not in modes:
                continue
            fn = jax.jit(
                lambda *a, fast=fast, W=W, H=H, cap=cap: rasterization(
                    *a, W, H, isect_capacity=cap, fast=fast, tile_size=ts
                )[0].sum()
            )
            v = float(fn(*args))  # compile + run
            reps = 8
            t0 = time.perf_counter()
            for _ in range(reps):
                v = float(fn(*args))
            dt = (time.perf_counter() - t0) / reps
            results[f"{label}/{mode}"] = dt * 1e3
            print(f"{label} {mode}: {dt*1e3:.1f} ms ({1/dt:.2f} FPS)",
                  flush=True)

    print()
    if all(f"{lb}/{md}" in results for lb in ("1080p", "4k")
           for md in ("exact", "fast")):
        print("| resolution | exact ms | fast ms | speedup | fast FPS |")
        print("|---|---|---|---|---|")
        for label in ("1080p", "4k"):
            e, f = results[f"{label}/exact"], results[f"{label}/fast"]
            print(f"| {label} | {e:.1f} | {f:.1f} | {e/f:.2f}x | {1e3/f:.2f} |")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
