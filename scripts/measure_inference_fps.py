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
    means, quats, scales, opac, colors, viewmats, Ks, W0, H0 = load_test_data()
    m, q, s, o, c = grid_upsample(means, quats, scales, opac, colors)
    print(f"n_gaussians {len(m)}", flush=True)
    results = {}
    for label, (W, H, cap) in {
        "1080p": (1920, 1080, 6 * 1024 * 1024),
        "4k": (3840, 2160, 9 * 1024 * 1024),
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
            fn = jax.jit(
                lambda *a, fast=fast, W=W, H=H, cap=cap: rasterization(
                    *a, W, H, isect_capacity=cap, fast=fast
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
    print("| resolution | exact ms | fast ms | speedup | fast FPS |")
    print("|---|---|---|---|---|")
    for label in ("1080p", "4k"):
        e, f = results[f"{label}/exact"], results[f"{label}/fast"]
        print(f"| {label} | {e:.1f} | {f:.1f} | {e/f:.2f}x | {1e3/f:.2f} |")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
