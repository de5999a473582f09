"""Decompose the rasterization kernels' time: per-tile overhead vs per-chunk.

Runs _fwd_call/_bwd_call on synthetic worklists at bench scale with
(a) real-shaped spans, (b) zero-count spans (pure grid/prologue overhead),
(c) the same slots concentrated in 1/8 of the tiles (chunk work only).
The differences isolate where the kernel milliseconds actually go.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gsplat_tpu.ops import rasterize as rz
from gsplat_tpu.ops.rasterize_pallas import TILE, _bwd_call, _fwd_call

CHUNK = rz.RASTER_CHUNK
W, H = 3840, 2160
D = 3
tw, th = -(-W // TILE), -(-H // TILE)
T = tw * th
P = 8 * 1024 * 1024 + 256 * 1024 + 2 * CHUNK


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return out


def spans_from_counts(counts):
    bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    starts = bounds[:-1]
    base = starts // CHUNK
    heads = starts - base * CHUNK
    return (jnp.asarray(base), jnp.asarray(heads),
            jnp.asarray(counts.astype(np.int32)))


def main():
    rng = np.random.default_rng(0)
    # synthetic sorted rows: plausible in-tile gaussians, mid alpha
    F = 16
    rows = np.zeros((F, P), np.float32)
    rows[0] = rng.uniform(0, W, P)   # x (overwritten per-tile irrelevant)
    rows[1] = rng.uniform(0, H, P)
    rows[2] = 0.05                   # conic a
    rows[3] = 0.0
    rows[4] = 0.05
    rows[5] = 0.5                    # opacity
    rows[6:9] = rng.random((3, P), dtype=np.float32)
    sorted_pad = jnp.asarray(rows)

    n_live = P - 2 * CHUNK
    per = n_live // T
    counts_real = np.full(T, per)
    counts_real[: n_live - per * T] += 1
    assert counts_real.sum() == n_live

    counts_zero = np.zeros(T)

    # all work in every 8th tile (same total slots, 1/8 of tiles have work)
    counts_conc = np.zeros(T)
    idx = np.arange(0, T, 8)
    counts_conc[idx] = n_live // len(idx)
    counts_conc[idx[: n_live - (n_live // len(idx)) * len(idx)]] += 1

    fwd = jax.jit(lambda sp, b, h, c: _fwd_call(
        sp, b, h, c, n_channels=D, tiles_w=tw, tiles_per_image=T,
        width=W, height=H, n_tiles=T, chunk=CHUNK))

    for name, counts in [("real-uniform", counts_real),
                         ("zero-counts (pure tile overhead)", counts_zero),
                         ("concentrated 1/8 tiles", counts_conc)]:
        b, h, c = spans_from_counts(counts)
        out = timeit(f"FWD {name}", fwd, sorted_pad, b, h, c)

    pix_out, t_final = out
    v_pix = jnp.ones_like(pix_out)
    v_tf = jnp.zeros_like(t_final)
    bwd = jax.jit(lambda sp, b, h, c, vp, vt, po, tf: _bwd_call(
        sp, b, h, c, vp, vt, po, tf, n_channels=D, tiles_w=tw,
        tiles_per_image=T, width=W, height=H, n_tiles=T, chunk=CHUNK))
    for name, counts in [("real-uniform", counts_real),
                         ("zero-counts (pure tile overhead)", counts_zero),
                         ("concentrated 1/8 tiles", counts_conc)]:
        b, h, c = spans_from_counts(counts)
        timeit(f"BWD {name}", bwd, sorted_pad, b, h, c,
               v_pix, v_tf, pix_out, t_final)


if __name__ == "__main__":
    main()
