"""Benchmark: garden grid-5 rasterization fwd+bwd throughput on one chip.

Mirrors the reference's profiling/main.py headline config (scene_grid=5,
4k render, batch 1, radius_clip=3.0, far=100 — docs/source/tests/profile.rst
rows): N≈2.8M gaussians, ≈10M tile intersections per frame.

Baseline: TITAN RTX fwd 171.8 FPS / bwd 97.1 FPS (profile.rst:50-57)
=> combined step rate 1/(1/171.8 + 1/97.1) = 62.04 FPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
# packed sort payloads: the benchmark measures the TRAINING configuration
# the example trainers run (quality-gated; docs/perf-analysis.md).  Set
# GSPLAT_TPU_PACK_SORT=0 GSPLAT_TPU_PACK_GRADS=0 for the exact path.
os.environ.setdefault("GSPLAT_TPU_PACK_SORT", "1")
os.environ.setdefault("GSPLAT_TPU_PACK_GRADS", "1")
# tile 32 cuts the emission multiplicity ~3.1 -> ~1.9 on this scene, which
# shrinks every P-proportional sort/expand/span stage; its bwd kernel needs
# chunk 128 to fit the 16 MiB scoped-VMEM limit.  Measured (round 5):
# ts16/chunk256 1.801 steps/s -> ts32/chunk128 2.067 steps/s.
_TS = os.environ.setdefault("GSPLAT_TPU_BENCH_TILE", "32")
if _TS == "32":
    os.environ.setdefault("GSPLAT_TPU_RASTER_CHUNK", "128")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # axon gotcha: block_until_ready can return early; force a host
    # transfer of one element, which waits for the device queue to drain
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gsplat_tpu.rendering import rasterization
from gsplat_tpu.utils.data import load_test_data

BASELINE_STEP_FPS = 62.04  # TITAN RTX combined fwd+bwd (profile.rst:50-57)


def main():
    means, quats, scales, opac, colors, viewmats, Ks, width, height = (
        load_test_data(scene_grid=5)
    )
    W, H = 3840, 2160
    Ks = Ks[:1].copy()
    Ks[:, 0, :] *= W / width
    Ks[:, 1, :] *= H / height
    viewmats = jnp.asarray(viewmats[:1])
    Ks = jnp.asarray(Ks)
    means, quats, scales, opac, colors = map(
        jnp.asarray, (means, quats, scales, opac, colors)
    )
    # tight-intersection counts on this scene: ~7.8M isects, ~2.0M
    # row-records (the pipeline is visibility-compacted; capacities bound
    # the visible working set, not I*N*tiles)
    cap = 8 * 1024 * 1024 + 256 * 1024

    ts = int(os.environ.get("GSPLAT_TPU_BENCH_TILE", "16"))
    # larger tiles cut the emission multiplicity (~3.0 at ts=16), so the
    # same scene needs a smaller isect capacity at ts=32
    if ts != 16:
        cap = 6 * 1024 * 1024

    def render(*args):
        c, a, meta = rasterization(
            *args, viewmats, Ks, W, H,
            near_plane=0.01, far_plane=100.0, radius_clip=3.0,
            isect_capacity=cap, row_capacity=2 * 1024 * 1024 + 384 * 1024,
            tile_size=ts,
        )
        return c, a, meta["isect_overflow"]

    fwd = jax.jit(render)

    @jax.jit
    def step(*args):
        def loss(*a):
            c, _, _ = render(*a)
            return jnp.sum(c)

        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)

    args = (means, quats, scales, opac, colors)

    out = fwd(*args)
    _sync(out)
    assert not bool(out[2]), "isect capacity overflow in benchmark"
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(*args)
    _sync(out)
    t_fwd = (time.perf_counter() - t0) / reps

    g = step(*args)
    _sync(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        g = step(*args)
    _sync(g)
    t_step = (time.perf_counter() - t0) / reps  # fwd+bwd together

    step_fps = 1.0 / t_step
    result = {
        "metric": "garden_grid5_4k_fwd_bwd_step_fps",
        "value": round(step_fps, 3),
        "unit": "steps/s",
        "vs_baseline": round(step_fps / BASELINE_STEP_FPS, 4),
        "detail": {
            "fwd_fps": round(1.0 / t_fwd, 3),
            "fwd_ms": round(t_fwd * 1e3, 2),
            "step_ms": round(t_step * 1e3, 2),
            "n_gaussians": int(means.shape[0]),
            "rays_per_sec": round(W * H / t_step, 0),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
