"""Test configuration: run tests on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-CI strategy (core_tests.yml runs pytest on CPU
runners; distributed code paths are exercised via identity collectives —
tests/conftest.py:369-391 in the reference). Here the analog is an
8-device `xla_force_host_platform_device_count` CPU mesh, so sharding code
runs the same `shard_map` path as on a pod slice.

Set GSPLAT_TPU_TEST_PLATFORM=tpu to run the suite on real hardware instead.
"""

import os

_platform = os.environ.get("GSPLAT_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # NOTE: --xla_backend_optimization_level=0 was tried for compile time
    # (~20% off the suite) but is NOT numerics-neutral on XLA:CPU — it
    # changes f32 association enough to trip the 2e-4-class kernel parity
    # bounds. Keep the default optimization level.
    os.environ["XLA_FLAGS"] = flags

# Persistent compilation cache: the suite's wall time is dominated by a
# handful of giant shard_map compiles (the 8-way parallel/distributed
# tests: ~15 min of pure compile on this host); caching them makes repeat
# runs minutes faster.  Safe cross-platform — the cache key includes the
# backend.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

if _platform == "cpu":
    # The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. "axon")
    # in a way that survives env overrides; force it via the config API.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def garden_small():
    """Downscaled garden scene: small crop, low resolution — oracle-sized."""
    from gsplat_tpu.utils.data import load_test_data

    means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
        load_test_data()
    )
    # Downscale the camera by 8x so oracle rasterization stays small.
    factor = 8
    Ks = Ks.copy()
    Ks[:, :2, :] /= factor
    width, height = width // factor, height // factor
    # Subsample gaussians for speed.
    idx = np.arange(0, len(means), 4)
    return dict(
        means=means[idx],
        quats=quats[idx],
        scales=scales[idx],
        opacities=opacities[idx],
        colors=colors[idx],
        viewmats=viewmats,
        Ks=Ks,
        width=width,
        height=height,
    )
