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
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _platform == "cpu":
    # The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. "axon")
    # in a way that survives env overrides; force it via the config API.
    jax.config.update("jax_platforms", "cpu")

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
