"""PNG compression round-trip fidelity."""

import numpy as np
import pytest

from gsplat_tpu.compression import PngCompression


def test_compress_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 70 * 70 + 13  # non-square: lowest-opacity crop kicks in
    splats = dict(
        means=rng.standard_normal((n, 3)).astype(np.float32) * 2,
        scales=(rng.standard_normal((n, 3)) - 4).astype(np.float32),
        quats=rng.standard_normal((n, 4)).astype(np.float32),
        opacities=rng.standard_normal(n).astype(np.float32),
        sh0=rng.standard_normal((n, 1, 3)).astype(np.float32),
        shN=(rng.standard_normal((n, 15, 3)) * 0.05).astype(np.float32),
    )
    c = PngCompression()
    d = str(tmp_path / "comp")
    c.compress(d, dict(splats))
    out = c.decompress(d)

    n2 = 70 * 70
    assert out["means"].shape == (n2, 3)
    # quantization is lossy: check distribution-level closeness
    assert abs(float(out["means"].mean()) - float(splats["means"].mean())) < 0.05
    assert np.abs(out["means"]).max() < np.abs(splats["means"]).max() * 1.3
    # means are 16-bit: tight per-axis range match
    for k, tol in (("means", 1e-3), ("scales", 0.05), ("sh0", 0.05)):
        mn_in = np.asarray(splats[k]).reshape(n, -1)
        mn_out = out[k].reshape(n2, -1)
        assert abs(mn_in.min() - mn_out.min()) < tol + 0.1, k
    # quats decompress ~unit-norm
    qn = np.linalg.norm(out["quats"], axis=-1)
    assert np.abs(qn - 1).max() < 0.05


def test_kmeans_codebook_quality(tmp_path):
    rng = np.random.default_rng(1)
    n = 32 * 32
    # clustered shN: codebook should reconstruct well
    base = rng.standard_normal((8, 45)).astype(np.float32)
    shN = (base[rng.integers(0, 8, n)] + rng.standard_normal((n, 45)) * 0.001)
    splats = dict(
        means=rng.standard_normal((n, 3)).astype(np.float32),
        scales=rng.standard_normal((n, 3)).astype(np.float32),
        quats=rng.standard_normal((n, 4)).astype(np.float32),
        opacities=rng.standard_normal(n).astype(np.float32),
        sh0=rng.standard_normal((n, 1, 3)).astype(np.float32),
        shN=shN.reshape(n, 15, 3).astype(np.float32),
    )
    c = PngCompression()
    d = str(tmp_path / "comp")
    c.compress(d, dict(splats))
    out = c.decompress(d)
    # reconstruction error small relative to data scale (clustered data);
    # order differs due to the spatial sort, so compare distributions
    assert abs(out["shN"].std() - splats["shN"].std()) < 0.1
    assert abs(out["shN"].mean() - splats["shN"].mean()) < 0.1
