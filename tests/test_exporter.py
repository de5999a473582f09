"""Exporter round-trips and binary-format sanity."""

import numpy as np
import pytest

from gsplat_tpu.exporter import (
    export_splats,
    load_ply_to_splats,
    pack_rotation,
    sort_centers,
)


@pytest.fixture()
def splats():
    rng = np.random.default_rng(0)
    n = 123
    return dict(
        means=rng.standard_normal((n, 3)).astype(np.float32),
        scales=rng.standard_normal((n, 3)).astype(np.float32) - 3,
        quats=rng.standard_normal((n, 4)).astype(np.float32),
        opacities=rng.standard_normal(n).astype(np.float32),
        sh0=rng.standard_normal((n, 1, 3)).astype(np.float32),
        shN=(rng.standard_normal((n, 15, 3)) * 0.1).astype(np.float32),
    )


def test_ply_roundtrip(splats, tmp_path):
    path = str(tmp_path / "test.ply")
    data = export_splats(**splats, format="ply", save_to=path)
    assert data.startswith(b"ply\nformat binary_little_endian 1.0\n")
    out = load_ply_to_splats(path)
    for k in ("means", "scales", "quats", "opacities", "sh0", "shN"):
        np.testing.assert_allclose(
            out[k], np.asarray(splats[k]).reshape(out[k].shape), atol=1e-6,
            err_msg=k,
        )


def test_splat_format(splats):
    data = export_splats(**splats, format="splat")
    n = splats["means"].shape[0]
    assert len(data) == n * (12 + 12 + 4 + 4)


def test_ply_compressed(splats):
    data = export_splats(**splats, format="ply_compressed")
    assert data.startswith(b"ply\n")
    assert b"element chunk" in data[:600]
    assert b"packed_position" in data[:800]


def test_pack_rotation_recoverable():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((50, 4)).astype(np.float32)
    packed = pack_rotation(q.copy())
    largest = (packed >> 30) & 0x3
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    assert (largest == np.argmax(np.abs(qn), axis=1)).all()


def test_sort_centers_is_permutation():
    rng = np.random.default_rng(2)
    c = rng.standard_normal((64, 3))
    idx = sort_centers(c, np.arange(64))
    assert sorted(idx.tolist()) == list(range(64))
