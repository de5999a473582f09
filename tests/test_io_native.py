"""Native C++ IO vs the pure-Python parsers (round-trip generated files)."""

import os
import struct

import numpy as np
import pytest

from gsplat_tpu import io_native

pytestmark = pytest.mark.skipif(
    not io_native.native_available(), reason="native IO library unavailable"
)


def _write_points3d(path, n=50, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3))
    rgb = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    err = rng.random(n)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<Qddd", i + 1, *xyz[i]))
            f.write(struct.pack("<BBB", *rgb[i]))
            f.write(struct.pack("<d", err[i]))
            track = rng.integers(0, 5)
            f.write(struct.pack("<Q", track))
            f.write(b"\x00" * (8 * track))
    return xyz, rgb, err


def _write_images(path, n=7, seed=1):
    rng = np.random.default_rng(seed)
    out = {}
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            q = rng.normal(size=4)
            t = rng.normal(size=3)
            name = f"frame_{i:03d}.jpg"
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, (i % 3) + 1))
            f.write(name.encode() + b"\x00")
            npts = rng.integers(0, 4)
            f.write(struct.pack("<Q", npts))
            f.write(b"\x00" * (24 * npts))
            out[i + 1] = dict(quat=q, tvec=t, camera_id=(i % 3) + 1, name=name)
    return out


def _write_cameras(path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        # PINHOLE (model 1, 4 params)
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
        # OPENCV (model 4, 8 params)
        f.write(struct.pack("<iiQQ", 2, 4, 1280, 720))
        f.write(struct.pack("<8d", *range(8)))


def test_points3d(tmp_path):
    p = str(tmp_path / "points3D.bin")
    xyz, rgb, err = _write_points3d(p)
    x2, r2, e2 = io_native.read_points3d_binary(p)
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)
    np.testing.assert_allclose(e2, err)


def test_images(tmp_path):
    p = str(tmp_path / "images.bin")
    ref = _write_images(p)
    got = io_native.read_images_binary(p)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k]["quat"], ref[k]["quat"])
        np.testing.assert_allclose(got[k]["tvec"], ref[k]["tvec"])
        assert got[k]["camera_id"] == ref[k]["camera_id"]
        assert got[k]["name"] == ref[k]["name"]


def test_cameras(tmp_path):
    p = str(tmp_path / "cameras.bin")
    _write_cameras(p)
    cams = io_native.read_cameras_binary(p)
    assert cams[1]["model"] == "PINHOLE" and cams[1]["width"] == 640
    np.testing.assert_allclose(cams[1]["params"], [500, 510, 320, 240])
    assert cams[2]["model"] == "OPENCV"
    np.testing.assert_allclose(cams[2]["params"], np.arange(8.0))


def test_ply_roundtrip(tmp_path):
    """export_splats -> native load matches the Python loader."""
    from gsplat_tpu import exporter

    rng = np.random.default_rng(5)
    n = 40
    means = rng.normal(size=(n, 3)).astype(np.float32)
    scales = rng.normal(size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.normal(size=n).astype(np.float32)
    sh0 = rng.normal(size=(n, 1, 3)).astype(np.float32)
    shN = rng.normal(size=(n, 8, 3)).astype(np.float32)
    p = str(tmp_path / "splats.ply")
    exporter.export_splats(
        means, scales, quats, opac, sh0, shN, format="ply", save_to=p
    )
    a = io_native.load_ply_to_splats(p)
    b = exporter.load_ply_to_splats(p)
    for k in b:
        np.testing.assert_allclose(a[k], b[k], err_msg=k)
