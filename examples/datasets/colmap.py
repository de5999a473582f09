"""COLMAP dataset parser + view dataset (numpy, framework-free).

Analog of the reference's examples/datasets/colmap.py (:120 Parser, :443
Dataset): reads COLMAP sparse reconstructions (binary or text), produces
per-image world-to-cam matrices, intrinsics (with downsample factor),
3D points + RGB, and a normalized world frame (examples/datasets/
normalize.py behavior: similarity transform aligning the up axis and
scaling by camera extent).

The binary readers implement the COLMAP file formats
(cameras.bin / images.bin / points3D.bin) from the public format spec.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

# COLMAP camera model ids -> (name, n_params)
_CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


def _read(fh, fmt):
    return struct.unpack(fmt, fh.read(struct.calcsize(fmt)))


def read_cameras_binary(path: str) -> Dict[int, dict]:
    cams = {}
    with open(path, "rb") as fh:
        (n,) = _read(fh, "<Q")
        for _ in range(n):
            cam_id, model_id, width, height = _read(fh, "<iiQQ")
            name, n_params = _CAMERA_MODELS[model_id]
            params = np.array(_read(fh, f"<{n_params}d"))
            cams[cam_id] = dict(
                model=name, width=int(width), height=int(height), params=params
            )
    return cams


def read_images_binary(path: str) -> Dict[int, dict]:
    images = {}
    with open(path, "rb") as fh:
        (n,) = _read(fh, "<Q")
        for _ in range(n):
            im_id, qw, qx, qy, qz, tx, ty, tz, cam_id = _read(fh, "<idddddddi")
            name = b""
            while True:
                ch = fh.read(1)
                if ch == b"\x00":
                    break
                name += ch
            (n_pts,) = _read(fh, "<Q")
            fh.read(24 * n_pts)  # xys + point ids, unused here
            images[im_id] = dict(
                quat=np.array([qw, qx, qy, qz]),
                tvec=np.array([tx, ty, tz]),
                camera_id=cam_id,
                name=name.decode("utf-8"),
            )
    return images


def read_points3d_binary(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    with open(path, "rb") as fh:
        (n,) = _read(fh, "<Q")
        xyz = np.empty((n, 3), np.float64)
        rgb = np.empty((n, 3), np.uint8)
        err = np.empty((n,), np.float64)
        for i in range(n):
            _pid, x, y, z, r, g, b, e = _read(fh, "<QdddBBBd")
            xyz[i] = (x, y, z)
            rgb[i] = (r, g, b)
            err[i] = e
            (track_len,) = _read(fh, "<Q")
            fh.read(8 * track_len)
    return xyz, rgb, err


def read_cameras_text(path: str) -> Dict[int, dict]:
    cams = {}
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split()
        cams[int(parts[0])] = dict(
            model=parts[1], width=int(parts[2]), height=int(parts[3]),
            params=np.array([float(p) for p in parts[4:]]),
        )
    return cams


def read_images_text(path: str) -> Dict[int, dict]:
    images = {}
    lines = [
        l for l in open(path) if not l.startswith("#") and l.strip()
    ]
    for meta_line in lines[0::2]:
        p = meta_line.split()
        images[int(p[0])] = dict(
            quat=np.array([float(x) for x in p[1:5]]),
            tvec=np.array([float(x) for x in p[5:8]]),
            camera_id=int(p[8]),
            name=p[9],
        )
    return images


def read_points3d_text(path: str):
    rows = [
        l.split() for l in open(path) if not l.startswith("#") and l.strip()
    ]
    xyz = np.array([[float(v) for v in r[1:4]] for r in rows])
    rgb = np.array([[int(v) for v in r[4:7]] for r in rows], np.uint8)
    err = np.array([float(r[7]) for r in rows])
    return xyz, rgb, err


def _qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _intrinsics_from_camera(cam: dict) -> np.ndarray:
    p = cam["params"]
    model = cam["model"]
    if model == "SIMPLE_PINHOLE" or model in (
        "SIMPLE_RADIAL", "RADIAL", "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE",
        "FOV",
    ):
        fx = fy = p[0]
        cx, cy = p[1], p[2]
    else:  # PINHOLE, OPENCV, OPENCV_FISHEYE, FULL_OPENCV, THIN_PRISM_FISHEYE
        fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)


def similarity_from_cameras(c2w: np.ndarray) -> np.ndarray:
    """Normalization transform: align average up, center, unit scale.

    Behavior parity with examples/datasets/normalize.py:
    similarity_from_cameras (up-alignment + camera-centroid recentering +
    scale by max camera distance).
    """
    t = c2w[:, :3, 3]
    # up vector: negative mean of the cameras' y axes
    up = -c2w[:, :3, 1].mean(0)
    up = up / np.linalg.norm(up)
    # rotation taking `up` to +z
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(up, z)
    s = np.linalg.norm(v)
    c = float(up @ z)
    if s < 1e-8:
        R = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        vx = np.array(
            [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
        )
        R = np.eye(3) + vx + vx @ vx * ((1 - c) / (s * s))
    center = t.mean(0)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = -R @ center
    t_new = (R @ (t - center).T).T
    scale = 1.0 / max(np.linalg.norm(t_new, axis=1).max(), 1e-8)
    S = np.diag([scale, scale, scale, 1.0])
    return S @ T


@dataclass
class Parser:
    """COLMAP scene parser. Parity: examples/datasets/colmap.py:Parser (:120)."""

    data_dir: str
    factor: int = 1
    normalize: bool = True
    test_every: int = 8

    image_names: List[str] = field(init=False)
    camtoworlds: np.ndarray = field(init=False)  # [C, 4, 4]
    Ks: np.ndarray = field(init=False)  # [C, 3, 3] (downsampled)
    points: np.ndarray = field(init=False)  # [N, 3]
    points_rgb: np.ndarray = field(init=False)  # [N, 3] uint8
    points_err: np.ndarray = field(init=False)
    scene_scale: float = field(init=False)
    transform: np.ndarray = field(init=False)
    image_paths: List[str] = field(init=False)
    widths: List[int] = field(init=False)
    heights: List[int] = field(init=False)

    def __post_init__(self):
        sparse = os.path.join(self.data_dir, "sparse", "0")
        if not os.path.isdir(sparse):
            sparse = os.path.join(self.data_dir, "sparse")
        if os.path.exists(os.path.join(sparse, "cameras.bin")):
            # prefer the native C++ parser (gsplat_tpu/csrc/io.cpp): the
            # record-streamed COLMAP binaries are interpreter-bound in
            # Python; fall back transparently when no compiler exists
            from gsplat_tpu import io_native

            if io_native.native_available():
                rc, ri, rp = (
                    io_native.read_cameras_binary,
                    io_native.read_images_binary,
                    io_native.read_points3d_binary,
                )
            else:
                rc, ri, rp = (
                    read_cameras_binary,
                    read_images_binary,
                    read_points3d_binary,
                )
            cams = rc(os.path.join(sparse, "cameras.bin"))
            images = ri(os.path.join(sparse, "images.bin"))
            xyz, rgb, err = rp(os.path.join(sparse, "points3D.bin"))
        else:
            cams = read_cameras_text(os.path.join(sparse, "cameras.txt"))
            images = read_images_text(os.path.join(sparse, "images.txt"))
            xyz, rgb, err = read_points3d_text(
                os.path.join(sparse, "points3D.txt")
            )

        order = sorted(images.keys(), key=lambda i: images[i]["name"])
        w2c = []
        Ks = []
        names = []
        widths, heights = [], []
        for i in order:
            im = images[i]
            R = _qvec_to_rotmat(im["quat"])
            t = im["tvec"]
            M = np.eye(4)
            M[:3, :3] = R
            M[:3, 3] = t
            w2c.append(M)
            cam = cams[im["camera_id"]]
            K = _intrinsics_from_camera(cam).copy()
            K[:2, :] /= self.factor
            Ks.append(K)
            widths.append(cam["width"] // self.factor)
            heights.append(cam["height"] // self.factor)
            names.append(im["name"])
        w2c = np.stack(w2c).astype(np.float32)
        c2w = np.linalg.inv(w2c)

        if self.normalize:
            T = similarity_from_cameras(c2w)
            c2w = T @ c2w
            xyz = (T[:3, :3] @ xyz.T + T[:3, 3:4]).T
        else:
            T = np.eye(4)

        self.transform = T.astype(np.float32)
        self.camtoworlds = c2w.astype(np.float32)
        self.Ks = np.stack(Ks).astype(np.float32)
        self.points = xyz.astype(np.float32)
        self.points_rgb = rgb
        self.points_err = err
        self.image_names = names
        self.widths = widths
        self.heights = heights

        img_dir = os.path.join(
            self.data_dir,
            f"images_{self.factor}" if self.factor > 1 else "images",
        )
        if not os.path.isdir(img_dir):
            img_dir = os.path.join(self.data_dir, "images")
        self.image_paths = [os.path.join(img_dir, n) for n in names]

        # scene scale: max camera distance from the centroid
        centers = self.camtoworlds[:, :3, 3]
        self.scene_scale = float(
            np.linalg.norm(centers - centers.mean(0), axis=1).max()
        )


class Dataset:
    """Train/val split over parser views. Parity: colmap.py:Dataset (:443)."""

    def __init__(self, parser: Parser, split: str = "train", load_images: bool = True):
        self.parser = parser
        idx = np.arange(len(parser.image_names))
        if parser.test_every > 0:
            if split == "train":
                idx = idx[idx % parser.test_every != 0]
            else:
                idx = idx[idx % parser.test_every == 0]
        self.indices = idx
        self.load_images = load_images

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int) -> dict:
        j = int(self.indices[i])
        item = dict(
            K=self.parser.Ks[j],
            camtoworld=self.parser.camtoworlds[j],
            image_id=j,
            width=self.parser.widths[j],
            height=self.parser.heights[j],
        )
        if self.load_images:
            from PIL import Image

            img = np.asarray(
                Image.open(self.parser.image_paths[j]).convert("RGB"),
                np.float32,
            ) / 255.0
            item["image"] = img
        return item
