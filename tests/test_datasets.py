"""Dataset loaders: NCore (synthetic SequenceSource) + EndoNeRF (tmpdir).

Model: the reference validates its loaders against live data services;
here each parser is driven through a fully synthetic fixture so the
field semantics (poses, masks, dynamic tracks, splits) are pinned
without the proprietary SDKs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from datasets.ncore import (  # noqa: E402
    CuboidObservation,
    FisheyeParams,
    FThetaParams,
    NCoreDataset,
    NCoreParser,
    PinholeParams,
    bbox_pose,
    points_in_bbox,
    se3_inverse,
)
from datasets.normalize import (  # noqa: E402
    align_principal_axes,
    normalize,
    similarity_from_cameras,
    transform_cameras,
    transform_points,
)


# ---------------------------------------------------------------------------
# Synthetic NCore sequence
# ---------------------------------------------------------------------------

W, H = 64, 48
N_FRAMES = 10
FRAME_DT = 100_000  # us
T0 = 1_000_000


class _FakeCamera:
    def __init__(self, params, offset):
        self.params = params
        self.offset = np.asarray(offset, np.float64)
        ts = T0 + FRAME_DT * np.arange(N_FRAMES, dtype=np.int64)
        self.frames_timestamps_us = np.stack(
            [ts, ts + FRAME_DT // 2], axis=1
        )

    def pose_world(self, frame_indices, timepoint):
        # camera drives along +x; END pose is half a frame further
        shift = 0.05 if timepoint == "end" else 0.0
        out = np.tile(np.eye(4), (len(frame_indices), 1, 1))
        out[:, :3, 3] = self.offset[None] + np.stack(
            [
                0.5 * (frame_indices + shift),
                np.zeros(len(frame_indices)),
                np.zeros(len(frame_indices)),
            ],
            axis=1,
        )
        return out

    def ego_mask(self):
        m = np.zeros((H, W), bool)
        m[H - 4 :, :] = True  # hood at the bottom
        return m

    def image(self, frame_idx):
        img = np.zeros((H, W, 3), np.uint8)
        img[..., 0] = frame_idx * 10
        return img

    def frame_mask(self, frame_idx):
        if frame_idx % 2:
            m = np.ones((H, W), bool)
            m[:, :4] = False
            return m
        return None


class _FakePointSource:
    """Static ground plane + a dynamic cluster riding inside the cuboid."""

    def __init__(self):
        self.pc_timestamps_us = T0 + FRAME_DT * np.arange(
            N_FRAMES, dtype=np.int64
        )

    def pc_world(self, i):
        rng = np.random.default_rng(i)
        static = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
        static[:, 2] = 0.0
        # dynamic object centred at the cuboid's position at time i
        dyn_center = _cuboid_center(i)
        dyn = (dyn_center + rng.uniform(-0.4, 0.4, (50, 3))).astype(
            np.float32
        )
        xyz = np.vstack([static, dyn])
        rgb = np.full((250, 3), 100, np.uint8)
        rgb[200:] = 200
        flag = np.zeros(250, bool)
        flag[200:] = True
        return xyz, rgb, flag


def _cuboid_center(i):
    return np.array([1.0 + 0.3 * i, 2.0, 0.5])


class _FakeSource:
    sequence_id = "fake-seq"
    time_range_us = (T0, T0 + FRAME_DT * N_FRAMES)

    def __init__(self, cameras=None):
        self._cams = cameras or {
            "front": _FakeCamera(
                PinholeParams(
                    width=W, height=H, fx=60.0, fy=60.0, cx=32.0, cy=24.0
                ),
                offset=(0, 0, 1.5),
            ),
            "left": _FakeCamera(
                FisheyeParams(
                    width=W,
                    height=H,
                    fx=40.0,
                    fy=40.0,
                    cx=32.0,
                    cy=24.0,
                    radial_coeffs=np.array([0.01, 0.0, 0.0, 0.0]),
                ),
                offset=(0, 1.0, 1.5),
            ),
        }
        self.camera_ids = list(self._cams)
        self.point_cloud_ids = ["lidar0"]
        self.world_to_world_global = None

    def camera(self, cid):
        return self._cams[cid]

    def point_cloud_source(self, pid):
        return _FakePointSource()

    def cuboid_tracks(self, time_range):
        obs = []
        for i in range(N_FRAMES):
            obs.append(
                CuboidObservation(
                    track_id="car-1",
                    class_id="Vehicle",
                    timestamp_us=int(T0 + FRAME_DT * i),
                    bbox_world=np.array(
                        list(_cuboid_center(i)) + [1.2, 1.2, 1.2, 0.3, 0, 0]
                    ),
                )
            )
        return obs


# ---------------------------------------------------------------------------
# NCore tests
# ---------------------------------------------------------------------------


def test_ncore_parser_fields():
    p = NCoreParser(_FakeSource(), camera_ids=["front", "left"])
    n = 2 * N_FRAMES
    assert len(p.frame_list) == n
    assert p.camtoworlds.shape == (n, 4, 4)
    assert p.camtoworlds_end.shape == (n, 4, 4)
    # scene origin = mean camera position -> positions centred near 0
    assert np.abs(p.camtoworlds[:, :3, 3].mean(axis=0)).max() < 1e-6
    # END poses differ from START along the drive direction only
    d = p.camtoworlds_end[:, :3, 3] - p.camtoworlds[:, :3, 3]
    np.testing.assert_allclose(d[:, 0], 0.05 * 0.5, atol=1e-9)
    np.testing.assert_allclose(d[:, 1:], 0.0, atol=1e-9)
    assert p.scene_scale > 0
    # camera records
    assert p.camera_render_data["front"].camera_model == "pinhole"
    assert p.camera_render_data["left"].camera_model == "fisheye"
    assert p.imsize_dict["front"] == (W, H)
    # ego mask dilated but boolean
    assert p.mask_dict["front"].dtype == bool
    assert p.mask_dict["front"].sum() >= (4 * W)


def test_ncore_requires_explicit_cameras_when_ambiguous():
    with pytest.raises(ValueError, match="multiple cameras"):
        NCoreParser(_FakeSource())
    with pytest.raises(ValueError, match="not in sequence"):
        NCoreParser(_FakeSource(), camera_ids=["nope"])


def test_ncore_time_window():
    p = NCoreParser(
        _FakeSource(),
        camera_ids=["front"],
        seek_offset_sec=0.25,
        duration_sec=0.5,
    )
    # frames with START >= T0+250ms and END < T0+750ms
    kept = [f for _, f in p.frame_list]
    ts = T0 + FRAME_DT * np.arange(N_FRAMES)
    expect = [
        i
        for i in range(N_FRAMES)
        if ts[i] >= T0 + 250_000 and ts[i] + FRAME_DT // 2 < T0 + 750_000
    ]
    assert kept == expect


def test_ncore_points_static_only_by_default():
    p = NCoreParser(_FakeSource(), camera_ids=["front"])
    # dynamic returns dropped: all kept colors are the static 100-gray
    assert len(p.points) == N_FRAMES * 200
    assert (p.points_rgb == 100).all()
    # scene frame: static ground plane z==0 shifted by -origin_z
    origin = p.world_global_to_scene.origin
    np.testing.assert_allclose(
        np.unique(np.round(p.points[:, 2], 5)), round(-origin[2], 5)
    )


def test_ncore_rigid_dynamic_tracks():
    p = NCoreParser(
        _FakeSource(),
        camera_ids=["front"],
        rigid_dynamic_track_class_ids=["vehicle"],
    )
    assert len(p.rigid_dynamic_tracks) == 1
    tr = p.rigid_dynamic_tracks[0]
    assert tr.class_id == "vehicle"
    assert len(tr.frame_timestamps_us) == N_FRAMES
    assert tr.poses_local_to_scene.shape == (N_FRAMES, 4, 4)
    # local points live inside the box (|p| <= half-size, with margin)
    assert len(tr.points_local) > 0
    assert np.abs(tr.points_local).max() <= 0.75
    assert (tr.points_rgb == 200).all()
    # with tracks requested, dynamic returns stay in the static cloud too
    assert len(p.points) == N_FRAMES * 250
    # track pose at frame i places local origin at the scene-frame center
    origin = p.world_global_to_scene.origin
    for i in (0, 5):
        np.testing.assert_allclose(
            tr.poses_local_to_scene[i][:3, 3],
            _cuboid_center(i) - origin,
            atol=1e-5,
        )


def test_ncore_class_filtering():
    p = NCoreParser(
        _FakeSource(),
        camera_ids=["front"],
        rigid_dynamic_track_class_ids=["pedestrian"],
    )
    assert p.rigid_dynamic_tracks == []


def test_ncore_normalize_world_space():
    p = NCoreParser(
        _FakeSource(),
        camera_ids=["front", "left"],
        normalize_world_space=True,
        rigid_dynamic_track_class_ids=["vehicle"],
    )
    # rotations stay orthonormal after the similarity
    R = p.camtoworlds[:, :3, :3]
    np.testing.assert_allclose(
        R @ np.transpose(R, (0, 2, 1)),
        np.tile(np.eye(3), (len(R), 1, 1)),
        atol=1e-6,
    )
    Rt = p.rigid_dynamic_tracks[0].poses_local_to_scene[:, :3, :3]
    np.testing.assert_allclose(
        Rt @ np.transpose(Rt, (0, 2, 1)),
        np.tile(np.eye(3), (len(Rt), 1, 1)),
        atol=1e-5,
    )
    assert hasattr(p, "transform")


def test_ncore_dataset_items():
    p = NCoreParser(_FakeSource(), camera_ids=["front"], test_every=5)
    train = NCoreDataset(p, "train")
    val = NCoreDataset(p, "val")
    assert len(train) + len(val) == N_FRAMES
    assert len(val) == 2  # indices 0, 5
    item = train[0]
    assert item["image"].shape == (H, W, 3)
    assert item["image"].dtype == np.float32
    assert item["K"].shape == (3, 3)
    assert item["camtoworld"].shape == (4, 4)
    assert item["camtoworld_end"].shape == (4, 4)
    # mask merges ego (bottom rows invalid) and, on odd frames, left cols
    assert item["mask"].dtype == bool
    assert not item["mask"][H - 1].any()  # ego-dilated hood rows
    # item 0 of train split is frame 1 (odd) -> frame mask applied
    assert not item["mask"][0, 0]


def test_ncore_ftheta_camera_record():
    cams = {
        "fish": _FakeCamera(
            FThetaParams(
                width=W,
                height=H,
                cx=32.0,
                cy=24.0,
                reference_poly="pixeldist_to_angle",
                pixeldist_to_angle_poly=(0.0, 0.02, 0.0, 0.0, 0.0, 0.0),
                angle_to_pixeldist_poly=(0.0, 50.0, 0.0, 0.0, 0.0, 0.0),
                max_angle=1.8,
            ),
            offset=(0, 0, 1.5),
        )
    }
    p = NCoreParser(_FakeSource(cameras=cams), camera_ids=["fish"])
    rd = p.camera_render_data["fish"]
    assert rd.camera_model == "ftheta"
    assert rd.ftheta_coeffs.max_angle == 1.8
    # ftheta K is identity-focal with principal point only
    np.testing.assert_allclose(p.Ks_dict["fish"][0, 0], 1.0)


def test_bbox_geometry_roundtrip():
    bbox = np.array([1.0, -2.0, 0.5, 2.0, 1.0, 0.8, 0.7, 0.1, -0.2])
    T = bbox_pose(bbox)
    np.testing.assert_allclose(T @ se3_inverse(T), np.eye(4), atol=1e-12)
    # center is inside; a corner just outside is not
    assert points_in_bbox(bbox[None, :3], bbox)[0]
    outside = bbox[:3] + (T[:3, :3] @ (bbox[3:6] / 2 + 0.05))
    assert not points_in_bbox(outside[None], bbox)[0]


# ---------------------------------------------------------------------------
# normalize.py
# ---------------------------------------------------------------------------


def _random_cams(n=12, seed=0):
    rng = np.random.default_rng(seed)
    c2w = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        c2w[i, :3, :3] = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        c2w[i, :3, 3] = rng.normal(scale=5.0, size=3) + np.array([10, -3, 7])
    return c2w


def test_similarity_normalizes_scale_and_center():
    c2w = _random_cams()
    T = similarity_from_cameras(c2w)
    out = transform_cameras(T, c2w)
    d = np.linalg.norm(out[:, :3, 3], axis=1)
    np.testing.assert_allclose(np.median(d), 1.0, rtol=0.35)
    # rotations orthonormal
    R = out[:, :3, :3]
    np.testing.assert_allclose(
        R @ np.transpose(R, (0, 2, 1)),
        np.tile(np.eye(3), (len(R), 1, 1)),
        atol=1e-8,
    )


def test_align_principal_axes_diagonalizes():
    rng = np.random.default_rng(1)
    # anisotropic cloud rotated arbitrarily
    pts = rng.normal(size=(2000, 3)) * np.array([5.0, 2.0, 0.3])
    ang = 0.7
    R = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ]
    )
    T = align_principal_axes(pts @ R.T + 3.0)
    out = transform_points(T, pts @ R.T + 3.0)
    cov = np.cov(out - np.median(out, axis=0), rowvar=False)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 0.15
    # z gets the smallest variance
    assert cov[2, 2] == np.min(np.diag(cov))
    assert np.linalg.det(T[:3, :3]) > 0


def test_normalize_composition():
    c2w = _random_cams(seed=3)
    pts = np.random.default_rng(4).normal(size=(500, 3)) * 4 + 2
    c2w2, pts2, T = normalize(c2w, pts)
    np.testing.assert_allclose(
        transform_points(T, pts), pts2, atol=1e-9
    )
    c2w_only, T1 = normalize(c2w)
    assert c2w_only.shape == c2w.shape and T1.shape == (4, 4)


# ---------------------------------------------------------------------------
# EndoNeRF
# ---------------------------------------------------------------------------


def _write_endonerf_dir(tmp_path, n=9, bad_mask=False):
    from PIL import Image

    h, w, focal = 24, 32, 40.0
    poses = np.zeros((n, 3, 5), np.float64)
    for i in range(n):
        # LLFF [down, right, back] columns
        poses[i, :, 0] = [0, -1, 0]  # down
        poses[i, :, 1] = [1, 0, 0]  # right
        poses[i, :, 2] = [0, 0, 1]  # back
        poses[i, :, 3] = [0.01 * i, 0, 0]
        poses[i, :, 4] = [h, w, focal]
    bounds = np.tile([0.1, 2.0], (n, 1))
    np.save(
        tmp_path / "poses_bounds.npy",
        np.concatenate([poses.reshape(n, 15), bounds], axis=1),
    )
    for sub in ("images", "depth", "masks"):
        (tmp_path / sub).mkdir()
    for i in range(n):
        Image.fromarray(
            np.full((h, w, 3), i * 20, np.uint8)
        ).save(tmp_path / "images" / f"{i:06d}.png")
        Image.fromarray(
            (np.ones((h, w)) * 100).astype(np.uint16)
        ).save(tmp_path / "depth" / f"{i:06d}.png")
        mask = np.zeros((h, w), np.uint8)
        mask[:4] = 255  # tool at the top
        if bad_mask:
            mask[5, 5] = 17
        Image.fromarray(mask).save(tmp_path / "masks" / f"{i:06d}.png")
    return h, w, focal


def test_endonerf_parser_and_dataset(tmp_path):
    from datasets.endonerf import EndoNeRFDataset, EndoNeRFParser

    h, w, focal = _write_endonerf_dir(tmp_path)
    p = EndoNeRFParser(str(tmp_path), test_every=4)
    assert (p.height, p.width, p.focal) == (h, w, focal)
    assert p.camtoworlds.shape == (9, 4, 4)
    # LLFF -> standard: right/up/back columns
    np.testing.assert_allclose(p.camtoworlds[0, :3, 0], [1, 0, 0])
    np.testing.assert_allclose(p.camtoworlds[0, :3, 1], [0, 1, 0])
    np.testing.assert_allclose(p.camtoworlds[0, :3, 2], [0, 0, 1])
    # split: test iff (i-1) % 4 == 0 -> {1, 5}
    assert p.test_idxs == [1, 5]
    assert len(p.train_idxs) == 7

    ds = EndoNeRFDataset(p, "test")
    item = ds[0]
    assert item["image"].shape == (h, w, 3)
    assert item["image"].max() <= 1.0
    assert item["depth"].shape == (h, w)
    # tissue-include mask: tool rows (255 on disk) -> 0
    assert item["mask"][0, 0] == 0.0 and item["mask"][-1, -1] == 1.0
    assert item["time"] == np.float32(1 / 9)
    video = EndoNeRFDataset(p, "video")
    assert len(video) == 9


def test_endonerf_rejects_non_binary_mask(tmp_path):
    from datasets.endonerf import EndoNeRFParser

    _write_endonerf_dir(tmp_path, bad_mask=True)
    with pytest.raises(ValueError, match="non-binary"):
        EndoNeRFParser(str(tmp_path))


def test_endonerf_scared_stub(tmp_path):
    from datasets.endonerf import EndoNeRFParser

    with pytest.raises(NotImplementedError):
        EndoNeRFParser(str(tmp_path), dataset_type="scared")


def test_av_trainer_ncore_path():
    """The AV trainer consumes an NCore SequenceSource end-to-end
    (reference: av_trainer on NCoreParser data) — photometric-only,
    loss decreases over a few steps."""
    import av_trainer as av

    scene = av.ncore_scene(
        _FakeSource(), camera_ids=["front"], max_frames=3,
        max_points=2000,
    )
    assert scene["images"].shape[0] == 3
    assert scene["viewmats"].shape == (3, 4, 4)
    assert scene["masks"] is not None
    cfg = av.Config(data="ncore", max_steps=12, cap_max=2048,
                    isect_capacity=200_000)
    runner = av.AVRunner(cfg, scene)
    losses = runner.train()
    assert losses[-1] <= losses[0]


def test_dynamic_surgical_trainer_endonerf_path(tmp_path):
    """The dynamic trainer consumes a real EndoNeRF directory: depth
    unprojection init, per-frame masked photometric loss, loss decrease."""
    import dynamic_surgical_trainer as dst

    _write_endonerf_dir(tmp_path, n=5)
    cfg = dst.Config(max_steps=10, cap=512)
    scene = dst.endonerf_scene(cfg, str(tmp_path), factor=1, max_frames=4)
    assert scene["gt"].shape[0] == 4
    assert scene["masks"] is not None
    assert len(scene["points"]) > 0
    losses = dst.run_training(cfg, scene)
    # the fixture's frames differ per time in COLOR (which geometric
    # deformation cannot express) so per-step losses are frame-dependent
    # and not comparable; the contract here is that the full real-data
    # path (depth unprojection, per-frame masks, per-time cameras)
    # executes end-to-end with finite losses (strict decrease is
    # asserted on the synthetic regime, where targets are renderable)
    assert all(np.isfinite(l) for l in losses)
