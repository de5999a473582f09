"""Trajectory generator tests (reference examples/datasets/traj.py parity)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

from datasets.traj import (  # noqa: E402
    average_pose,
    focus_point,
    generate_ellipse_path_y,
    generate_ellipse_path_z,
    generate_interpolated_path,
    generate_spiral_path,
    lookat_matrix,
)


def _ring_poses(n=12, radius=3.0, z=1.0):
    """Cameras on a ring looking at the origin (z-up capture)."""
    poses = []
    for th in np.linspace(0, 2 * np.pi, n, endpoint=False):
        pos = np.array([radius * np.cos(th), radius * np.sin(th), z])
        poses.append(lookat_matrix(-pos, np.array([0.0, 0, 1]), pos))
    return np.stack(poses)


def _assert_valid_poses(poses, n):
    assert poses.shape == (n, 3, 4)
    R = poses[:, :3, :3]
    rtr = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (n, 1, 1)), atol=1e-6)
    assert np.isfinite(poses).all()


def test_focus_point_of_converging_ring():
    poses = _ring_poses()
    fp = focus_point(poses)
    np.testing.assert_allclose(fp, [0, 0, 0], atol=1e-6)


def test_average_pose_orthonormal():
    poses = _ring_poses()
    ap = average_pose(poses)
    np.testing.assert_allclose(ap[:, :3].T @ ap[:, :3], np.eye(3), atol=1e-9)


def test_ellipse_z_orbits_the_focus():
    poses = _ring_poses()
    path = generate_ellipse_path_z(poses, n_frames=24, height=1.0)
    _assert_valid_poses(path, 24)
    # every generated camera looks at the focus point (origin-ish, z=height)
    center = focus_point(poses)
    to_center = center - path[:, :3, 3]
    to_center /= np.linalg.norm(to_center, axis=1, keepdims=True)
    cosang = np.einsum("ni,ni->n", to_center, path[:, :3, 2])
    np.testing.assert_allclose(cosang, 1.0, atol=1e-6)


def test_ellipse_y_valid():
    # y-up capture: swap axes of the ring
    poses = _ring_poses()
    swap = np.array([[1.0, 0, 0], [0, 0, 1.0], [0, 1.0, 0]])
    poses = np.einsum("ij,njk->nik", swap, poses)
    path = generate_ellipse_path_y(poses, n_frames=16)
    _assert_valid_poses(path, 16)


def test_spiral_forward_facing():
    poses = _ring_poses(n=8, radius=0.3, z=0.1)
    path = generate_spiral_path(
        poses, bounds=np.array([1.0, 10.0]), n_frames=20
    )
    _assert_valid_poses(path, 20)
    # spiral stays near the capture volume
    assert np.abs(path[:, :3, 3]).max() < 5.0


def test_interpolated_path_passes_near_keyframes():
    poses = _ring_poses(n=6)
    path = generate_interpolated_path(poses, n_interp=10, smoothness=0.0)
    _assert_valid_poses(path, 50)
    # with zero smoothing the spline interpolates: frame 0 == keyframe 0
    np.testing.assert_allclose(path[0, :3, 3], poses[0, :3, 3], atol=1e-6)
    # rotation at frame 0 matches too
    np.testing.assert_allclose(path[0], poses[0], atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
