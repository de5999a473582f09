"""Spinning-lidar sensor model (row-offset structured), pure jnp.

Behavior parity (independently implemented):
  - gsplat/cuda/_torch_lidars.py:_RowOffsetStructuredSpinningLidarModel:
    image points in SCALED ANGLE space (azimuth*1024, elevation*1024),
    spherical projection, FOV validity, per-column shutter time.
  - gsplat/cuda/_lidar.py: FOV computation from row elevations / column
    azimuths + per-row azimuth offsets, element->angle lookups,
    angle normalization.

TPU-native redesign of the tiling: the reference builds an irregular
histogram-equalized (azimuth, elevation)-bin tiling with per-tile element
lists (LidarTiling, compute_tiling, IntersectTileLidar.cu) to load-balance
CUDA thread blocks. Here the structured lidar IS a regular
(n_rows x n_columns) ray grid, so rasterization runs through the standard
eval3d Pallas kernel over regular 16x16 element tiles with per-element
rays; projected angle-space extents are converted to element-grid extents
with the (sorted) row/column angle tables. No pack_info / elements_map /
angles_to_columns_map acceleration structures are needed.
"""

from __future__ import annotations

import dataclasses
import math
from enum import Enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

ANGLE_TO_PIXEL_SCALING_FACTOR = 1024.0


class SpinningDirection(Enum):
    CLOCKWISE = "clockwise"
    COUNTER_CLOCKWISE = "counter_clockwise"


def normalize_azimuth(a: Array) -> Array:
    """Wrap to (-pi, pi]."""
    a = jnp.where(a > math.pi, a - 2 * math.pi, a)
    return jnp.where(a <= -math.pi, a + 2 * math.pi, a)


@dataclasses.dataclass(frozen=True)
class LidarModel:
    """Row-offset structured spinning lidar (e.g. Hesai P128 layout).

    Static scalars are Python floats/ints (computed at build), per-row/
    column tables are jnp arrays. `kind` mirrors CameraModel for dispatch.
    """

    kind: str  # always "lidar"
    n_rows: int
    n_columns: int
    row_elevations_rad: Array  # [n_rows] descending (cw)
    column_azimuths_rad: Array  # [n_columns] sorted in spin direction
    row_azimuth_offsets_rad: Array  # [n_rows]
    spinning_direction: SpinningDirection
    spinning_frequency_hz: float
    # FOV (start/span in radians; vertical always clockwise)
    fov_vert_start: float
    fov_vert_span: float
    fov_horiz_start: float
    fov_horiz_span: float
    fov_eps_rad: float

    @property
    def width(self) -> int:
        return self.n_columns

    @property
    def height(self) -> int:
        return self.n_rows

    def rel_azimuth(self, az: Array, scale: float = 1.0) -> Array:
        """Relative azimuth from FOV start, in [0, scale*2pi)."""
        if self.spinning_direction == SpinningDirection.CLOCKWISE:
            rel = self.fov_horiz_start * scale - az
        else:
            rel = az - self.fov_horiz_start * scale
        return rel % (scale * 2 * math.pi)

    def rel_elevation(self, el: Array, scale: float = 1.0) -> Array:
        """Relative elevation from FOV start (clockwise: start - el)."""
        return self.fov_vert_start * scale - el

    def valid_sensor_angles(self, az: Array, el: Array, scale: float = 1.0) -> Array:
        eps = self.fov_eps_rad
        start_v = (self.fov_vert_start + eps) * scale
        if self.spinning_direction == SpinningDirection.CLOCKWISE:
            start_h = self.fov_horiz_start + eps
        else:
            start_h = self.fov_horiz_start - eps
        rel_el = start_v - el
        if self.spinning_direction == SpinningDirection.CLOCKWISE:
            rel_az = (start_h * scale - az) % (scale * 2 * math.pi)
        else:
            rel_az = (az - start_h * scale) % (scale * 2 * math.pi)
        return (rel_el <= scale * (self.fov_vert_span + 2 * eps)) & (
            rel_az <= scale * (self.fov_horiz_span + 2 * eps)
        )


def make_lidar(
    row_elevations_rad,
    column_azimuths_rad,
    row_azimuth_offsets_rad,
    spinning_direction: SpinningDirection = SpinningDirection.CLOCKWISE,
    spinning_frequency_hz: float = 10.0,
    fov_eps_factor: int = 4,
) -> LidarModel:
    """Build a LidarModel; FOV parity with _lidar.py:_compute_fov_*."""
    import numpy as np

    re = np.asarray(row_elevations_rad, np.float32)
    ca = np.asarray(column_azimuths_rad, np.float32)
    ro = np.asarray(row_azimuth_offsets_rad, np.float32)
    n_rows, n_cols = re.shape[0], ca.shape[0]

    fov_vert_start = float(re[0])
    fov_vert_span = float(re[0] - re[-1])
    assert fov_vert_span >= 0, "row elevations must be descending"

    extremes = ca[None, [0, n_cols - 1]] + ro[:, None]
    if spinning_direction == SpinningDirection.COUNTER_CLOCKWISE:
        start = float(extremes[:, 0].min())
        span = float(extremes[:, -1].max() - start)
    else:
        start = float(extremes[:, 0].max())
        span = float(start - extremes[:, -1].min())
    span = min(span, 2 * math.pi)

    return LidarModel(
        kind="lidar",
        n_rows=n_rows,
        n_columns=n_cols,
        row_elevations_rad=jnp.asarray(re),
        column_azimuths_rad=jnp.asarray(ca),
        row_azimuth_offsets_rad=jnp.asarray(ro),
        spinning_direction=spinning_direction,
        spinning_frequency_hz=spinning_frequency_hz,
        fov_vert_start=fov_vert_start,
        fov_vert_span=fov_vert_span,
        fov_horiz_start=start,
        fov_horiz_span=span,
        fov_eps_rad=fov_eps_factor * float(jnp.finfo(jnp.float32).eps),
    )


# ---------------------------------------------------------------------------
# CameraModel-protocol functions (dispatched from sensors.cameras)
# ---------------------------------------------------------------------------


def lidar_ray_to_image_point(
    lidar: LidarModel, cam_ray: Array, margin_factor: float
) -> Tuple[Array, Array]:
    """Sensor-frame ray -> scaled-angle image point [..., 2] + validity.

    Parity: _torch_lidars.py:camera_ray_to_image_point — margin is a
    fraction of the FOV spans.
    """
    n = jnp.linalg.norm(cam_ray, axis=-1, keepdims=True)
    r = cam_ray / jnp.where(n > 0, n, 1.0)
    az = jnp.arctan2(r[..., 1], r[..., 0])
    el = jnp.arcsin(jnp.clip(r[..., 2], -1.0, 1.0))
    pt = jnp.stack(
        [az * ANGLE_TO_PIXEL_SCALING_FACTOR, el * ANGLE_TO_PIXEL_SCALING_FACTOR],
        axis=-1,
    )
    rel_az = lidar.rel_azimuth(az)
    rel_el = lidar.rel_elevation(el)
    m_el = margin_factor * lidar.fov_vert_span
    m_az = margin_factor * lidar.fov_horiz_span
    valid = (
        (rel_el <= lidar.fov_vert_span + m_el)
        & (rel_az <= lidar.fov_horiz_span + m_az)
        & (rel_el >= -m_el)
        & (rel_az >= -m_az)
    )
    return pt, valid


def lidar_image_point_to_ray(
    lidar: LidarModel, image_point: Array
) -> Tuple[Array, Array]:
    """Scaled-angle image point -> unit sensor ray + FOV validity."""
    k = 1.0 / ANGLE_TO_PIXEL_SCALING_FACTOR
    az = image_point[..., 0] * k
    el = image_point[..., 1] * k
    ce = jnp.cos(el)
    ray = jnp.stack([jnp.cos(az) * ce, jnp.sin(az) * ce, jnp.sin(el)], axis=-1)
    return ray, lidar.valid_sensor_angles(az, el)


def lidar_shutter_relative_frame_time(
    lidar: LidarModel, image_point: Array
) -> Array:
    """Per-point shutter time in [0, 1] ~= column index / (n_columns - 1).

    TPU-native simplification of the reference's angles_to_columns_map
    KD-tree lookup (_torch_lidars.py:325-374): the fractional column of an
    azimuth is recovered by interpolation on the (sorted) relative column
    azimuths — exact for the map's purpose (whole columns fire at once).
    """
    k = 1.0 / ANGLE_TO_PIXEL_SCALING_FACTOR
    az = image_point[..., 0] * k
    rel_az = lidar.rel_azimuth(az)
    rel_cols = lidar.rel_azimuth(lidar.column_azimuths_rad)  # [n_cols] ascending
    col = jnp.interp(rel_az, rel_cols, jnp.arange(lidar.n_columns, dtype=az.dtype))
    return col / max(lidar.n_columns - 1, 1)


def lidar_element_image_points(lidar: LidarModel) -> Array:
    """[n_rows, n_columns, 2] scaled-angle image points of every element
    (parity: _torch_lidars.py:element_to_image_point)."""
    el = lidar.row_elevations_rad[:, None]  # [R, 1]
    az = lidar.column_azimuths_rad[None, :] + lidar.row_azimuth_offsets_rad[:, None]
    az = normalize_azimuth(az)
    return (
        jnp.stack([jnp.broadcast_to(az, az.shape), jnp.broadcast_to(el, az.shape)], -1)
        * ANGLE_TO_PIXEL_SCALING_FACTOR
    )


def generate_lidar_rays(
    lidar: LidarModel,
    viewmats: Array,  # [C, 4, 4] world-to-sensor
    viewmats_rs: Optional[Array] = None,
) -> Array:
    """World-space rays for every lidar element: [C, n_rows, n_columns, 6].

    With viewmats_rs, each column's pose is slerped at its shutter time
    (whole columns fire simultaneously; parity with the eval3d lidar ray
    generation through image_point_to_world_ray_shutter_pose).
    """
    from .cameras import (
        interpolate_shutter_pose,
        pose_camera_ray_to_world_ray,
        viewmat_to_pose,
    )

    pts = lidar_element_image_points(lidar)  # [R, Cc, 2]
    rays_sensor, _valid = lidar_image_point_to_ray(lidar, pts)  # [R, Cc, 3]
    C = viewmats.shape[0]
    pose_start = viewmat_to_pose(viewmats)  # [C, 7]
    if viewmats_rs is None:
        pose = pose_start[:, None, None, :]  # [C, 1, 1, 7]
    else:
        pose_end = viewmat_to_pose(viewmats_rs)
        t = lidar_shutter_relative_frame_time(lidar, pts)  # [R, Cc]
        t = jnp.broadcast_to(t, (C,) + t.shape)
        pose = interpolate_shutter_pose(
            pose_start[:, None, None, :], pose_end[:, None, None, :], t
        )
    rays_sensor = jnp.broadcast_to(rays_sensor, (C,) + rays_sensor.shape)
    org, dirn = pose_camera_ray_to_world_ray(pose, rays_sensor)
    org = jnp.broadcast_to(org, dirn.shape)
    return jnp.concatenate([org, dirn], axis=-1)


def angle_extent_to_element_grid(
    lidar: LidarModel,
    means2d_angle: Array,  # [..., 2] scaled-angle image points
    radii_angle: Array,  # [..., 2] int32 scaled-angle radii
) -> Tuple[Array, Array]:
    """Convert angle-space centers/radii to element-grid (col,row) space.

    Centers map exactly via interpolation on the sorted relative angle
    tables; radii are scaled by the local angular spacing (conservative
    1.5x margin). Used to feed the regular-tile emission plan — the TPU
    replacement for IntersectTileLidar.cu's az/el-bin tiling.
    """
    k = 1.0 / ANGLE_TO_PIXEL_SCALING_FACTOR
    dtype = means2d_angle.dtype
    az = means2d_angle[..., 0] * k
    el = means2d_angle[..., 1] * k
    rel_az = lidar.rel_azimuth(az)
    rel_el = lidar.rel_elevation(el)

    rel_cols = lidar.rel_azimuth(lidar.column_azimuths_rad)  # ascending
    rel_rows = lidar.rel_elevation(lidar.row_elevations_rad)  # ascending
    idx_c = jnp.arange(lidar.n_columns, dtype=dtype)
    idx_r = jnp.arange(lidar.n_rows, dtype=dtype)
    col = jnp.interp(rel_az, rel_cols, idx_c)
    row = jnp.interp(rel_el, rel_rows, idx_r)
    means2d_grid = jnp.stack([col, row], axis=-1) + 0.5  # pixel centers

    # local spacing (rad / element) at the mapped index
    sp_c = jnp.diff(rel_cols)
    sp_r = jnp.diff(rel_rows)
    ic = jnp.clip(col.astype(jnp.int32), 0, lidar.n_columns - 2)
    ir = jnp.clip(row.astype(jnp.int32), 0, lidar.n_rows - 2)
    loc_c = jnp.maximum(sp_c[ic], 1e-8)
    loc_r = jnp.maximum(sp_r[ir], 1e-8)
    r_az = radii_angle[..., 0].astype(dtype) * k
    r_el = radii_angle[..., 1].astype(dtype) * k
    radii_grid = jnp.stack(
        [jnp.ceil(1.5 * r_az / loc_c), jnp.ceil(1.5 * r_el / loc_r)], axis=-1
    )
    radii_grid = jnp.where(
        (radii_angle > 0).all(-1)[..., None], radii_grid, 0.0
    ).astype(jnp.int32)
    return means2d_grid, radii_grid
