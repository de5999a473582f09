"""Spinning-lidar model + lidar rendering tests.

Mirrors the reference's lidar coverage (tests for _torch_lidars /
IntersectTileLidar / lidar raster through the eval3d path) against the
TPU-native regular-element-grid design (sensors/lidars.py docstring).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.sensors.lidars import (
    ANGLE_TO_PIXEL_SCALING_FACTOR,
    SpinningDirection,
    angle_extent_to_element_grid,
    generate_lidar_rays,
    lidar_element_image_points,
    lidar_image_point_to_ray,
    lidar_ray_to_image_point,
    make_lidar,
    lidar_shutter_relative_frame_time,
)


def _front_lidar(n_rows=32, n_cols=96):
    """Frontal 120deg x 40deg lidar, clockwise spin."""
    el = np.linspace(0.35, -0.35, n_rows).astype(np.float32)
    az = np.linspace(math.radians(60), math.radians(-60), n_cols).astype(
        np.float32
    )
    off = (0.001 * np.sin(np.arange(n_rows))).astype(np.float32)
    return make_lidar(el, az, off, SpinningDirection.CLOCKWISE)


def test_ray_image_point_roundtrip():
    lidar = _front_lidar()
    pts = lidar_element_image_points(lidar)  # [R, C, 2]
    rays, valid = lidar_image_point_to_ray(lidar, pts)
    assert bool(valid.all())
    # tiny margin absorbs f32 rounding at the FOV boundary elements (the
    # reference's UT margin default is 0.1)
    pts2, valid2 = lidar_ray_to_image_point(lidar, rays, margin_factor=1e-3)
    assert bool(valid2.all())
    np.testing.assert_allclose(np.asarray(pts2), np.asarray(pts), atol=1e-2)


def test_fov_validity():
    lidar = _front_lidar()
    # ray far outside the 120deg horizontal FOV (pointing backward)
    back = jnp.asarray([[-1.0, 0.0, 0.0]])
    _, valid = lidar_ray_to_image_point(lidar, back, margin_factor=0.0)
    assert not bool(valid[0])
    fwd = jnp.asarray([[1.0, 0.0, 0.0]])
    _, valid = lidar_ray_to_image_point(lidar, fwd, margin_factor=0.0)
    assert bool(valid[0])


def test_shutter_time_monotone_in_spin_direction():
    lidar = _front_lidar()
    pts = lidar_element_image_points(lidar)
    t = lidar_shutter_relative_frame_time(lidar, pts)  # [R, C]
    t_row = np.asarray(t[0])
    assert t_row[0] <= 0.02 and t_row[-1] >= 0.98
    assert (np.diff(t_row) >= -1e-5).all()


def test_element_grid_conversion_centers():
    lidar = _front_lidar()
    pts = lidar_element_image_points(lidar)  # exact element angle points
    radii = jnp.full(pts.shape[:-1] + (2,), 8, jnp.int32)
    m2g, rdg = angle_extent_to_element_grid(lidar, pts, radii)
    # element (r, c) should land at grid center (c + .5, r + .5) up to the
    # small per-row azimuth offsets
    cols = np.asarray(m2g[..., 0]) - 0.5
    rows = np.asarray(m2g[..., 1]) - 0.5
    R, C = pts.shape[:2]
    np.testing.assert_allclose(rows, np.arange(R)[:, None].repeat(C, 1), atol=0.02)
    np.testing.assert_allclose(cols, np.arange(C)[None].repeat(R, 0), atol=0.5)
    assert int(rdg.min()) >= 1


def test_lidar_rendering_range_image():
    """Render a range image of a wall of gaussians; check hit distances."""
    from gsplat_tpu.rendering import rasterization

    lidar = _front_lidar()
    rng = np.random.default_rng(11)
    # wall of gaussians at x = 4 in front of the sensor
    gy, gz = np.meshgrid(
        np.linspace(-4, 4, 24), np.linspace(-1.4, 1.4, 12), indexing="xy"
    )
    N = gy.size
    means = jnp.asarray(
        np.stack([np.full(N, 4.0), gy.reshape(-1), gz.reshape(-1)], -1),
        jnp.float32,
    )
    quats = jnp.asarray(
        np.tile(np.array([1.0, 0, 0, 0], np.float32), (N, 1))
    )
    scales = jnp.full((N, 3), 0.22)
    opac = jnp.full((N,), 0.95)
    colors = jnp.asarray(rng.uniform(0.2, 1, (N, 1)).astype(np.float32))
    viewmats = jnp.eye(4)[None]
    Ks = jnp.eye(3)[None]  # unused for lidar

    img, alpha, meta = rasterization(
        means, quats, scales, opac, colors, viewmats, Ks, 0, 0,
        camera_model="lidar", lidar_coeffs=lidar,
        with_ut=True, with_eval3d=True,
        render_mode="RGB-d", global_z_order=False,
        near_plane=0.01, far_plane=100.0,
    )
    assert img.shape == (1, lidar.n_rows, lidar.n_columns, 2)
    a = np.asarray(alpha[0, ..., 0])
    hd = np.asarray(img[0, ..., 1])
    assert a.max() > 0.9, a.max()
    # opaque central pixels: hit distance ~ 4 (wall at x=4, sensor at 0)
    center = hd[lidar.n_rows // 2 - 2 : lidar.n_rows // 2 + 2,
                lidar.n_columns // 2 - 4 : lidar.n_columns // 2 + 4]
    ac = a[lidar.n_rows // 2 - 2 : lidar.n_rows // 2 + 2,
           lidar.n_columns // 2 - 4 : lidar.n_columns // 2 + 4]
    assert (np.abs(center[ac > 0.9] - 4.0) < 0.5).all(), center

    def loss(m, s):
        img, alpha, _ = rasterization(
            m, quats, s, opac, colors, viewmats, Ks, 0, 0,
            camera_model="lidar", lidar_coeffs=lidar,
            with_ut=True, with_eval3d=True,
            render_mode="RGB-d", global_z_order=False,
        )
        return (img**2).mean()

    g = jax.grad(loss, argnums=(0, 1))(means, scales)
    for gi in g:
        assert bool(jnp.isfinite(gi).all())
        assert float(jnp.abs(gi).sum()) > 0


def test_lidar_rolling_shutter_rays():
    lidar = _front_lidar()
    vm0 = jnp.eye(4)[None]
    vm1 = vm0.at[:, 1, 3].add(0.3)
    rays_g = generate_lidar_rays(lidar, vm0)
    rays_rs = generate_lidar_rays(lidar, vm0, vm1)
    assert rays_g.shape == (1, lidar.n_rows, lidar.n_columns, 6)
    # first column fires at t~0 (same pose); last at t~1 (moved origin)
    d0 = np.abs(np.asarray(rays_rs[0, :, 0, :3] - rays_g[0, :, 0, :3]))
    d1 = np.abs(np.asarray(rays_rs[0, :, -1, :3] - rays_g[0, :, -1, :3]))
    assert d0.max() < 1e-2
    assert d1.max() > 0.25
