"""Camera-model tests: projection/unprojection roundtrips, validity rules,
rolling shutter, and UT projection vs the EWA linearization.

Mirrors the reference's sensors test strategy (oracle + roundtrip checks in
tests/sensors/) without its CUDA-vs-torch split: here the pure-jnp model is
the single implementation, so we assert self-consistency and cross-check UT
against the independent EWA projection for near-linear configurations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.projection_ut import fully_fused_projection_ut
from gsplat_tpu.sensors import (
    FThetaCameraDistortionParameters,
    FThetaPolynomialType,
    RollingShutterType,
    UnscentedTransformParameters,
    camera_ray_to_image_point,
    image_point_to_camera_ray,
    image_point_to_world_ray_shutter_pose,
    make_camera,
    viewmat_to_pose,
    world_point_to_image_point_shutter_pose,
)

W, H = 640, 480


def _intrinsics(C=2):
    fl = jnp.asarray([[320.0, 330.0]] * C)
    pp = jnp.asarray([[W / 2, H / 2]] * C)
    return fl, pp


def _rays(C=2, M=64, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(C, M, 3)).astype(np.float32)
    d[..., 2] = np.abs(d[..., 2]) + 1.0  # in front
    d[..., :2] *= 0.3
    return jnp.asarray(d)


@pytest.mark.parametrize("model", ["pinhole", "fisheye"])
def test_roundtrip_simple_models(model):
    fl, pp = _intrinsics()
    kwargs = {}
    if model == "fisheye":
        kwargs["radial_coeffs"] = jnp.asarray([[0.02, -0.005, 0.001, 0.0]] * 2)
    cam = make_camera(model, W, H, fl, pp, **kwargs)
    rays = _rays()
    pt, valid = camera_ray_to_image_point(cam, rays, margin_factor=0.0)
    ray2, valid2 = image_point_to_camera_ray(cam, pt)
    unit = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    mask = np.asarray(valid & valid2)
    assert mask.sum() > 50
    np.testing.assert_allclose(
        np.asarray(ray2)[mask], np.asarray(unit)[mask], atol=2e-4
    )


def test_roundtrip_opencv_pinhole():
    fl, pp = _intrinsics()
    cam = make_camera(
        "pinhole", W, H, fl, pp,
        radial_coeffs=jnp.asarray([[0.05, -0.01, 0.002, 0.0]] * 2),
        tangential_coeffs=jnp.asarray([[1e-3, -5e-4]] * 2),
        thin_prism_coeffs=jnp.asarray([[1e-4, 0.0, -1e-4, 0.0]] * 2),
    )
    assert cam.kind == "opencv_pinhole"
    rays = _rays()
    pt, valid = camera_ray_to_image_point(cam, rays, margin_factor=0.0)
    ray2, conv = image_point_to_camera_ray(cam, pt)
    unit = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    mask = np.asarray(valid & conv)
    assert mask.sum() > 40
    np.testing.assert_allclose(
        np.asarray(ray2)[mask], np.asarray(unit)[mask], atol=5e-4
    )


def _ftheta_params(reference=FThetaPolynomialType.ANGLE_TO_PIXELDIST):
    # a gentle f-theta lens: pixeldist ~ 300*theta with mild cubic term
    return FThetaCameraDistortionParameters(
        reference_poly=reference,
        angle_to_pixeldist_poly=(0.0, 300.0, 0.0, -10.0, 0.0, 0.0),
        pixeldist_to_angle_poly=(0.0, 1.0 / 300.0, 0.0, 10.0 / 300.0**4, 0.0, 0.0),
        max_angle=1.2,
        linear_cde=(1.0, 0.0, 0.0),
    )


@pytest.mark.parametrize(
    "reference",
    [FThetaPolynomialType.ANGLE_TO_PIXELDIST, FThetaPolynomialType.PIXELDIST_TO_ANGLE],
)
def test_roundtrip_ftheta(reference):
    _, pp = _intrinsics()
    cam = make_camera(
        "ftheta", W, H, principal_points=pp, ftheta_coeffs=_ftheta_params(reference)
    )
    rays = _rays()
    pt, valid = camera_ray_to_image_point(cam, rays, margin_factor=0.0)
    ray2, conv = image_point_to_camera_ray(cam, pt)
    unit = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    mask = np.asarray(valid & conv)
    assert mask.sum() > 40
    np.testing.assert_allclose(
        np.asarray(ray2)[mask], np.asarray(unit)[mask], atol=2e-3
    )


def test_behind_camera_invalid():
    fl, pp = _intrinsics(C=1)
    cam = make_camera("pinhole", W, H, fl, pp)
    rays = jnp.asarray([[[0.1, 0.1, -1.0], [0.0, 0.0, 1.0]]])
    pt, valid = camera_ray_to_image_point(cam, rays, margin_factor=0.0)
    assert not bool(valid[0, 0]) and bool(valid[0, 1])
    np.testing.assert_array_equal(np.asarray(pt[0, 0]), 0.0)


def _poses(C=2, seed=1):
    rng = np.random.default_rng(seed)
    vm = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    ang = rng.uniform(-0.05, 0.05, C)
    for c in range(C):
        ca, sa = np.cos(ang[c]), np.sin(ang[c])
        vm[c, :3, :3] = [[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]]
        vm[c, :3, 3] = rng.uniform(-0.1, 0.1, 3)
    return jnp.asarray(vm)


def test_rolling_shutter_identity_pose_matches_global():
    fl, pp = _intrinsics()
    vm = _poses()
    pose = viewmat_to_pose(vm)
    pts = _rays() + jnp.asarray([0.0, 0.0, 3.0])

    cam_g = make_camera("pinhole", W, H, fl, pp)
    pt_g, val_g = world_point_to_image_point_shutter_pose(cam_g, pts, pose, pose, 0.1)

    cam_rs = make_camera(
        "pinhole", W, H, fl, pp,
        shutter_type=RollingShutterType.ROLLING_TOP_TO_BOTTOM,
    )
    pt_rs, val_rs = world_point_to_image_point_shutter_pose(cam_rs, pts, pose, pose, 0.1)
    np.testing.assert_allclose(np.asarray(pt_g), np.asarray(pt_rs), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(val_g), np.asarray(val_rs))


def test_rolling_shutter_moves_points():
    fl, pp = _intrinsics()
    vm0 = _poses(seed=2)
    vm1 = jnp.asarray(np.asarray(vm0) + 0.0)
    vm1 = vm1.at[:, 0, 3].add(0.2)  # camera translates between start/end
    p0, p1 = viewmat_to_pose(vm0), viewmat_to_pose(vm1)
    pts = _rays(seed=3) + jnp.asarray([0.0, 0.0, 3.0])
    cam = make_camera(
        "pinhole", W, H, fl, pp,
        shutter_type=RollingShutterType.ROLLING_TOP_TO_BOTTOM,
    )
    pt_rs, val = world_point_to_image_point_shutter_pose(cam, pts, p0, p1, 0.1)
    pt_start, _ = world_point_to_image_point_shutter_pose(
        make_camera("pinhole", W, H, fl, pp), pts, p0, p0, 0.1
    )
    m = np.asarray(val)
    # rows near the top stay near the start pose; in general points moved
    diff = np.abs(np.asarray(pt_rs) - np.asarray(pt_start))[m]
    assert diff.max() > 1.0


def test_image_point_to_world_ray_shutter_pose():
    fl, pp = _intrinsics()
    vm = _poses(seed=4)
    pose = viewmat_to_pose(vm)
    cam = make_camera("pinhole", W, H, fl, pp)
    pix = jnp.asarray(
        np.stack(
            np.meshgrid(np.linspace(10, W - 10, 8), np.linspace(10, H - 10, 6)),
            axis=-1,
        ).reshape(1, -1, 2).repeat(2, 0),
        jnp.float32,
    )
    org, dirn, valid = image_point_to_world_ray_shutter_pose(cam, pix, pose, pose)
    assert bool(valid.all())
    # push the rays back through the camera -> same pixels
    pts = org + 2.5 * dirn
    pt2, v2 = world_point_to_image_point_shutter_pose(cam, pts, pose, pose, 0.1)
    np.testing.assert_allclose(np.asarray(pt2), np.asarray(pix), atol=1e-2)


# ---------------------------------------------------------------------------
# UT projection
# ---------------------------------------------------------------------------


def _scene(N=128, seed=5):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2.0, 6.0, N)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = (rng.uniform(0.002, 0.01, (N, 3))).astype(np.float32)
    opac = rng.uniform(0.5, 1.0, N).astype(np.float32)
    return jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales), jnp.asarray(opac)


def _Ks(C=2):
    fl, pp = _intrinsics(C)
    K = jnp.zeros((C, 3, 3))
    K = K.at[:, 0, 0].set(fl[:, 0]).at[:, 1, 1].set(fl[:, 1])
    K = K.at[:, 0, 2].set(pp[:, 0]).at[:, 1, 2].set(pp[:, 1]).at[:, 2, 2].set(1.0)
    return K


def test_ut_pinhole_matches_ewa_for_small_gaussians():
    """For tiny gaussians, UT through a perfect pinhole ~= EWA linearization
    (the reference validates its UT kernel the same way for the linear
    regime, tests/test_basic.py UT suites)."""
    means, quats, scales, opac = _scene()
    vm = _poses(seed=6)
    Ks = _Ks()
    radii_u, m2d_u, dep_u, con_u, _ = fully_fused_projection_ut(
        means, quats, scales, opac, vm, Ks, W, H,
        ut_params=UnscentedTransformParameters(),
    )
    radii_e, m2d_e, dep_e, con_e, _ = fully_fused_projection(
        means, None, quats, scales, vm, Ks, W, H, opacities=opac
    )
    both = np.asarray((radii_u.max(-1) > 0) & (radii_e.max(-1) > 0))
    assert both.sum() > 100
    np.testing.assert_allclose(
        np.asarray(m2d_u)[both], np.asarray(m2d_e)[both], rtol=0, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(dep_u)[both], np.asarray(dep_e)[both], rtol=1e-5, atol=1e-5
    )
    # conics agree to a few percent in the near-linear regime
    cu, ce = np.asarray(con_u)[both], np.asarray(con_e)[both]
    scale = np.abs(ce).max(-1, keepdims=True)
    np.testing.assert_allclose(cu / scale, ce / scale, atol=0.08)


def test_ut_culls_behind_camera():
    means, quats, scales, opac = _scene()
    means = means.at[:, 2].set(-5.0)
    vm = _poses(seed=7)
    radii, *_ = fully_fused_projection_ut(
        means, quats, scales, opac, vm, _Ks(), W, H
    )
    assert int(radii.max()) == 0


def test_ut_grads_finite():
    means, quats, scales, opac = _scene(N=32)
    vm = _poses(seed=8)
    Ks = _Ks()

    def loss(m, q, s, o):
        _, m2d, dep, con, _ = fully_fused_projection_ut(
            m, q, s, o, vm, Ks, W, H,
            camera_model="fisheye",
            radial_coeffs=jnp.asarray([[0.01, 0.0, 0.0, 0.0]] * 2),
        )
        return (m2d**2).mean() + dep.mean() + (con**2).mean()

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(means, quats, scales, opac)
    for gi in g:
        assert bool(jnp.isfinite(gi).all())


def test_ut_rolling_shutter_runs():
    means, quats, scales, opac = _scene(N=64)
    vm0 = _poses(seed=9)
    vm1 = vm0.at[:, 0, 3].add(0.05)
    radii, m2d, dep, con, comp = fully_fused_projection_ut(
        means, quats, scales, opac, vm0, _Ks(), W, H,
        rolling_shutter=RollingShutterType.ROLLING_TOP_TO_BOTTOM,
        viewmats_rs=vm1,
        calc_compensations=True,
    )
    assert int((radii.max(-1) > 0).sum()) > 30
    assert bool(jnp.isfinite(m2d).all() & jnp.isfinite(con).all())


def test_rasterization_with_ut_end_to_end():
    """rasterization(with_ut=True) with fisheye distortion renders and is
    close to the plain pinhole render when distortion is zero."""
    from gsplat_tpu.rendering import rasterization

    means, quats, scales, opac = _scene(N=256, seed=11)
    colors = jnp.asarray(
        np.random.default_rng(12).uniform(0, 1, (256, 3)).astype(np.float32)
    )
    vm = _poses(seed=13)
    Ks = _Ks()
    w, h = 64, 48
    Ks = Ks.at[:, 0, 0].set(40.0).at[:, 1, 1].set(40.0)
    Ks = Ks.at[:, 0, 2].set(w / 2).at[:, 1, 2].set(h / 2)

    img_ut, alpha_ut, meta = rasterization(
        means, quats, scales, opac, colors, vm, Ks, w, h,
        with_ut=True,
        radial_coeffs=jnp.zeros((2, 6)),
    )
    img_pin, alpha_pin, _ = rasterization(
        means, quats, scales, opac, colors, vm, Ks, w, h
    )
    assert img_ut.shape == (2, h, w, 3)
    assert bool(jnp.isfinite(img_ut).all())
    # zero distortion => UT ~= EWA linearization for small gaussians
    diff = np.abs(np.asarray(img_ut) - np.asarray(img_pin))
    # UT and EWA differ slightly in radii/culling; require agreement in
    # the bulk, not per-pixel identity.
    assert np.quantile(diff, 0.95) < 0.05, np.quantile(diff, 0.95)
    assert diff.mean() < 0.01, diff.mean()


def test_external_windshield_distortion():
    """Bivariate windshield warp: identity polys are a no-op; a real warp
    roundtrips through its inverse; UT projection accepts the model."""
    from gsplat_tpu.sensors.external import (
        BivariateWindshieldModelParameters,
        apply_external_distortion,
        eval_bivariate_poly,
        pad_coefficients_to_max_order,
    )

    rng = np.random.default_rng(17)
    rays = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    rays = rays.at[:, 2].set(jnp.abs(rays[:, 2]) + 0.3)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)

    ident = BivariateWindshieldModelParameters.identity()
    out = apply_external_distortion(ident, rays)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rays), atol=1e-5)

    # mild warp: P_h = 1.02 phi + 0.01 theta; inverse ~= (phi - .01 theta)/1.02
    warp = BivariateWindshieldModelParameters(
        horizontal_poly=(0.0, 1.02, 0.01),
        vertical_poly=(0.0, 0.0, 1.0),
        horizontal_poly_inverse=(0.0, 1.0 / 1.02, -0.01 / 1.02),
        vertical_poly_inverse=(0.0, 0.0, 1.0),
    )
    warped = apply_external_distortion(warp, rays)
    assert float(jnp.abs(warped - rays).max()) > 1e-3  # actually warps
    back = apply_external_distortion(warp, warped, inverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rays), atol=2e-3)

    # triangular padding layout: order-2 poly evaluates exactly
    c = pad_coefficients_to_max_order([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    # P(x,y) = 1 + 2x + 3x^2 + y(4 + 5x) + 6y^2
    v = float(eval_bivariate_poly(jnp.asarray(c), jnp.asarray(0.5), jnp.asarray(0.25)))
    expect = 1 + 2*0.5 + 3*0.25 + 0.25*(4 + 5*0.5) + 6*0.0625
    assert abs(v - expect) < 1e-6, (v, expect)

    # end-to-end: UT projection with the windshield warp runs + differs
    # from the unwarped projection
    means, quats, scales, opac = _scene(N=64, seed=18)
    vm = _poses(seed=19)
    radii_w, m2_w, *_ = fully_fused_projection_ut(
        means, quats, scales, opac, vm, _Ks(), W, H,
        external_distortion=warp,
    )
    radii_0, m2_0, *_ = fully_fused_projection_ut(
        means, quats, scales, opac, vm, _Ks(), W, H,
    )
    both = np.asarray((radii_w.max(-1) > 0) & (radii_0.max(-1) > 0))
    assert both.sum() > 20
    d = np.abs(np.asarray(m2_w) - np.asarray(m2_0))[both]
    assert d.max() > 0.5  # the warp visibly moves projections
