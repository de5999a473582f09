"""eval3d Pallas rasterizer vs the jnp oracle: forward + gradient parity.

Runs in Pallas interpret mode on CPU (kernels detect the backend); same
assertions pass on TPU with GSPLAT_TPU_TEST_PLATFORM=tpu.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.isect import isect_offset_encode, isect_tiles
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.rasterize_eval3d import rasterize_to_pixels_eval3d
from gsplat_tpu.ops.rasterize_eval3d_ref import rasterize_to_pixels_eval3d_ref
from gsplat_tpu.sensors import generate_rays, make_camera

W, H, TS = 40, 35, 16


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    I, N, D = 2, 120, 3
    tw, th = -(-W // TS), -(-H // TS)

    means = rng.uniform(-1.2, 1.2, (N, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2.0, 6.0, N)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.25, (N, 3)).astype(np.float32)
    opacities = np.clip(rng.random((I, N)) * 1.2, 0, 1).astype(np.float32)
    colors = rng.random((I, N, D)).astype(np.float32)

    viewmats = np.tile(np.eye(4, dtype=np.float32), (I, 1, 1))
    viewmats[1, :3, 3] = [0.05, -0.03, 0.1]
    Ks = np.zeros((I, 3, 3), np.float32)
    Ks[:, 0, 0] = Ks[:, 1, 1] = 30.0
    Ks[:, 0, 2], Ks[:, 1, 2], Ks[:, 2, 2] = W / 2, H / 2, 1.0

    viewmats = jnp.asarray(viewmats)
    Ks = jnp.asarray(Ks)
    means, quats, scales = map(jnp.asarray, (means, quats, scales))
    opacities, colors = jnp.asarray(opacities), jnp.asarray(colors)

    # projection used only for tiling/sorting
    radii, means2d, depths, _conics, _ = fully_fused_projection(
        means, None, quats, scales, viewmats, Ks, W, H,
        opacities=opacities[0],
    )

    cam = make_camera(
        "pinhole", W, H,
        focal_lengths=jnp.stack([Ks[:, 0, 0], Ks[:, 1, 1]], -1),
        principal_points=Ks[:, :2, 2],
    )
    rays = generate_rays(cam, W, H, viewmats)  # [I, H, W, 6]

    isect = isect_tiles(means2d, radii, depths, TS, tw, th, capacity=4096)
    offsets = isect_offset_encode(isect.tile_keys, I, tw, th)
    return dict(
        means=means, quats=quats, scales=scales, colors=colors,
        opacities=opacities, rays=rays, radii=radii, depths=depths,
        means2d=means2d, isect=isect, offsets=offsets, tw=tw, th=th,
    )


def _ref(s, means, quats, scales, colors, opacities, **kw):
    return rasterize_to_pixels_eval3d_ref(
        means, quats, scales, colors, opacities, s["rays"], W, H, TS,
        s["offsets"], s["isect"].flatten_ids, s["isect"].n_isects,
        max_range=512, **kw,
    )


def _pal(s, means, quats, scales, colors, opacities, **kw):
    return rasterize_to_pixels_eval3d(
        means, quats, scales, colors, opacities, s["rays"], W, H,
        s["radii"], s["depths"], s["means2d"], 4096, **kw,
    )


def test_forward_matches_oracle(scene):
    s = scene
    args = (s["means"], s["quats"], s["scales"], s["colors"], s["opacities"])
    rc, ra, _ = _ref(s, *args)
    pc, pa, _, aux = _pal(s, *args)
    assert not bool(aux["isect_overflow"])
    assert float(jnp.abs(rc).max()) > 0.05  # scene actually renders
    np.testing.assert_allclose(np.asarray(pc), np.asarray(rc), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(ra), atol=2e-5)


def test_forward_hit_distance_and_normals(scene):
    s = scene
    args = (s["means"], s["quats"], s["scales"], s["colors"], s["opacities"])
    rc, ra, rn = _ref(s, *args, use_hit_distance=True, return_normals=True)
    pc, pa, pn, _ = _pal(s, *args, use_hit_distance=True, return_normals=True)
    assert float(jnp.abs(rc[..., -1]).max()) > 0.1  # hit distances present
    np.testing.assert_allclose(np.asarray(pc), np.asarray(rc), atol=5e-5)
    np.testing.assert_allclose(np.asarray(pn), np.asarray(rn), atol=2e-5)


def test_gradients_match_oracle_autodiff(scene):
    s = scene
    tgt = jnp.asarray(
        np.random.default_rng(4).random((2, H, W, 3)).astype(np.float32)
    )
    args = (s["means"], s["quats"], s["scales"], s["colors"], s["opacities"])

    def loss_ref(*a):
        c, al, _ = _ref(s, *a)
        return jnp.sum((c - tgt) ** 2) + 0.3 * jnp.sum(al)

    def loss_pal(*a):
        c, al, _, _ = _pal(s, *a)
        return jnp.sum((c - tgt) ** 2) + 0.3 * jnp.sum(al)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(*args)
    for gr, gp in zip(g_ref, g_pal):
        scale = max(float(jnp.abs(gr).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=4e-4 * scale
        )


def test_gradients_hit_distance(scene):
    s = scene
    args = (s["means"], s["quats"], s["scales"], s["colors"], s["opacities"])

    def loss_ref(*a):
        c, al, _ = _ref(s, *a, use_hit_distance=True)
        return jnp.sum(c[..., -1] ** 2) + jnp.sum(c[..., :-1])

    def loss_pal(*a):
        c, al, _, _ = _pal(s, *a, use_hit_distance=True)
        return jnp.sum(c[..., -1] ** 2) + jnp.sum(c[..., :-1])

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(*args)
    for gr, gp in zip(g_ref, g_pal):
        scale = max(float(jnp.abs(gr).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=5e-4 * scale
        )


def test_ray_gradients(scene):
    """Per-ray gradients (SURVEY N18: per-ray inputs w/ gradients)."""
    s = scene
    args = (s["means"], s["quats"], s["scales"], s["colors"], s["opacities"])

    def loss_ref(r):
        c, al, _ = rasterize_to_pixels_eval3d_ref(
            *args, r, W, H, TS, s["offsets"], s["isect"].flatten_ids,
            s["isect"].n_isects, max_range=512,
        )
        return jnp.sum(c**2)

    def loss_pal(r):
        c, al, _, _ = rasterize_to_pixels_eval3d(
            *args, r, W, H, s["radii"], s["depths"], s["means2d"], 4096,
        )
        return jnp.sum(c**2)

    g_ref = jax.grad(loss_ref)(s["rays"])
    g_pal = jax.grad(loss_pal)(s["rays"])
    scale = max(float(jnp.abs(g_ref).max()), 1.0)
    assert float(jnp.abs(g_ref).max()) > 1e-4  # nontrivial
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=4e-4 * scale
    )


def test_rasterization_eval3d_end_to_end():
    """rasterization(with_ut=True, with_eval3d=True) on a fisheye camera:
    hit-distance modes, normals, gradients."""
    from gsplat_tpu.rendering import rasterization

    rng = np.random.default_rng(7)
    N = 160
    means = jnp.asarray(
        np.c_[rng.uniform(-1, 1, (N, 2)), rng.uniform(2, 5, N)].astype(np.float32)
    )
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.05, 0.2, (N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.4, 1, N).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    vm = jnp.eye(4)[None]
    Ks = jnp.asarray([[[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]]])
    rad = jnp.asarray([[0.03, 0.0, 0.0, 0.0]])

    def render(m, s, mode):
        return rasterization(
            m, quats, s, opac, colors, vm, Ks, W, H,
            with_ut=True, with_eval3d=True, camera_model="fisheye",
            radial_coeffs=rad, render_mode=mode, return_normals=True,
        )

    img, alpha, meta = render(means, scales, "RGB-Ed")
    assert img.shape == (1, H, W, 4)
    assert meta["render_normals"].shape == (1, H, W, 3)
    assert bool(jnp.isfinite(img).all())
    assert float(alpha.max()) > 0.5
    # expected hit distance should be in the scene depth range where opaque
    hd = np.asarray(img[0, ..., -1])
    a = np.asarray(alpha[0, ..., 0])
    assert hd[a > 0.9].mean() > 1.0

    def loss(m, s):
        img, alpha, _ = render(m, s, "RGB-d")
        return (img**2).mean() + alpha.mean()

    g = jax.grad(loss, argnums=(0, 1))(means, scales)
    for gi in g:
        assert bool(jnp.isfinite(gi).all())
        assert float(jnp.abs(gi).sum()) > 0
