"""Scene/Stage, color correction, init utils, relocation export."""

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.color_correct import color_correct_affine, color_correct_quadratic
from gsplat_tpu.init_utils import knn_scale_init, multi_frame_depth_unprojection
from gsplat_tpu.scene import GaussianScene, Stage


def test_scene_stage_render():
    splats = {"means": jnp.zeros((10, 3)), "opacities": jnp.ones(10)}
    scene = GaussianScene("garden", splats, alive=jnp.ones(10, bool))
    assert scene.num_gaussians == 10
    scene.put("extra", 42)
    assert scene.get("extra") == 42

    stage = Stage()
    calls = {}

    def render_fn(splats, alive, camera=None):
        calls["splats"] = splats
        calls["camera"] = camera
        return "img"

    stage.add_scene(scene, render_fn)
    out = stage.render("garden", camera="cam0")
    assert out == "img"
    assert calls["camera"] == "cam0"
    assert calls["splats"] is splats


def test_color_correct_affine_recovers_transform():
    rng = np.random.default_rng(0)
    ref = rng.random((32, 32, 3)).astype(np.float32) * 0.8 + 0.1
    img = np.clip(ref * 0.7 + 0.1, 0, 1)  # affine distorted
    out = np.asarray(color_correct_affine(jnp.asarray(img), jnp.asarray(ref)))
    assert np.abs(out - ref).mean() < 0.01


def test_color_correct_quadratic_improves_match():
    rng = np.random.default_rng(1)
    ref = rng.random((24, 24, 3)).astype(np.float32) * 0.8 + 0.1
    img = np.clip(ref**1.5 * 0.8 + 0.05, 0, 1)
    out = np.asarray(
        color_correct_quadratic(jnp.asarray(img), jnp.asarray(ref))
    )
    before = np.abs(img - ref).mean()
    after = np.abs(out - ref).mean()
    assert after < before * 0.5


def test_depth_unprojection_roundtrip():
    h, w = 16, 20
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [1, 2, 3]
    depth = np.full((1, h, w), 2.0, np.float32)
    img = np.zeros((1, h, w, 3), np.float32) + 0.5
    mask = np.ones((1, h, w), np.float32)
    xyz, rgb = multi_frame_depth_unprojection(
        img, depth, mask, pose[None], K[None]
    )
    assert xyz.shape == (h * w, 3)
    # center pixel unprojects along +z through the pose translation
    cidx = (h // 2) * w + w // 2
    np.testing.assert_allclose(xyz[cidx], [1, 2, 5], atol=0.1)
    assert (rgb == 0.5).all()


def test_knn_scale_init():
    rng = np.random.default_rng(2)
    pts = rng.random((100, 3)).astype(np.float32)
    s = knn_scale_init(pts)
    assert s.shape == (100, 3)
    assert np.isfinite(s).all()
