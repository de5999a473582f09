"""Scene/Stage, color correction, init utils, relocation export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_gaussian_inference_scene_roundtrip():
    """Packing + inference render: matches the training-path render within
    bf16 attribute quantization."""
    import numpy as np
    import pytest
    from gsplat_tpu.rendering import rasterization
    from gsplat_tpu.scene import (
        GaussianInferenceScene,
        GaussianScene,
        render_scene,
    )

    rng = np.random.default_rng(3)
    N = 128
    means = np.c_[rng.uniform(-1, 1, (N, 2)), rng.uniform(2, 6, N)].astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    log_scales = np.log(rng.uniform(0.02, 0.1, (N, 3))).astype(np.float32)
    opac_logits = rng.normal(size=N).astype(np.float32)
    sh0 = rng.uniform(-0.5, 0.5, (N, 1, 3)).astype(np.float32)
    shN = (0.01 * rng.normal(size=(N, 3, 3))).astype(np.float32)

    scene = GaussianScene(
        "train",
        dict(
            means=jnp.asarray(means), quats=jnp.asarray(quats),
            scales=jnp.asarray(log_scales), opacities=jnp.asarray(opac_logits),
            sh0=jnp.asarray(sh0), shN=jnp.asarray(shN),
        ),
    )
    inf = GaussianInferenceScene.from_gaussian_scene(
        scene, id="inf", sh_compression="16b"
    )
    assert inf.sh_degree == 1 and inf.num_gaussians == N

    vm = jnp.eye(4)[None]
    K = jnp.asarray([[[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]])
    img, alpha, meta = render_scene(inf, viewmat=vm, K=K, width=64, height=48)
    assert meta["render_path"] == "inference"
    assert img.shape == (1, 48, 64, 3)

    qn = quats / np.linalg.norm(quats, axis=-1, keepdims=True)
    ref, ref_a, _ = rasterization(
        jnp.asarray(means), jnp.asarray(qn), jnp.exp(jnp.asarray(log_scales)),
        jax.nn.sigmoid(jnp.asarray(opac_logits)),
        jnp.concatenate([jnp.asarray(sh0), jnp.asarray(shN)], axis=1),
        vm, K, 64, 48, sh_degree=1,
    )
    diff = np.abs(np.asarray(img) - np.asarray(ref))
    assert np.quantile(diff, 0.99) < 0.03, np.quantile(diff, 0.99)

    # release drops storage; rendering a released scene fails
    inf.release()
    assert inf.is_empty
    with pytest.raises(AssertionError):
        render_scene(inf, viewmat=vm, K=K, width=8, height=8)

    # contract checks fire
    with pytest.raises(ValueError):
        GaussianInferenceScene.from_gaussian_tensors(
            means, qn, -np.ones((N, 3), np.float32),
            np.clip(opac_logits, 0, 1), sh0[:, 0], None, id="bad",
        )


def test_lpips_proxy_perceptual_ordering():
    """Self-contained perceptual metric: zero at identity, monotone with
    distortion strength, and sensitive to structure (blur) beyond what
    a pixel metric at matched MSE would be."""
    import jax.numpy as jnp
    import numpy as np

    from gsplat_tpu.training import lpips_proxy

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        np.clip(
            rng.random((1, 64, 64, 3)) * 0.5
            + np.linspace(0, 0.5, 64)[None, :, None, None],
            0, 1,
        ).astype(np.float32)
    )
    # batched input -> per-image [B] array (lpips contract)
    assert lpips_proxy(img, img).shape == (1,)
    assert float(lpips_proxy(img, img)[0]) == 0.0
    # unbatched input -> scalar
    assert lpips_proxy(img[0], img[0]).shape == ()
    d_small = float(lpips_proxy(img, jnp.clip(img + 0.02, 0, 1))[0])
    d_big = float(lpips_proxy(img, jnp.clip(img + 0.15, 0, 1))[0])
    assert 0.0 < d_small < d_big
    # deterministic across calls (fixed-seed weights)
    assert d_small == float(lpips_proxy(img, jnp.clip(img + 0.02, 0, 1))[0])
    # per-image values are independent of batch composition
    two = jnp.concatenate([img, jnp.clip(img + 0.15, 0, 1)], axis=0)
    per = lpips_proxy(two, jnp.concatenate([img, img], axis=0))
    np.testing.assert_allclose(float(per[0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(per[1]), d_big, rtol=1e-5)


def test_ppisp_identity_and_stages():
    """Learned ISP: identity at init, physically-sensible stages,
    gradients to every parameter group (PPISP analog — reference
    simple_trainer.py post_processing='ppisp')."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsplat_tpu.training import (
        apply_ppisp,
        init_ppisp,
        ppisp_regularization,
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0.05, 0.9, (2, 24, 32, 3)).astype(np.float32))
    cam = jnp.asarray([0, 1])
    frm = jnp.asarray([0, 3])
    p = init_ppisp(num_cameras=2, num_frames=4)

    out = apply_ppisp(p, img, cam, frm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    assert float(ppisp_regularization(p)) == 0.0

    # exposure: +log(2) on frame 3 doubles only the second image
    p2 = dict(p)
    p2["exposure"] = p["exposure"].at[3].set(np.log(2.0))
    out2 = apply_ppisp(p2, img, cam, frm)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(img[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2[1]), 2 * np.asarray(img[1]), rtol=1e-4)

    # vignetting: corners darker than center for v1 > 0
    p3 = dict(p)
    p3["vignette"] = p["vignette"].at[0, 0].set(0.5)
    out3 = apply_ppisp(p3, img, cam, frm)
    ratio = np.asarray(out3[0] / jnp.maximum(img[0], 1e-6))
    assert ratio[0, 0].mean() < ratio[12, 16].mean()

    # gradients reach every parameter group
    def loss(pp):
        return jnp.sum(apply_ppisp(pp, img, cam, frm) ** 2)

    g = jax.grad(loss)(p)
    for k, v in g.items():
        assert float(jnp.abs(v).sum()) > 0, k

    # single-image convenience shape
    one = apply_ppisp(p, img[0], 0, 0)
    assert one.shape == img[0].shape
