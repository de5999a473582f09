"""Loss parity tests vs torch reference formulas (torch CPU available)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gsplat_tpu import losses


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    a = rng.random((2, 37, 45, 3)).astype(np.float32)
    b = rng.random((2, 37, 45, 3)).astype(np.float32)
    return a, b


def _torch_ssim(img1_np, img2_np, window_size=11):
    """Textbook SSIM (Wang et al. 2004) with a sigma-1.5 Gaussian window,
    matching the reference's torch_ssim_loss formulation."""
    img1 = torch.from_numpy(img1_np).permute(0, 3, 1, 2)
    img2 = torch.from_numpy(img2_np).permute(0, 3, 1, 2)
    C = img1.shape[1]
    xs = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(xs**2) / (2 * 1.5**2))
    g = (g / g.sum()).float()
    w2d = (g[:, None] @ g[None, :])[None, None].expand(C, 1, -1, -1)
    pad = window_size // 2
    mu1 = F.conv2d(img1, w2d, padding=pad, groups=C)
    mu2 = F.conv2d(img2, w2d, padding=pad, groups=C)
    s1 = F.conv2d(img1 * img1, w2d, padding=pad, groups=C) - mu1**2
    s2 = F.conv2d(img2 * img2, w2d, padding=pad, groups=C) - mu2**2
    s12 = F.conv2d(img1 * img2, w2d, padding=pad, groups=C) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
    )
    return m.mean().item()


def test_ssim_matches_torch(imgs):
    a, b = imgs
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim(a, b)
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_ssim_identical_images(imgs):
    a, _ = imgs
    assert abs(float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-6
    assert float(losses.ssim_loss(jnp.asarray(a), jnp.asarray(a))) < 1e-6


def test_ssim_bounded_on_clipped_inputs():
    """SSIM of [0,1]-clipped images must never exceed 1 + eps.

    Regression for the f32-cancellation bug: flat regions make the
    variance estimate slightly negative, collapsing the denominator
    (a committed stats file once reported SSIM=1.26 on a degenerate
    render).  Flat + near-flat images are the worst case."""
    rng = np.random.default_rng(7)
    flat = np.full((1, 64, 64, 3), 0.7, np.float32)
    near = flat + rng.normal(0, 1e-4, flat.shape).astype(np.float32)
    near = np.clip(near, 0.0, 1.0)
    for a, b in [(flat, flat), (flat, near), (near, near)]:
        v = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
        assert v <= 1.0 + 1e-6, v
        assert v >= -1.0 - 1e-6, v
    m = np.ones((1, 64, 64, 1), bool)
    v = float(losses.masked_ssim(jnp.asarray(flat), jnp.asarray(near), jnp.asarray(m)))
    assert v <= 1.0 + 1e-6, v


def test_l1_mse(imgs):
    a, b = imgs
    assert abs(
        float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b)))
        - np.abs(a - b).mean()
    ) < 1e-6
    assert abs(
        float(losses.mse_loss(jnp.asarray(a), jnp.asarray(b)))
        - ((a - b) ** 2).mean()
    ) < 1e-6


def test_depth_l1_disparity():
    pred = jnp.asarray([[2.0, 0.0], [4.0, 1.0]])
    gt = jnp.asarray([[1.0, 5.0], [4.0, 0.0]])
    # disparity space with zeros where depth <= 0
    exp = np.mean(np.abs(np.array([0.5 - 1.0, 0 - 0.2, 0.0, 1.0 - 0.0])))
    assert abs(float(losses.depth_l1_loss(pred, gt)) - exp) < 1e-6


def test_pearson_depth():
    rng = np.random.default_rng(1)
    d = rng.random((8, 8)).astype(np.float32)
    # perfectly correlated -> loss 0
    assert abs(float(losses.pearson_depth_loss(jnp.asarray(d), jnp.asarray(2 * d + 1)))) < 1e-5


def test_masked_l1(imgs):
    a, b = imgs
    mask = np.zeros((2, 37, 45, 1), np.float32)
    mask[:, :10] = 1.0
    ours = float(losses.masked_l1(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
    exp = np.abs(a[:, :10] - b[:, :10]).mean()
    assert abs(ours - exp) < 1e-6


def test_reducers():
    v = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    assert float(losses.reduce_mean(v)) == 2.5
    assert float(losses.reduce_sum(v)) == 10.0
    m = jnp.asarray([True, False, True, False])
    assert float(losses.reduce_mean(v, m)) == 2.0
    assert abs(float(losses.reduce_quantile(v, 0.5)) - 3.5) < 1e-6


def test_misc_losses(imgs):
    a, b = imgs
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    assert abs(
        float(losses.huber_loss(ja, jb, 0.1))
        - F.huber_loss(ta, tb, delta=0.1).item()
    ) < 1e-6
    assert abs(
        float(losses.smooth_l1_loss(ja, jb, 0.5))
        - F.smooth_l1_loss(ta, tb, beta=0.5).item()
    ) < 1e-6
    assert abs(
        float(losses.bce_loss(ja, jb)) - F.binary_cross_entropy(ta, tb).item()
    ) < 1e-5
    logits = jnp.asarray(a * 4 - 2)
    assert abs(
        float(losses.bce_with_logits_loss(logits, jb))
        - F.binary_cross_entropy_with_logits(torch.from_numpy(np.asarray(logits)), tb).item()
    ) < 1e-5
    assert float(losses.total_variation_loss(ja)) > 0


def test_lidar_losses():
    import numpy as np
    from gsplat_tpu.losses import (
        lidar_background_loss,
        lidar_distance_loss,
        lidar_intensity_loss,
        lidar_raydrop_loss,
        fused_gaussian_losses,
    )

    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(1, 10, 64).astype(np.float32))
    gt = pred + 0.5
    mask = jnp.asarray(rng.random(64) > 0.3)
    # l1 distance with mask == weighted mean of |diff| over mask
    v = float(lidar_distance_loss(pred, gt, mask))
    assert abs(v - 0.5) < 1e-5
    assert float(lidar_distance_loss(pred, gt, mask, loss_fn="mse")) > 0

    inten = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
    assert float(lidar_intensity_loss(inten, inten)) == 0.0

    logits = jnp.asarray(rng.normal(size=64).astype(np.float32))
    labels = jnp.asarray((rng.random(64) > 0.5).astype(np.float32))
    assert float(lidar_raydrop_loss(logits, labels)) > 0

    opac = jnp.asarray(rng.uniform(0.01, 0.99, 64).astype(np.float32))
    bg = jnp.asarray(rng.random(64) > 0.5)
    assert float(lidar_background_loss(opac, bg, loss_fn="bce_clipped")) > 0

    ls, ld, lz, lo = fused_gaussian_losses(
        jnp.abs(jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))),
        jnp.asarray(rng.uniform(0, 1, 16).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, 16).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32)),
        jnp.full((16, 3), 2.0),
        z_scale_threshold=0.5,
    )
    assert ls.shape == (16, 3) and ld.shape == (16,) and lo.shape == (16, 3)


def test_misc_losses():
    import numpy as np
    from gsplat_tpu.losses import (
        LinearLambdaScheduler,
        binocular_disparity_l1,
        identity_distance,
        relu_sum,
        total_variation_temporal,
        weights_reg,
    )

    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.uniform(1, 5, (8, 8)).astype(np.float32))
    assert float(binocular_disparity_l1(d, d)) == 0.0
    d2 = d.at[0, 0].set(0.0)  # invalid pixel contributes 0
    assert float(binocular_disparity_l1(d2, d)) < 1e-6

    assert float(relu_sum(jnp.asarray([0.1, 0.5]), 0.2)) == pytest.approx(0.3)
    assert float(weights_reg([jnp.ones((2, 3)), jnp.ones((1, 4))])) > 0

    grid = jnp.tile(jnp.eye(3, 4).reshape(1, 12, 1, 1), (2, 1, 4, 4))
    np.testing.assert_allclose(np.asarray(identity_distance(grid)), 0.0, atol=1e-6)

    x = jnp.asarray(rng.normal(size=(3, 2, 2, 2, 2)).astype(np.float32))
    tv = total_variation_temporal(x, jnp.ones(2))
    assert tv.shape == (2,) and float(tv.min()) > 0

    sched = LinearLambdaScheduler(0.0, 1.0, 10, 20)
    assert float(sched(5)) == 0.0
    assert float(sched(15)) == pytest.approx(0.5)
    assert float(sched(30)) == 1.0
