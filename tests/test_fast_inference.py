"""Inference fast path: bf16-packed rasterizer vs the exact pipeline.

Model: reference inference-kernel tests compare the no-grad macro-tile
renderer against the training rasterizer at loose tolerance (bf16
compositing); here the packed path must match the exact path within its
~2**-9 error class and be bit-stable across calls.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsplat_tpu.ops import fully_fused_projection
from gsplat_tpu.ops.rasterize import (
    rasterize_to_pixels,
    rasterize_to_pixels_fast,
)
from gsplat_tpu.ops.mxu import pack_bf16_pair, unpack_bf16_pair


def _scene(n=500, seed=0, W=96, H=64, I=2):
    rng = np.random.default_rng(seed)
    means2d = rng.uniform(-8, [W + 8, H + 8], (I, n, 2)).astype(np.float32)
    # positive-definite conics with mixed sharpness
    a = rng.uniform(0.01, 1.0, (I, n)).astype(np.float32)
    c = rng.uniform(0.01, 1.0, (I, n)).astype(np.float32)
    b = (rng.uniform(-0.9, 0.9, (I, n)) * np.sqrt(a * c)).astype(np.float32)
    conics = np.stack([a, b, c], -1)
    colors = rng.uniform(0, 1, (I, n, 3)).astype(np.float32)
    opac = rng.uniform(0.05, 0.95, (I, n)).astype(np.float32)
    depths = rng.uniform(0.5, 10, (I, n)).astype(np.float32)
    radii = np.full((I, n, 2), 6, np.int32)
    return tuple(map(jnp.asarray, (means2d, conics, colors, opac, depths, radii)))


def test_pack_roundtrip_error_class():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32) * 100)
    y = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32) * 0.01)
    a, b = unpack_bf16_pair(pack_bf16_pair(x, y))
    assert float(jnp.max(jnp.abs(a - x) / jnp.maximum(jnp.abs(x), 1e-6))) < 2**-8
    assert float(jnp.max(jnp.abs(b - y) / jnp.maximum(jnp.abs(y), 1e-6))) < 2**-8
    # zero bits unpack to exact zeros (the kernels' lane-mask contract)
    z = unpack_bf16_pair(jnp.zeros((1, 128), jnp.float32))
    assert float(jnp.abs(z[0]).max()) == 0.0 and float(jnp.abs(z[1]).max()) == 0.0


@pytest.mark.parametrize("D", [3, 4])
def test_fast_matches_exact_within_bf16_class(D):
    W, H = 96, 64
    m2, cn, cl, op, dep, rad = _scene(W=W, H=H)
    if D != 3:
        cl = jnp.concatenate([cl, cl[..., :1]], axis=-1)
    exact, a_exact, _ = rasterize_to_pixels(
        m2, cn, cl, op, W, H, rad, dep, isect_capacity=300_000
    )
    fast, a_fast, aux = rasterize_to_pixels_fast(
        m2, cn, cl, op, W, H, rad, dep, isect_capacity=300_000
    )
    assert not bool(aux["isect_overflow"])
    # bf16-grade agreement: sub-1% mean, few-percent max (gate flips at
    # alpha/transmittance thresholds move single splat tails)
    diff = np.abs(np.asarray(exact) - np.asarray(fast))
    assert diff.mean() < 5e-3, diff.mean()
    assert np.quantile(diff, 0.999) < 0.05, np.quantile(diff, 0.999)
    adiff = np.abs(np.asarray(a_exact) - np.asarray(a_fast))
    assert adiff.mean() < 5e-3


def test_fast_background_and_empty():
    W, H = 48, 32
    m2, cn, cl, op, dep, rad = _scene(n=50, W=W, H=H, I=1)
    bg = jnp.asarray(np.array([[0.2, 0.4, 0.6]], np.float32))
    out, alpha, _ = rasterize_to_pixels_fast(
        m2, cn, cl, op, W, H, rad, dep, isect_capacity=60_000,
        backgrounds=bg,
    )
    assert out.shape == (1, H, W, 3)
    # cull everything -> pure background, zero alpha
    out0, alpha0, _ = rasterize_to_pixels_fast(
        m2, cn, cl, op, W, H, jnp.zeros_like(rad), dep,
        isect_capacity=60_000, backgrounds=bg,
    )
    np.testing.assert_allclose(
        np.asarray(out0), np.broadcast_to(np.asarray(bg)[:, None, None, :],
                                          (1, H, W, 3)), atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(alpha0), 0.0, atol=1e-6)


def test_fast_deterministic():
    W, H = 48, 32
    m2, cn, cl, op, dep, rad = _scene(n=100, W=W, H=H, I=1, seed=7)
    r1 = rasterize_to_pixels_fast(m2, cn, cl, op, W, H, rad, dep,
                                  isect_capacity=60_000)[0]
    r2 = rasterize_to_pixels_fast(m2, cn, cl, op, W, H, rad, dep,
                                  isect_capacity=60_000)[0]
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_rasterization_fast_end_to_end():
    """Full orchestrator with fast=True vs exact, through projection + SH."""
    from gsplat_tpu.rendering import rasterization
    from gsplat_tpu.utils.data import load_test_data

    means, quats, scales, opac, colors, viewmats, Ks, W, H = load_test_data()
    f = 8
    Ks = Ks.copy()
    Ks[:, :2, :] /= f
    W, H = W // f, H // f
    i = np.arange(0, len(means), 40)
    args = (
        jnp.asarray(means[i]), jnp.asarray(quats[i]),
        jnp.asarray(scales[i]), jnp.asarray(opac[i]),
        jnp.asarray(colors[i])[None].repeat(1, 0),
        jnp.asarray(viewmats[:1]), jnp.asarray(Ks[:1]), W, H,
    )
    kw = dict(isect_capacity=500_000)
    exact, ae, _ = rasterization(*args, **kw)
    fast, af, meta = rasterization(*args, fast=True, **kw)
    assert meta["isect_overflow"] == False  # noqa: E712
    d = np.abs(np.asarray(exact) - np.asarray(fast))
    assert d.mean() < 2e-3, d.mean()
    assert np.quantile(d, 0.999) < 0.03


def test_render_scene_fast_default():
    from gsplat_tpu.scene import GaussianInferenceScene, render_scene
    from gsplat_tpu.utils.data import load_test_data

    means, quats, scales, opac, colors, viewmats, Ks, W, H = load_test_data()
    f = 8
    Ks = Ks.copy()
    Ks[:, :2, :] /= f
    W, H = W // f, H // f
    i = np.arange(0, len(means), 60)
    qn = quats[i] / np.linalg.norm(quats[i], axis=-1, keepdims=True)
    scene = GaussianInferenceScene.from_gaussian_tensors(
        jnp.asarray(means[i]), jnp.asarray(qn), jnp.asarray(scales[i]),
        jnp.asarray(opac[i]), jnp.asarray(colors[i]),
        sh_degree=None, id="t",
    )
    out_f, _, meta_f = render_scene(
        scene, viewmat=jnp.asarray(viewmats[0]), K=jnp.asarray(Ks[0]),
        width=W, height=H, isect_capacity=300_000,
    )
    out_e, _, _ = render_scene(
        scene, viewmat=jnp.asarray(viewmats[0]), K=jnp.asarray(Ks[0]),
        width=W, height=H, isect_capacity=300_000, fast=False,
    )
    assert meta_f["render_path"] == "inference"
    d = np.abs(np.asarray(out_f) - np.asarray(out_e))
    assert d.mean() < 2e-3
