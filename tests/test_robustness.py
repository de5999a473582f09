"""NaN/degeneracy robustness + channel sweep through the Pallas path.

Ports the reference's degeneracy suites (tests/test_basic.py:6564-7370:
zero quaternions, zero scales, behind-camera gaussians, opacity saturation,
empty inputs) and the NUM_CHANNELS sweep (pytest.ini pins
1,3,4,6,8,21,23,24,32,128; here a representative subset runs the real
kernel path vs the jnp oracle).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.isect import isect_offset_encode, isect_tiles
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.rasterize import rasterize_to_pixels
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref
from gsplat_tpu.rendering import rasterization

W, H, TS = 48, 32, 16


def _cam(c=1):
    viewmats = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
    Ks = np.tile(
        np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32),
        (c, 1, 1),
    )
    return jnp.asarray(viewmats), jnp.asarray(Ks)


def _scene(n=64, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2, 6, n)
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    scales = (rng.random((n, 3)) * 0.2 + 0.02).astype(np.float32)
    opac = rng.random(n).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors))


def _render_and_grads(means, quats, scales, opac, colors):
    vm, Ks = _cam()
    cfull = jnp.broadcast_to(colors[None], (1,) + colors.shape)

    def loss(m, q, s, o, c):
        out, a, _ = rasterization(
            m, q, s, o, c, vm, Ks, W, H, isect_capacity=65536
        )
        return jnp.sum(out) + jnp.sum(a), (out, a)

    (val, (out, a)), grads = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3, 4), has_aux=True
    )(means, quats, scales, opac, cfull)
    return out, a, grads


def test_zero_quaternions_no_nan():
    """Zero quats must not poison the render (parity: test_basic.py zero-
    quaternion suite — reference normalizes with an eps guard)."""
    means, quats, scales, opac, colors = _scene()
    quats = quats.at[::3].set(0.0)
    out, a, grads = _render_and_grads(means, quats, scales, opac, colors)
    assert bool(jnp.isfinite(out).all()), "render has NaN"
    assert all(bool(jnp.isfinite(g).all()) for g in grads[2:]), "grads NaN"


def test_zero_scales_no_nan():
    means, quats, scales, opac, colors = _scene()
    scales = scales.at[::4].set(0.0)
    out, a, grads = _render_and_grads(means, quats, scales, opac, colors)
    assert bool(jnp.isfinite(out).all())


def test_behind_camera_culled():
    means, quats, scales, opac, colors = _scene()
    means = means.at[:, 2].set(-5.0)  # all behind the camera
    vm, Ks = _cam()
    cfull = jnp.broadcast_to(colors[None], (1,) + colors.shape)
    out, a, meta = rasterization(
        means, quats, scales, opac, cfull, vm, Ks, W, H, isect_capacity=4096
    )
    assert int(meta["n_isects"]) == 0
    assert float(jnp.abs(out).max()) == 0.0
    assert float(a.max()) == 0.0
    assert bool(jnp.isfinite(out).all())


def test_opacity_saturation_finite_grads():
    """Near-opaque gaussians saturate transmittance; the early-exit path
    and its gradients must stay finite (test_basic.py saturation suite)."""
    means, quats, scales, opac, colors = _scene(n=128, seed=3)
    opac = jnp.full_like(opac, 0.9999)
    scales = scales * 4.0
    out, a, grads = _render_and_grads(means, quats, scales, opac, colors)
    assert bool(jnp.isfinite(out).all())
    assert float(a.max()) <= 1.0 + 1e-5
    assert all(bool(jnp.isfinite(g).all()) for g in grads)


def test_below_threshold_opacity_no_isects():
    """alpha < 1/255 everywhere -> the tight plan emits nothing."""
    means, quats, scales, opac, colors = _scene()
    opac = jnp.full_like(opac, 1.0 / 512.0)
    vm, Ks = _cam()
    cfull = jnp.broadcast_to(colors[None], (1,) + colors.shape)
    out, a, meta = rasterization(
        means, quats, scales, opac, cfull, vm, Ks, W, H, isect_capacity=4096
    )
    assert float(jnp.abs(out).max()) == 0.0


def test_single_gaussian():
    means = jnp.asarray([[0.0, 0.0, 3.0]])
    quats = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.asarray([[0.3, 0.3, 0.3]])
    opac = jnp.asarray([0.9])
    colors = jnp.asarray([[[1.0, 0.5, 0.25]]])
    vm, Ks = _cam()
    out, a, meta = rasterization(
        means, quats, scales, opac, colors, vm, Ks, W, H, isect_capacity=1024
    )
    assert float(a.max()) > 0.5
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("D", [1, 2, 8, 32, 64, 128])
def test_channel_sweep_matches_oracle(D):
    """Arbitrary channel counts through the Pallas kernels (the analog of
    the reference's GSPLAT_NUM_CHANNELS template sweep, Config.h:28-75 —
    here D is a plain static argument, no templates needed)."""
    rng = np.random.default_rng(D)
    I, N = 1, 120
    tw, th = -(-W // TS), -(-H // TS)
    means2d = jnp.asarray(rng.uniform(-5, 50, (I, N, 2)).astype(np.float32))
    L = rng.standard_normal((I, N, 2, 2)).astype(np.float32) * 0.5
    cov = L @ L.transpose(0, 1, 3, 2) + 0.1 * np.eye(2, dtype=np.float32)
    inv = np.linalg.inv(cov)
    conics = jnp.asarray(np.stack(
        [inv[..., 0, 0], inv[..., 0, 1], inv[..., 1, 1]], -1
    ).astype(np.float32))
    colors = jnp.asarray(rng.random((I, N, D)).astype(np.float32))
    opac = jnp.asarray(np.clip(rng.random((I, N)) * 1.2, 0, 1).astype(np.float32))
    radii = jnp.asarray(np.full((I, N, 2), 6, np.int32))
    depths = jnp.asarray((rng.random((I, N)) * 5 + 0.1).astype(np.float32))

    isect = isect_tiles(means2d, radii, depths, TS, tw, th, capacity=8192)
    offsets = isect_offset_encode(isect.tile_keys, I, tw, th)
    ref_c, ref_a = rasterize_to_pixels_ref(
        means2d, conics, colors, opac, W, H, TS, offsets,
        isect.flatten_ids, isect.n_isects, max_range=512,
    )
    out_c, out_a, _ = rasterize_to_pixels(
        means2d, conics, colors, opac, W, H, radii, depths,
        isect_capacity=8192,
    )
    # tolerance follows the configured scan-matmul precision: 2-pass
    # faithful scans (the default; GSPLAT_TPU_SCAN_PASSES) carry ~2**-17 *
    # sqrt(chunk) relative noise on long transmittance chains (ops/mxu.py:
    # dot_01_faithful) — ~2e-4 class vs the f32-accumulation-exact 3-pass
    from gsplat_tpu.ops.rasterize_pallas import SCAN_PASSES

    atol = 5e-5 if SCAN_PASSES >= 3 else 4e-4
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(ref_c), atol=atol, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(ref_a), atol=atol, rtol=1e-4
    )


def test_grad_channel_sweep_D8():
    """Gradient parity at a non-3 channel count."""
    D = 8
    rng = np.random.default_rng(42)
    I, N = 1, 80
    tw, th = -(-W // TS), -(-H // TS)
    means2d = jnp.asarray(rng.uniform(0, 46, (I, N, 2)).astype(np.float32))
    conics = jnp.asarray(
        np.tile(np.array([0.5, 0.05, 0.4], np.float32), (I, N, 1))
    )
    colors = jnp.asarray(rng.random((I, N, D)).astype(np.float32))
    opac = jnp.asarray((rng.random((I, N)) * 0.8 + 0.1).astype(np.float32))
    radii = jnp.asarray(np.full((I, N, 2), 5, np.int32))
    depths = jnp.asarray((rng.random((I, N)) * 5 + 0.1).astype(np.float32))
    isect = isect_tiles(means2d, radii, depths, TS, tw, th, capacity=8192)
    offsets = isect_offset_encode(isect.tile_keys, I, tw, th)
    v = jnp.asarray(rng.standard_normal((I, H, W, D)).astype(np.float32))

    def lp(m2, cn, cl, op):
        c, a, _ = rasterize_to_pixels(
            m2, cn, cl, op, W, H, radii, depths, isect_capacity=8192
        )
        return jnp.sum(c * v)

    def lo(m2, cn, cl, op):
        c, a = rasterize_to_pixels_ref(
            m2, cn, cl, op, W, H, TS, offsets, isect.flatten_ids,
            isect.n_isects, max_range=512,
        )
        return jnp.sum(c * v)

    gp = jax.grad(lp, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)
    go = jax.grad(lo, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)
    for a, b in zip(gp, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=5e-3
        )
