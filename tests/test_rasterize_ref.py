"""Validate the associative-scan compositor against a literal sequential
python loop implementing the CUDA kernel's semantics
(RasterizeToPixels3DGSSerialBatchFwd.cu:194-272)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.isect import isect_offset_encode, isect_tiles
from gsplat_tpu.ops.projection import (
    ALPHA_THRESHOLD,
    MAX_ALPHA,
    TRANSMITTANCE_THRESHOLD,
)
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref


def _sequential_rasterize(
    means2d, conics, colors, opacities, width, height, tile_size,
    offsets, flatten_ids, n_isects, backgrounds=None,
):
    """Literal front-to-back sequential loop (the CUDA semantics)."""
    I, N, D = colors.shape
    th, tw = offsets.shape[1:]
    out = np.zeros((I, height, width, D), np.float32)
    out_alpha = np.zeros((I, height, width, 1), np.float32)
    m2 = means2d.reshape(-1, 2)
    cn = conics.reshape(-1, 3)
    cl = colors.reshape(-1, D)
    op = opacities.reshape(-1)
    bounds = np.concatenate([offsets.reshape(-1), [n_isects]])
    for i in range(I):
        for y in range(height):
            for x in range(width):
                t = i * th * tw + (y // tile_size) * tw + (x // tile_size)
                T = 1.0
                acc = np.zeros(D, np.float32)
                for s in range(bounds[t], bounds[t + 1]):
                    g = flatten_ids[s]
                    dx = m2[g, 0] - (x + 0.5)
                    dy = m2[g, 1] - (y + 0.5)
                    a, b, c = cn[g]
                    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
                    alpha = min(MAX_ALPHA, op[g] * np.exp(-sigma))
                    if sigma < 0 or alpha < ALPHA_THRESHOLD:
                        continue
                    next_T = T * (1.0 - alpha)
                    if next_T <= TRANSMITTANCE_THRESHOLD:
                        break
                    acc += cl[g] * (alpha * T)
                    T = next_T
                if backgrounds is not None:
                    acc = acc + T * backgrounds[i]
                out[i, y, x] = acc
                out_alpha[i, y, x] = 1.0 - T
    return out, out_alpha


@pytest.fixture(scope="module")
def raster_inputs():
    rng = np.random.default_rng(0)
    I, N, D = 1, 120, 3
    W, H, ts = 32, 32, 16
    tw, th = W // ts, H // ts
    means2d = rng.uniform(0, W, (I, N, 2)).astype(np.float32)
    # random PSD conics
    L = rng.standard_normal((I, N, 2, 2)).astype(np.float32) * 0.4
    cov = L @ L.transpose(0, 1, 3, 2) + 0.1 * np.eye(2, dtype=np.float32)
    inv = np.linalg.inv(cov)
    conics = np.stack([inv[..., 0, 0], inv[..., 0, 1], inv[..., 1, 1]], -1).astype(
        np.float32
    )
    colors = rng.random((I, N, D)).astype(np.float32)
    # include some very high opacities to exercise saturation/early-stop
    opacities = np.clip(rng.random((I, N)) * 1.2, 0, 1).astype(np.float32)
    radii = np.full((I, N, 2), 6, np.int32)
    depths = (rng.random((I, N)) * 5 + 0.1).astype(np.float32)
    isect = isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        ts, tw, th, capacity=2048,
    )
    offsets = isect_offset_encode(isect.tile_keys, I, tw, th)
    return dict(
        means2d=means2d, conics=conics, colors=colors, opacities=opacities,
        width=W, height=H, tile_size=ts,
        offsets=np.asarray(offsets), flatten_ids=np.asarray(isect.flatten_ids),
        n_isects=int(isect.n_isects), isect=isect, offsets_j=offsets,
    )


def test_ref_matches_sequential(raster_inputs):
    ri = raster_inputs
    seq_c, seq_a = _sequential_rasterize(
        ri["means2d"], ri["conics"], ri["colors"], ri["opacities"],
        ri["width"], ri["height"], ri["tile_size"],
        ri["offsets"], ri["flatten_ids"], ri["n_isects"],
    )
    out_c, out_a = rasterize_to_pixels_ref(
        jnp.asarray(ri["means2d"]), jnp.asarray(ri["conics"]),
        jnp.asarray(ri["colors"]), jnp.asarray(ri["opacities"]),
        ri["width"], ri["height"], ri["tile_size"],
        ri["offsets_j"], raster_inputs["isect"].flatten_ids,
        raster_inputs["isect"].n_isects, max_range=256,
    )
    np.testing.assert_allclose(np.asarray(out_c), seq_c, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a), seq_a, rtol=1e-4, atol=1e-5)


def test_ref_with_background(raster_inputs):
    ri = raster_inputs
    bg = np.array([[0.2, 0.5, 0.8]], np.float32)
    seq_c, _ = _sequential_rasterize(
        ri["means2d"], ri["conics"], ri["colors"], ri["opacities"],
        ri["width"], ri["height"], ri["tile_size"],
        ri["offsets"], ri["flatten_ids"], ri["n_isects"], backgrounds=bg,
    )
    out_c, _ = rasterize_to_pixels_ref(
        jnp.asarray(ri["means2d"]), jnp.asarray(ri["conics"]),
        jnp.asarray(ri["colors"]), jnp.asarray(ri["opacities"]),
        ri["width"], ri["height"], ri["tile_size"],
        ri["offsets_j"], raster_inputs["isect"].flatten_ids,
        raster_inputs["isect"].n_isects, max_range=256,
        backgrounds=jnp.asarray(bg),
    )
    np.testing.assert_allclose(np.asarray(out_c), seq_c, rtol=1e-4, atol=1e-5)


def test_ref_grads_finite(raster_inputs):
    ri = raster_inputs

    def f(means2d, conics, colors, opacities):
        c, a = rasterize_to_pixels_ref(
            means2d, conics, colors, opacities,
            ri["width"], ri["height"], ri["tile_size"],
            ri["offsets_j"], raster_inputs["isect"].flatten_ids,
            raster_inputs["isect"].n_isects, max_range=256,
        )
        return jnp.sum(c**2) + jnp.sum(a)

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(
        jnp.asarray(ri["means2d"]), jnp.asarray(ri["conics"]),
        jnp.asarray(ri["colors"]), jnp.asarray(ri["opacities"]),
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
