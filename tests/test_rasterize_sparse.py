"""Sparse pixel-subset rasterization vs the dense oracle at those pixels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.isect import isect_offset_encode, isect_tiles
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref
from gsplat_tpu.ops.rasterize_sparse import rasterize_to_pixels_sparse

W, H, TS = 40, 35, 16


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(9)
    I, N, D = 2, 150, 3
    tw, th = -(-W // TS), -(-H // TS)
    means2d = rng.uniform(-5, 45, (I, N, 2)).astype(np.float32)
    L = rng.standard_normal((I, N, 2, 2)).astype(np.float32) * 0.4
    cov = L @ L.transpose(0, 1, 3, 2) + 0.1 * np.eye(2, dtype=np.float32)
    inv = np.linalg.inv(cov)
    conics = np.stack(
        [inv[..., 0, 0], inv[..., 0, 1], inv[..., 1, 1]], -1
    ).astype(np.float32)
    colors = rng.random((I, N, D)).astype(np.float32)
    opacities = np.clip(rng.random((I, N)) * 1.2, 0, 1).astype(np.float32)
    radii = np.full((I, N, 2), 5, np.int32)
    depths = (rng.random((I, N)) * 5 + 0.1).astype(np.float32)
    isect = isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        TS, tw, th, capacity=4096,
    )
    offsets = isect_offset_encode(isect.tile_keys, I, tw, th)
    P = 300
    pix = np.stack(
        [rng.integers(0, H, P), rng.integers(0, W, P)], -1
    ).astype(np.int32)
    img_ids = rng.integers(0, I, P).astype(np.int32)
    bg = rng.random((I, D)).astype(np.float32)
    return dict(
        means2d=jnp.asarray(means2d), conics=jnp.asarray(conics),
        colors=jnp.asarray(colors), opacities=jnp.asarray(opacities),
        offsets=offsets, isect=isect, pixels=jnp.asarray(pix),
        image_ids=jnp.asarray(img_ids), bg=jnp.asarray(bg),
    )


def test_sparse_matches_dense_at_pixels(scene):
    s = scene
    sp_c, sp_a = rasterize_to_pixels_sparse(
        s["means2d"], s["conics"], s["colors"], s["opacities"],
        s["pixels"], s["image_ids"], W, H, TS, s["offsets"],
        s["isect"].flatten_ids, s["isect"].n_isects, max_range=512,
        backgrounds=s["bg"],
    )
    ref_c, ref_a = rasterize_to_pixels_ref(
        s["means2d"], s["conics"], s["colors"], s["opacities"], W, H, TS,
        s["offsets"], s["isect"].flatten_ids, s["isect"].n_isects,
        max_range=512, backgrounds=s["bg"],
    )
    pix = np.asarray(s["pixels"])
    img = np.asarray(s["image_ids"])
    np.testing.assert_allclose(
        np.asarray(sp_c), np.asarray(ref_c)[img, pix[:, 0], pix[:, 1]],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sp_a), np.asarray(ref_a)[img, pix[:, 0], pix[:, 1]],
        atol=1e-5,
    )


def test_sparse_gradients_match_dense(scene):
    s = scene
    pix = np.asarray(s["pixels"])
    img = np.asarray(s["image_ids"])

    def loss_sparse(m2, cn, cl, op):
        c, a = rasterize_to_pixels_sparse(
            m2, cn, cl, op, s["pixels"], s["image_ids"], W, H, TS,
            s["offsets"], s["isect"].flatten_ids, s["isect"].n_isects,
            max_range=512,
        )
        return jnp.sum(c**2) + jnp.sum(a)

    def loss_dense(m2, cn, cl, op):
        c, a = rasterize_to_pixels_ref(
            m2, cn, cl, op, W, H, TS, s["offsets"],
            s["isect"].flatten_ids, s["isect"].n_isects, max_range=512,
        )
        cs = c[img, pix[:, 0], pix[:, 1]]
        as_ = a[img, pix[:, 0], pix[:, 1]]
        return jnp.sum(cs**2) + jnp.sum(as_)

    args = (s["means2d"], s["conics"], s["colors"], s["opacities"])
    g_s = jax.grad(loss_sparse, argnums=(0, 1, 2, 3))(*args)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*args)
    for gs, gd in zip(g_s, g_d):
        scale = max(float(jnp.abs(gd).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gd), atol=2e-5 * scale
        )


def test_sparse_contributing_ops_match_dense(scene):
    from gsplat_tpu.ops.contributing import (
        rasterize_contributing_gaussian_ids,
        rasterize_num_contributing_gaussians,
        rasterize_top_contributing_gaussian_ids,
    )
    from gsplat_tpu.ops.rasterize_sparse import (
        rasterize_contributing_gaussian_ids_sparse,
        rasterize_num_contributing_gaussians_sparse,
        rasterize_top_contributing_gaussian_ids_sparse,
    )

    s = scene
    pix = np.asarray(s["pixels"])
    img = np.asarray(s["image_ids"])
    counts_d, alphas_d = rasterize_num_contributing_gaussians(
        s["means2d"], s["conics"], s["opacities"], s["offsets"],
        s["isect"].flatten_ids, W, H, TS, s["isect"].n_isects, 512,
    )
    counts_s, alphas_s = rasterize_num_contributing_gaussians_sparse(
        s["means2d"], s["conics"], s["opacities"], s["pixels"],
        s["image_ids"], W, H, TS, s["offsets"], s["isect"].flatten_ids,
        s["isect"].n_isects, 512,
    )
    np.testing.assert_array_equal(
        np.asarray(counts_s), np.asarray(counts_d)[img, pix[:, 0], pix[:, 1]]
    )
    np.testing.assert_allclose(
        np.asarray(alphas_s),
        np.asarray(alphas_d)[img, pix[:, 0], pix[:, 1]], atol=1e-6,
    )
    K = int(counts_d.max())
    ids_d, w_d = rasterize_contributing_gaussian_ids(
        s["means2d"], s["conics"], s["opacities"], s["offsets"],
        s["isect"].flatten_ids, W, H, TS, s["isect"].n_isects, 512, K,
    )
    ids_s, w_s = rasterize_contributing_gaussian_ids_sparse(
        s["means2d"], s["conics"], s["opacities"], s["pixels"],
        s["image_ids"], W, H, TS, s["offsets"], s["isect"].flatten_ids,
        s["isect"].n_isects, 512, K,
    )
    np.testing.assert_array_equal(
        np.asarray(ids_s), np.asarray(ids_d)[img, pix[:, 0], pix[:, 1]]
    )
    np.testing.assert_allclose(
        np.asarray(w_s), np.asarray(w_d)[img, pix[:, 0], pix[:, 1]], atol=1e-6
    )
    t_d = rasterize_top_contributing_gaussian_ids(
        s["means2d"], s["conics"], s["opacities"], s["offsets"],
        s["isect"].flatten_ids, W, H, TS, s["isect"].n_isects, 512, 4,
    )
    t_s = rasterize_top_contributing_gaussian_ids_sparse(
        s["means2d"], s["conics"], s["opacities"], s["pixels"],
        s["image_ids"], W, H, TS, s["offsets"], s["isect"].flatten_ids,
        s["isect"].n_isects, 512, 4,
    )
    np.testing.assert_array_equal(
        np.asarray(t_s[0]), np.asarray(t_d[0])[img, pix[:, 0], pix[:, 1]]
    )
