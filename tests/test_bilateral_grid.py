"""Bilateral-grid color correction vs a naive trilinear oracle.

Oracle: direct per-point trilinear interpolation (grid_sample bilinear,
align_corners=True, border padding semantics) written with explicit
corner indexing — independent of the gather-free production path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gsplat_tpu.training.bilateral_grid import (
    color_affine_transform,
    init_bilateral_grids,
    rgb_to_guidance,
    slice_image,
    slice_points,
    total_variation_loss,
)


def _oracle_trilinear(grid, x, y, z):
    """grid: (L, Hg, Wg, C); x, y, z in [-1, 1] arrays of shape (P,)."""
    L, Hg, Wg, C = grid.shape

    def prep(c, size):
        u = np.clip((c + 1.0) * 0.5 * (size - 1), 0.0, size - 1)
        i0 = np.clip(np.floor(u).astype(np.int64), 0, size - 1)
        i1 = np.clip(i0 + 1, 0, size - 1)
        f = u - i0
        return i0, i1, f

    x0, x1, fx = prep(x, Wg)
    y0, y1, fy = prep(y, Hg)
    z0, z1, fz = prep(z, L)
    out = np.zeros((x.shape[0], C), np.float64)
    for zi, wz in ((z0, 1 - fz), (z1, fz)):
        for yi, wy in ((y0, 1 - fy), (y1, fy)):
            for xi, wx in ((x0, 1 - fx), (x1, fx)):
                w = (wz * wy * wx)[:, None]
                out += w * grid[zi, yi, xi, :]
    return out


def _rand_grid(rng, n, L=4, Hg=5, Wg=6):
    base = np.asarray(init_bilateral_grids(n, Wg, Hg, L))
    return base + 0.1 * rng.standard_normal(base.shape).astype(np.float32)


def test_identity_grid_is_identity():
    rng = np.random.default_rng(0)
    rgb = rng.random((9, 13, 3)).astype(np.float32)
    grid = init_bilateral_grids(1)[0]
    out, affine = slice_image(jnp.asarray(grid), jnp.asarray(rgb))
    np.testing.assert_allclose(np.asarray(out), rgb, atol=1e-6)
    assert affine.shape == (9, 13, 12)


def test_slice_image_matches_oracle():
    rng = np.random.default_rng(1)
    grid = _rand_grid(rng, 1)[0]
    H, W = 17, 23
    rgb = rng.random((H, W, 3)).astype(np.float32)
    out, affine = slice_image(jnp.asarray(grid), jnp.asarray(rgb))

    ys = ((np.arange(H) + 0.5) / H) * 2 - 1
    xs = ((np.arange(W) + 0.5) / W) * 2 - 1
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    z = np.asarray(rgb_to_guidance(jnp.asarray(rgb)))
    a_ref = _oracle_trilinear(
        np.asarray(grid, np.float64), xx.ravel(), yy.ravel(), z.ravel()
    ).reshape(H, W, 12)
    np.testing.assert_allclose(np.asarray(affine), a_ref, atol=1e-5)

    mats = a_ref.reshape(H, W, 3, 4)
    rgb_ref = np.einsum("hwij,hwj->hwi", mats[..., :3], rgb) + mats[..., 3]
    np.testing.assert_allclose(np.asarray(out), rgb_ref, atol=1e-5)


def test_slice_points_matches_oracle():
    rng = np.random.default_rng(2)
    N = 3
    grids = _rand_grid(rng, N)
    P = 64
    xy = rng.random((P, 2)).astype(np.float32)
    rgb = rng.random((P, 3)).astype(np.float32)
    idx = rng.integers(0, N, size=P).astype(np.int32)
    out, affine = slice_points(
        jnp.asarray(grids), jnp.asarray(xy), jnp.asarray(rgb), jnp.asarray(idx)
    )
    z = np.asarray(rgb_to_guidance(jnp.asarray(rgb)))
    a_ref = np.zeros((P, 12))
    for n in range(N):
        m = idx == n
        a_ref[m] = _oracle_trilinear(
            np.asarray(grids[n], np.float64),
            xy[m, 0] * 2 - 1,
            xy[m, 1] * 2 - 1,
            z[m],
        )
    np.testing.assert_allclose(np.asarray(affine), a_ref, atol=1e-5)
    mats = a_ref.reshape(P, 3, 4)
    rgb_ref = np.einsum("pij,pj->pi", mats[..., :3], rgb) + mats[..., 3]
    np.testing.assert_allclose(np.asarray(out), rgb_ref, atol=1e-5)


def test_total_variation_loss():
    rng = np.random.default_rng(3)
    grids = _rand_grid(rng, 2, L=3, Hg=4, Wg=5)
    got = float(total_variation_loss(jnp.asarray(grids)))
    # independent computation (reference lib_bilagrid.py:91 semantics)
    g = np.asarray(grids, np.float64)
    n = g.shape[0]
    tv = 0.0
    for ax in (1, 2, 3):
        d = np.diff(g, axis=ax)
        tv += (d**2).sum() / (d.size / n)
    tv /= n
    np.testing.assert_allclose(got, tv, rtol=1e-5)


def test_gradients_flow():
    import jax

    rng = np.random.default_rng(4)
    grid = jnp.asarray(_rand_grid(rng, 1)[0])
    rgb = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    target = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))

    def loss(g):
        out, _ = slice_image(g, rgb)
        return jnp.mean((out - target) ** 2) + 1e-2 * total_variation_loss(
            g[None]
        )

    val, grad = jax.value_and_grad(loss)(grid)
    assert np.isfinite(float(val))
    assert float(jnp.max(jnp.abs(grad))) > 0.0
    assert bool(jnp.all(jnp.isfinite(grad)))


def test_affine_transform_shapes():
    rng = np.random.default_rng(5)
    affine = jnp.asarray(rng.random((4, 7, 12)).astype(np.float32))
    rgb = jnp.asarray(rng.random((4, 7, 3)).astype(np.float32))
    out = color_affine_transform(affine, rgb)
    assert out.shape == (4, 7, 3)
    ident = jnp.broadcast_to(
        jnp.asarray([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], jnp.float32),
        (4, 7, 12),
    )
    np.testing.assert_allclose(
        np.asarray(color_affine_transform(ident, rgb)), np.asarray(rgb), atol=1e-7
    )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
