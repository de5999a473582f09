"""Extended degeneracy/robustness suites (reference tests/test_basic.py
:6564-7370 degeneracy classes not covered by test_robustness.py):
non-finite inputs, empty scenes, off-screen extremes, duplicate splats,
degenerate cameras, and mixed degenerate+valid gradient parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.rendering import rasterization

W, H = 48, 32


def _cam(c=1, f=40.0):
    viewmats = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
    Ks = np.tile(
        np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32),
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


def _render(means, quats, scales, opac, colors, cap=65536, **kw):
    vm, Ks = _cam()
    cfull = jnp.broadcast_to(colors[None], (1,) + colors.shape)
    return rasterization(
        means, quats, scales, opac, cfull, vm, Ks, W, H,
        isect_capacity=cap, **kw
    )


def _grads(means, quats, scales, opac, colors, cap=65536):
    vm, Ks = _cam()
    cfull = jnp.broadcast_to(colors[None], (1,) + colors.shape)

    def loss(m, q, s, o, c):
        out, a, _ = rasterization(
            m, q, s, o, c, vm, Ks, W, H, isect_capacity=cap
        )
        return jnp.sum(out ** 2) + jnp.sum(a)

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, quats, scales, opac, cfull
    )


# ---------------------------------------------------------------------------
# non-finite inputs
# ---------------------------------------------------------------------------


def test_nan_means_isolated():
    """NaN means poison only their own gaussian, not the whole image
    (reference culls non-finite projections; test_basic.py NaN suite)."""
    means, quats, scales, opac, colors = _scene()
    means = means.at[5].set(jnp.nan)
    out, a, _ = _render(means, quats, scales, opac, colors)
    assert bool(jnp.isfinite(out).all()), "NaN leaked into the render"
    assert bool(jnp.isfinite(a).all())


def test_inf_means_isolated():
    means, quats, scales, opac, colors = _scene()
    means = means.at[7, 2].set(jnp.inf)
    means = means.at[11, 0].set(-jnp.inf)
    out, a, _ = _render(means, quats, scales, opac, colors)
    assert bool(jnp.isfinite(out).all())


def test_nan_scales_isolated():
    means, quats, scales, opac, colors = _scene()
    scales = scales.at[3].set(jnp.nan)
    out, a, _ = _render(means, quats, scales, opac, colors)
    assert bool(jnp.isfinite(out).all())


def test_huge_scales_finite():
    """Astronomically large scales must neither overflow the plan nor
    produce non-finite pixels (they cover every tile)."""
    means, quats, scales, opac, colors = _scene(n=8)
    scales = jnp.full_like(scales, 1e6)
    out, a, meta = _render(means, quats, scales, opac, colors)
    assert bool(jnp.isfinite(out).all())


def test_tiny_scales_finite_grads():
    """Sub-pixel gaussians: anti-aliasing-free path must stay finite in
    fwd and bwd (reference 3D smoothing / eps2d floor)."""
    means, quats, scales, opac, colors = _scene()
    scales = jnp.full_like(scales, 1e-6)
    g = _grads(means, quats, scales, opac, colors)
    for arr in g:
        assert bool(jnp.isfinite(arr).all())


# ---------------------------------------------------------------------------
# empty / all-culled scenes
# ---------------------------------------------------------------------------


def test_all_zero_opacity():
    means, quats, scales, opac, colors = _scene()
    opac = jnp.zeros_like(opac)
    out, a, meta = _render(means, quats, scales, opac, colors)
    assert float(jnp.abs(out).max()) == 0.0
    assert int(meta["n_isects"]) == 0


def test_all_culled_gradients_zero():
    """Every gaussian behind the camera: gradients must be exactly zero
    and finite (not NaN from 0/0 paths)."""
    means, quats, scales, opac, colors = _scene()
    means = means.at[:, 2].set(-4.0)
    g = _grads(means, quats, scales, opac, colors)
    for arr in g:
        assert bool(jnp.isfinite(arr).all())
        assert float(jnp.abs(arr).max()) == 0.0


def test_far_plane_culls_everything():
    means, quats, scales, opac, colors = _scene()
    out, a, meta = _render(
        means, quats, scales, opac, colors, far_plane=1.0
    )
    assert int(meta["n_isects"]) == 0
    assert float(a.max()) == 0.0


def test_near_plane_culls_everything():
    means, quats, scales, opac, colors = _scene()
    out, a, meta = _render(
        means, quats, scales, opac, colors, near_plane=50.0
    )
    assert int(meta["n_isects"]) == 0


# ---------------------------------------------------------------------------
# extremes and duplicates
# ---------------------------------------------------------------------------


def test_far_offscreen_means():
    """Means projecting kilometers off-image must be culled by the tile
    plan, not emit clamped garbage at the borders."""
    means, quats, scales, opac, colors = _scene()
    means = means.at[::2, 0].set(1e4)  # projects far right of the image
    out, a, meta = _render(means, quats, scales, opac, colors)
    assert bool(jnp.isfinite(out).all())
    out0, a0, _ = _render(
        means[1::2], quats[1::2], scales[1::2], opac[1::2], colors[1::2]
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out0), atol=1e-5, rtol=1e-5
    )


def test_duplicate_gaussians_compose():
    """K identical gaussians composite like alpha-stacking, order-stably
    (exercises depth ties in the sort; reference duplicates suite)."""
    means = jnp.tile(jnp.asarray([[0.0, 0.0, 3.0]]), (4, 1))
    quats = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), (4, 1))
    scales = jnp.tile(jnp.asarray([[0.3, 0.3, 0.3]]), (4, 1))
    opac = jnp.full((4,), 0.5)
    colors = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1))
    out, a, _ = _render(means, quats, scales, opac, colors)
    # center-pixel alpha: 1 - (1 - 0.5)^4 = 0.9375 (alpha at center == opac)
    amax = float(a.max())
    assert 0.9 < amax <= 0.94
    assert bool(jnp.isfinite(out).all())


def test_mixed_degenerate_valid_grad_parity():
    """Degenerate rows (NaN means, zero quats, zero scales) must leave the
    VALID rows' gradients untouched: grads on the mixed scene match grads
    on the clean subset exactly where the subset lives."""
    means, quats, scales, opac, colors = _scene(n=48, seed=9)
    g_clean = _grads(means, quats, scales, opac, colors)

    means2 = jnp.concatenate([means, jnp.full((4, 3), jnp.nan)], axis=0)
    quats2 = jnp.concatenate([quats, jnp.zeros((4, 4))], axis=0)
    scales2 = jnp.concatenate([scales, jnp.zeros((4, 3))], axis=0)
    opac2 = jnp.concatenate([opac, jnp.full((4,), 0.5)], axis=0)
    colors2 = jnp.concatenate([colors, jnp.full((4, 3), 0.5)], axis=0)
    g_mixed = _grads(means2, quats2, scales2, opac2, colors2)
    for gc, gm in zip(g_clean, g_mixed):
        gm = np.asarray(gm)
        gc = np.asarray(gc)
        assert np.isfinite(gm).all()
        # slice the GAUSSIAN axis (second-to-last for >=2-D grads like
        # colors' [1, N, 3]; leading for 1-D grads like opacities' [N])
        if gm.ndim == 1:
            gm_v, gc_v = gm[:48], gc[:48]
        else:
            gm_v, gc_v = gm[..., :48, :], gc[..., :48, :]
        np.testing.assert_allclose(gm_v, gc_v, atol=1e-5, rtol=1e-4)


def test_negative_opacity_clamped():
    """Negative opacities behave as zero contribution (reference gates
    alpha at 1/255 after sigmoid; raw API accepts any float)."""
    means, quats, scales, opac, colors = _scene()
    opac = -jnp.abs(opac)
    out, a, _ = _render(means, quats, scales, opac, colors)
    assert float(jnp.abs(out).max()) == 0.0
    assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# camera extremes
# ---------------------------------------------------------------------------


def test_tiny_focal_length():
    means, quats, scales, opac, colors = _scene()
    vm, Ks = _cam(f=0.5)
    cfull = jnp.broadcast_to(colors[None], (1,) + colors.shape)
    out, a, _ = rasterization(
        means, quats, scales, opac, cfull, vm, Ks, W, H,
        isect_capacity=65536,
    )
    assert bool(jnp.isfinite(out).all())


def test_huge_focal_length():
    means, quats, scales, opac, colors = _scene()
    vm, Ks = _cam(f=1e5)
    cfull = jnp.broadcast_to(colors[None], (1,) + colors.shape)
    out, a, _ = rasterization(
        means, quats, scales, opac, cfull, vm, Ks, W, H,
        isect_capacity=1 << 20,
    )
    assert bool(jnp.isfinite(out).all())


def test_gaussian_exactly_on_near_plane():
    means, quats, scales, opac, colors = _scene(n=4)
    means = means.at[:, 2].set(0.01)  # == default near plane
    out, a, _ = _render(means, quats, scales, opac, colors)
    assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# backgrounds + render-mode degeneracy
# ---------------------------------------------------------------------------


def test_background_on_empty_scene():
    means, quats, scales, opac, colors = _scene()
    opac = jnp.zeros_like(opac)
    vm, Ks = _cam()
    cfull = jnp.broadcast_to(colors[None], (1,) + colors.shape)
    bg = jnp.asarray([[0.25, 0.5, 0.75]])
    out, a, _ = rasterization(
        means, quats, scales, opac, cfull, vm, Ks, W, H,
        backgrounds=bg, isect_capacity=4096,
    )
    np.testing.assert_allclose(
        np.asarray(out),
        np.broadcast_to(np.asarray(bg)[:, None, None, :], out.shape),
        atol=1e-6,
    )


def test_depth_mode_empty_scene_finite():
    means, quats, scales, opac, colors = _scene()
    opac = jnp.zeros_like(opac)
    vm, Ks = _cam()
    cfull = jnp.broadcast_to(colors[None], (1,) + colors.shape)
    out, a, _ = rasterization(
        means, quats, scales, opac, cfull, vm, Ks, W, H,
        render_mode="ED", isect_capacity=4096,
    )
    assert bool(jnp.isfinite(out).all()), "ED on empty scene divides by 0"
