"""rasterization() end-to-end vs an oracle composition of the jnp reference.

Mirrors the reference's orchestrator-vs-Python tests
(tests/test_basic.py:5313 `test_rasterization_cpp_classic_matches_python_reference`):
the full fused pipeline must match the compositional reference path on both
forward outputs and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.isect import isect_offset_encode, isect_tiles
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref
from gsplat_tpu.ops.sh import num_sh_bases, spherical_harmonics
from gsplat_tpu.rendering import (
    rasterization,
    render_mode_has_color,
    render_mode_has_depth_channel,
    render_mode_has_expected_depth,
)

W, H, TS = 64, 48, 16


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    N, C = 300, 2
    means = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2, 8, N)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.4 + 0.05).astype(np.float32)
    opacities = rng.random(N).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    sh_coeffs = (rng.standard_normal((N, num_sh_bases(2), 3)) * 0.3).astype(
        np.float32
    )
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[1, :3, 3] = [0.3, -0.2, 0.5]
    Ks = np.array(
        [[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]] * C, np.float32
    )
    return {
        k: jnp.asarray(v)
        for k, v in dict(
            means=means, quats=quats, scales=scales, opacities=opacities,
            colors=colors, sh_coeffs=sh_coeffs, viewmats=viewmats, Ks=Ks,
        ).items()
    }


def oracle_render(
    means, quats, scales, opacities, colors, viewmats, Ks,
    render_mode="RGB", rasterize_mode="classic", sh_degree=None,
    backgrounds=None,
):
    """Compositional reference path (jnp oracle rasterizer)."""
    C, N = viewmats.shape[0], means.shape[0]
    calc_comp = rasterize_mode == "antialiased"
    radii, means2d, depths, conics, comp = fully_fused_projection(
        means, None, quats, scales, viewmats, Ks, W, H,
        calc_compensations=calc_comp, opacities=opacities,
    )
    op = jnp.broadcast_to(opacities[None], (C, N))
    if calc_comp:
        op = op * comp
    if render_mode_has_color(render_mode):
        if sh_degree is not None:
            R = viewmats[:, :3, :3]
            t = viewmats[:, :3, 3]
            campos = -jnp.einsum("cji,cj->ci", R, t, precision="highest")
            dirs = means[None] - campos[:, None]
            feats = spherical_harmonics(
                sh_degree, dirs, colors, masks=(radii > 0).all(-1)
            )
            feats = jnp.maximum(feats + 0.5, 0.0)
        else:
            feats = jnp.broadcast_to(colors[None], (C, N, colors.shape[-1]))
        if render_mode_has_depth_channel(render_mode):
            feats = jnp.concatenate([feats, depths[..., None]], -1)
    else:
        feats = depths[..., None]
    tw, th = -(-W // TS), -(-H // TS)
    isect = isect_tiles(means2d, radii, depths, TS, tw, th, capacity=8192)
    offsets = isect_offset_encode(isect.tile_keys, C, tw, th)
    bg = backgrounds
    if bg is not None and bg.shape[-1] < feats.shape[-1]:
        bg = jnp.pad(bg, ((0, 0), (0, feats.shape[-1] - bg.shape[-1])))
    render, alpha = rasterize_to_pixels_ref(
        means2d, conics, feats, op, W, H, TS, offsets,
        isect.flatten_ids, isect.n_isects, max_range=400, backgrounds=bg,
    )
    if render_mode_has_expected_depth(render_mode):
        d = render[..., -1:] / jnp.maximum(alpha, 1e-10)
        render = jnp.concatenate([render[..., :-1], d], -1)
    return render, alpha


@pytest.mark.parametrize(
    "render_mode", ["RGB", "D", "ED", "RGB+D", "RGB+ED"]
)
def test_render_modes_match_oracle(scene, render_mode):
    s = scene
    args = (
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"],
    )
    ref_c, ref_a = oracle_render(*args, render_mode=render_mode)
    out_c, out_a, meta = rasterization(*args, W, H, render_mode=render_mode)
    assert not bool(meta["isect_overflow"])
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(ref_c), rtol=5e-5, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a), atol=2e-5)
    D_exp = {"RGB": 3, "D": 1, "ED": 1, "RGB+D": 4, "RGB+ED": 4}[render_mode]
    assert out_c.shape == (2, H, W, D_exp)
    assert out_a.shape == (2, H, W, 1)


def test_antialiased_matches_oracle(scene):
    s = scene
    args = (
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"],
    )
    ref_c, _ = oracle_render(*args, rasterize_mode="antialiased")
    out_c, _, _ = rasterization(*args, W, H, rasterize_mode="antialiased")
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(ref_c), rtol=5e-5, atol=2e-5
    )
    # antialiased must differ from classic (compensation active)
    cls_c, _, _ = rasterization(*args, W, H)
    assert np.abs(np.asarray(out_c) - np.asarray(cls_c)).max() > 1e-4


def test_sh_matches_oracle(scene):
    s = scene
    args = (
        s["means"], s["quats"], s["scales"], s["opacities"], s["sh_coeffs"],
        s["viewmats"], s["Ks"],
    )
    ref_c, _ = oracle_render(*args, sh_degree=2)
    out_c, _, _ = rasterization(*args, W, H, sh_degree=2)
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(ref_c), rtol=5e-5, atol=2e-5
    )


def test_backgrounds(scene):
    s = scene
    bg = jnp.asarray(
        np.random.default_rng(1).random((2, 3)).astype(np.float32)
    )
    args = (
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"],
    )
    ref_c, _ = oracle_render(*args, render_mode="RGB+D", backgrounds=bg)
    out_c, _, _ = rasterization(
        *args, W, H, render_mode="RGB+D", backgrounds=bg
    )
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(ref_c), rtol=5e-5, atol=2e-5
    )


def test_gradients_match_oracle(scene):
    s = scene
    args = (
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"],
    )
    tgt = jnp.asarray(
        np.random.default_rng(3).random((2, H, W, 3)).astype(np.float32)
    )

    def loss_full(means, quats, scales, opacities, colors):
        c, a, _ = rasterization(
            means, quats, scales, opacities, colors, s["viewmats"], s["Ks"],
            W, H,
        )
        return jnp.sum((c - tgt) ** 2) + 0.1 * jnp.sum(a)

    def loss_ref(means, quats, scales, opacities, colors):
        c, a = oracle_render(
            means, quats, scales, opacities, colors, s["viewmats"], s["Ks"]
        )
        return jnp.sum((c - tgt) ** 2) + 0.1 * jnp.sum(a)

    g_full = jax.grad(loss_full, argnums=(0, 1, 2, 3, 4))(*args[:5])
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args[:5])
    for gf, gr in zip(g_full, g_ref):
        scale = max(float(jnp.abs(gr).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4 * scale
        )


def test_means2d_offset_screen_grads(scene):
    """means2d_offset cotangent == d loss / d means2d (densification signal)."""
    s = scene
    C, N = 2, s["means"].shape[0]
    tgt = jnp.asarray(
        np.random.default_rng(3).random((C, H, W, 3)).astype(np.float32)
    )

    def loss(off):
        c, _, _ = rasterization(
            s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
            s["viewmats"], s["Ks"], W, H, means2d_offset=off,
        )
        return jnp.sum((c - tgt) ** 2)

    g = jax.grad(loss)(jnp.zeros((C, N, 2)))
    assert g.shape == (C, N, 2)
    assert float(jnp.abs(g).max()) > 0

    # absgrad: elementwise >= |plain grad| (abs of tile contributions)
    def loss_abs(off):
        c, _, _ = rasterization(
            s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
            s["viewmats"], s["Ks"], W, H, means2d_offset=off, absgrad=True,
        )
        return jnp.sum((c - tgt) ** 2)

    g_abs = jax.grad(loss_abs)(jnp.zeros((C, N, 2)))
    tol = 1e-4 * max(float(jnp.abs(g).max()), 1.0)  # f32 accumulation noise
    assert (np.asarray(g_abs) >= np.abs(np.asarray(g)) - tol).all()


def test_batched_cameras(scene):
    """Leading batch dims on viewmats/Ks broadcast correctly."""
    s = scene
    vm = jnp.stack([s["viewmats"], s["viewmats"]])  # [2, C, 4, 4]
    ks = jnp.stack([s["Ks"], s["Ks"]])
    out_c, out_a, meta = rasterization(
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        vm, ks, W, H,
    )
    assert out_c.shape == (2, 2, H, W, 3)
    flat_c, _, _ = rasterization(
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"], W, H,
    )
    np.testing.assert_allclose(
        np.asarray(out_c[0]), np.asarray(flat_c), atol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_c[1]), np.asarray(flat_c), atol=3e-6
    )


def test_extra_signals_composited_and_split():
    """Per-gaussian extra channels ride the same compositing weights and
    return in meta["render_extra_signals"] (reference rendering.py:283-345:
    render_colors stays RGB(+depth), extras split out)."""
    rng = np.random.default_rng(0)
    N, C, W2, H2 = 80, 2, 48, 32
    means = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    means = means.at[:, 2].add(5)
    quats = jnp.asarray(rng.standard_normal((N, 4)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.05, 0.3, (N, 3)).astype(np.float32))
    op = jnp.asarray(rng.uniform(0.3, 0.9, N).astype(np.float32))
    colors = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    extras = jnp.asarray(rng.random((N, 5)).astype(np.float32))
    vm = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (C, 1, 1)))
    Ks = jnp.asarray(np.tile(
        np.array([[50.0, 0, 24], [0, 50.0, 16], [0, 0, 1]], np.float32),
        (C, 1, 1),
    ))

    out, _, meta = rasterization(
        means, quats, scales, op, colors, vm, Ks, W2, H2,
        extra_signals=extras, isect_capacity=100_000,
    )
    assert out.shape[-1] == 3
    assert meta["render_extra_signals"].shape == (C, H2, W2, 5)
    # extras composite exactly like colors would
    ref, _, _ = rasterization(
        means, quats, scales, op, extras, vm, Ks, W2, H2,
        isect_capacity=100_000,
    )
    np.testing.assert_allclose(
        np.asarray(meta["render_extra_signals"]), np.asarray(ref), atol=1e-5
    )
    # depth modes keep the depth channel in render_colors, extras separate
    out3, _, meta3 = rasterization(
        means, quats, scales, op, colors, vm, Ks, W2, H2,
        render_mode="RGB+ED", extra_signals=extras, isect_capacity=100_000,
    )
    assert out3.shape[-1] == 4
    assert meta3["render_extra_signals"].shape[-1] == 5
    # SH-coded extras with their own degree
    ex_sh = jnp.asarray(
        (rng.standard_normal((N, 9, 2)) * 0.2).astype(np.float32)
    )
    _, _, meta4 = rasterization(
        means, quats, scales, op, colors, vm, Ks, W2, H2,
        extra_signals=ex_sh, extra_signals_sh_degree=2,
        isect_capacity=100_000,
    )
    assert meta4["render_extra_signals"].shape[-1] == 2
