"""2DGS surfel pipeline: Pallas kernels vs the jnp oracle, fwd + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.isect import isect_offset_encode, isect_tiles
from gsplat_tpu.ops.projection2d import fully_fused_projection_2dgs
from gsplat_tpu.ops.rasterize2d import rasterize_to_pixels_2dgs
from gsplat_tpu.ops.rasterize2d_ref import rasterize_to_pixels_2dgs_ref
from gsplat_tpu.rendering import rasterization_2dgs

W, H, TS = 64, 48, 16


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(5)
    N, C = 250, 2
    means = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2, 8, N)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.5 + 0.1).astype(np.float32)
    opacities = rng.random(N).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[1, :3, 3] = [0.2, -0.1, 0.4]
    Ks = np.array(
        [[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]] * C, np.float32
    )
    return {
        k: jnp.asarray(v)
        for k, v in dict(
            means=means, quats=quats, scales=scales, opacities=opacities,
            colors=colors, viewmats=viewmats, Ks=Ks,
        ).items()
    }


def _project(s):
    return fully_fused_projection_2dgs(
        s["means"], s["quats"], s["scales"], s["viewmats"], s["Ks"], W, H
    )


def _oracle(s, feats, op=None):
    radii, m2, d, M, nrm = _project(s)
    C, N = 2, s["means"].shape[0]
    tw, th = -(-W // TS), -(-H // TS)
    isect = isect_tiles(m2, radii, d, TS, tw, th, capacity=16384)
    off = isect_offset_encode(isect.tile_keys, C, tw, th)
    opb = jnp.broadcast_to(s["opacities"][None], (C, N)) if op is None else op
    return rasterize_to_pixels_2dgs_ref(
        m2, M, feats, nrm, opb, W, H, TS, off,
        isect.flatten_ids, isect.n_isects, max_range=512,
    )


def _pallas(s, feats, op=None):
    radii, m2, d, M, nrm = _project(s)
    C, N = 2, s["means"].shape[0]
    opb = jnp.broadcast_to(s["opacities"][None], (C, N)) if op is None else op
    out = rasterize_to_pixels_2dgs(
        m2, M.reshape(C, N, 9), feats, nrm, opb, W, H, radii, d, 16384
    )
    return out[:5]


def _feats(s):
    """colors + depth last channel (as the reference trainer feeds them)."""
    radii, m2, d, M, nrm = _project(s)
    C, N = 2, s["means"].shape[0]
    cl = jnp.broadcast_to(s["colors"][None], (C, N, 3))
    return jnp.concatenate([cl, d[..., None]], axis=-1)


def test_projection_shapes_and_culling(scene):
    radii, m2, d, M, nrm = _project(scene)
    N = scene["means"].shape[0]
    assert radii.shape == (2, N, 2)
    assert M.shape == (2, N, 3, 3)
    assert nrm.shape == (2, N, 3)
    assert int((radii > 0).sum()) > 0
    # normals face the camera: dot(normal, mean_cam) <= 0
    R = scene["viewmats"][:, :3, :3]
    t = scene["viewmats"][:, :3, 3]
    mc = jnp.einsum("cij,nj->cni", R, scene["means"]) + t[:, None]
    cos = jnp.sum(nrm * mc, axis=-1)
    assert float(cos.max()) <= 1e-5


def test_forward_matches_oracle(scene):
    feats = _feats(scene)
    ref = _oracle(scene, feats)
    pal = _pallas(scene, feats)
    names = ["colors", "alphas", "normals", "distort", "median"]
    for name, r, p in zip(names, ref, pal):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), atol=2e-4,
            err_msg=f"2dgs output {name} mismatch",
        )


def test_gradients_match_oracle(scene):
    s = scene
    feats = _feats(s)
    tgt = jnp.asarray(
        np.random.default_rng(3).random((2, H, W, 4)).astype(np.float32)
    )
    tgt_n = jnp.asarray(
        np.random.default_rng(4).random((2, H, W, 3)).astype(np.float32)
    )

    radii, m2, d, M, nrm = _project(s)
    C, N = 2, s["means"].shape[0]
    opb = jnp.broadcast_to(s["opacities"][None], (C, N))

    def loss_ref(m2_, M_, feats_, nrm_, op_):
        tw, th = -(-W // TS), -(-H // TS)
        isect = isect_tiles(m2_, radii, d, TS, tw, th, capacity=16384)
        off = isect_offset_encode(isect.tile_keys, C, tw, th)
        c, a, n, dist, med = rasterize_to_pixels_2dgs_ref(
            m2_, M_, feats_, nrm_, op_, W, H, TS, off,
            isect.flatten_ids, isect.n_isects, max_range=512,
        )
        return (
            jnp.sum((c - tgt) ** 2) + 0.2 * jnp.sum(a)
            + jnp.sum((n - tgt_n) ** 2) + 0.05 * jnp.sum(dist)
        )

    def loss_pal(m2_, M_, feats_, nrm_, op_):
        c, a, n, dist, med, _ = rasterize_to_pixels_2dgs(
            m2_, M_.reshape(C, N, 9), feats_, nrm_, op_, W, H, radii, d,
            16384,
        )
        return (
            jnp.sum((c - tgt) ** 2) + 0.2 * jnp.sum(a)
            + jnp.sum((n - tgt_n) ** 2) + 0.05 * jnp.sum(dist)
        )

    args = (m2, M, feats, nrm, opb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means2d", "M", "feats", "normals", "opacities"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        scale = max(float(jnp.abs(gr).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gp).reshape(np.asarray(gr).shape), np.asarray(gr),
            atol=2e-3 * scale, err_msg=f"2dgs grad {name} mismatch",
        )


def test_rasterization_2dgs_end_to_end(scene):
    s = scene
    out = rasterization_2dgs(
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"], W, H, render_mode="RGB+ED",
    )
    render, alphas, normals, nfd, distort, median, meta = out
    assert render.shape == (2, H, W, 4)
    assert alphas.shape == (2, H, W, 1)
    assert normals.shape == (2, H, W, 3)
    assert nfd.shape == (2, H, W, 3)
    assert distort.shape == (2, H, W, 1)
    assert median.shape == (2, H, W, 1)
    assert not bool(meta["isect_overflow"])
    assert np.isfinite(np.asarray(render)).all()

    # full chain gradient (means -> projection2d -> rasterize)
    def loss(means, quats, scales):
        r, a, n, _, dist, _, _ = rasterization_2dgs(
            means, quats, scales, s["opacities"], s["colors"],
            s["viewmats"], s["Ks"], W, H, render_mode="RGB+ED",
        )
        return jnp.mean(r**2) + 0.01 * jnp.mean(dist)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        s["means"], s["quats"], s["scales"]
    )
    for gi in g:
        assert bool(jnp.isfinite(gi).all())
        assert float(jnp.abs(gi).max()) > 0


def test_densify_carrier(scene):
    s = scene
    C, N = 2, s["means"].shape[0]

    def loss(dens):
        r, *_ = rasterization_2dgs(
            s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
            s["viewmats"], s["Ks"], W, H, densify=dens,
        )
        return jnp.mean(r**2)

    g = jax.grad(loss)(jnp.zeros((C, N, 2)))
    assert g.shape == (C, N, 2)
    assert float(jnp.abs(g).max()) > 0
