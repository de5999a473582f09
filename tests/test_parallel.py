"""Sharded rendering on an 8-device CPU mesh vs single-device rasterization.

The TPU analog of the reference's distributed tests (gsplat world_size==1
identity-collective CI plus tests/_test_distributed.py real collectives):
here a real 8-way shard_map over virtual CPU devices must be numerically
identical to the single-device pipeline — forward AND gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gsplat_tpu.parallel import rasterization_sharded
from gsplat_tpu.rendering import rasterization

# Sized for a ONE-core host running virtual devices in interpret mode:
# 2x1 tiles x C cameras x `devs` shards already exercises every code path
# (multi-tile spans, ragged exchange, per-camera shards); doubling the
# resolution was measured at ~3x the wall time with no added coverage.
#
# Round-5 perf note: rasterization_sharded's shard_map is now jitted in
# the library (an eager shard_map dispatches every primitive per-shard
# with its own mini-compile — ~45 s per CALL on this mesh; jitted it is
# ~2 s after one cached compile), which took this module from 973 s to
# under 2 minutes at the full 8-way config.
W, H = 32, 16

CONFIGS = {
    "mesh8": dict(devs=8, N=96, C=8),
}


@pytest.fixture(scope="module", params=["mesh8"])
def cfg(request):
    return CONFIGS[request.param]


@pytest.fixture(scope="module")
def mesh(cfg):
    devs = np.array(jax.devices()[: cfg["devs"]])
    return Mesh(devs, ("gs",))


@pytest.fixture(scope="module")
def scene(cfg):
    rng = np.random.default_rng(11)
    N, C = cfg["N"], cfg["C"]  # both divisible by the mesh axis
    means = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2, 8, N)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.4 + 0.05).astype(np.float32)
    opacities = rng.random(N).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    sh = (rng.standard_normal((N, 9, 3)) * 0.3).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, :3, 3] = rng.uniform(-0.5, 0.5, (C, 3)).astype(np.float32)
    Ks = np.tile(
        np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    return {
        k: jnp.asarray(v)
        for k, v in dict(
            means=means, quats=quats, scales=scales, opacities=opacities,
            colors=colors, sh=sh, viewmats=viewmats, Ks=Ks,
        ).items()
    }


def test_sharded_matches_single_device(mesh, scene):
    s = scene
    ref_c, ref_a, _ = rasterization(
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"], W, H,
    )
    out_c, out_a, meta = rasterization_sharded(
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"], W, H, mesh=mesh,
    )
    assert not bool(np.asarray(meta["isect_overflow"]).any())
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a), atol=3e-5)


def test_sharded_sh_and_depth(mesh, scene):
    s = scene
    ref_c, _, _ = rasterization(
        s["means"], s["quats"], s["scales"], s["opacities"], s["sh"],
        s["viewmats"], s["Ks"], W, H, sh_degree=2, render_mode="RGB+ED",
    )
    out_c, _, _ = rasterization_sharded(
        s["means"], s["quats"], s["scales"], s["opacities"], s["sh"],
        s["viewmats"], s["Ks"], W, H, mesh=mesh, sh_degree=2,
        render_mode="RGB+ED",
    )
    # atol covers the ED channel (depth/alpha division at depth ~2-8
    # amplifies f32 association differences between the jitted shard_map
    # fusion and the single-device program to ~2e-5 relative)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c), atol=3e-4)


def test_sharded_gradients_match(mesh, scene):
    s = scene
    C = s["viewmats"].shape[0]
    tgt = jnp.asarray(
        np.random.default_rng(4).random((C, H, W, 3)).astype(np.float32)
    )

    def loss_single(means, quats, scales, opacities, colors):
        c, _, _ = rasterization(
            means, quats, scales, opacities, colors, s["viewmats"], s["Ks"],
            W, H,
        )
        return jnp.mean((c - tgt) ** 2)

    def loss_sharded(means, quats, scales, opacities, colors):
        c, _, _ = rasterization_sharded(
            means, quats, scales, opacities, colors, s["viewmats"], s["Ks"],
            W, H, mesh=mesh,
        )
        return jnp.mean((c - tgt) ** 2)

    args = (s["means"], s["quats"], s["scales"], s["opacities"], s["colors"])
    g_ref = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    g_out = jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4))(*args)
    for gr, go in zip(g_ref, g_out):
        scale = max(float(jnp.abs(gr).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(go), np.asarray(gr), atol=5e-4 * scale
        )


def test_sharded_screen_grads(mesh, scene):
    """means2d_offset cotangent matches the single-device screen grads."""
    s = scene
    C, N = s["viewmats"].shape[0], s["means"].shape[0]
    tgt = jnp.asarray(
        np.random.default_rng(4).random((C, H, W, 3)).astype(np.float32)
    )

    def loss_sharded(off):
        c, _, _ = rasterization_sharded(
            s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
            s["viewmats"], s["Ks"], W, H, mesh=mesh, means2d_offset=off,
        )
        return jnp.mean((c - tgt) ** 2)

    def loss_single(off):
        c, _, _ = rasterization(
            s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
            s["viewmats"], s["Ks"], W, H, means2d_offset=off,
        )
        return jnp.mean((c - tgt) ** 2)

    g_out = jax.grad(loss_sharded)(jnp.zeros((C, N, 2)))
    g_ref = jax.grad(loss_single)(jnp.zeros((C, N, 2)))
    scale = max(float(jnp.abs(g_ref).max()), 1e-6)
    np.testing.assert_allclose(
        np.asarray(g_out), np.asarray(g_ref), atol=5e-4 * scale
    )


def test_packed_exchange_matches_dense(mesh, scene):
    """The count-routed ragged splat exchange must match the dense
    exchange exactly — forward and gradients (reference packed path,
    DistributedCollectives.cpp:343-409)."""
    s = scene
    ref_c, ref_a, _ = rasterization_sharded(
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"], W, H, mesh=mesh,
    )
    out_c, out_a, meta = rasterization_sharded(
        s["means"], s["quats"], s["scales"], s["opacities"], s["colors"],
        s["viewmats"], s["Ks"], W, H, mesh=mesh,
        packed=True, packed_capacity=4096,
    )
    assert not bool(np.asarray(meta["isect_overflow"]).any())
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a), atol=3e-5)

    tgt = jnp.asarray(
        np.random.default_rng(5).random((s["viewmats"].shape[0], H, W, 3))
        .astype(np.float32)
    )

    def loss_packed(means, colors):
        c, _, _ = rasterization_sharded(
            means, s["quats"], s["scales"], s["opacities"], colors,
            s["viewmats"], s["Ks"], W, H, mesh=mesh,
            packed=True, packed_capacity=4096,
        )
        return jnp.mean((c - tgt) ** 2)

    def loss_single(means, colors):
        # single-device reference: the dense-sharded grads are already
        # pinned to this by test_sharded_gradients_match, and one
        # single-device grad costs ~devs*C fewer serial camera-renders
        # than a sharded grad on the virtual CPU mesh
        c, _, _ = rasterization(
            means, s["quats"], s["scales"], s["opacities"], colors,
            s["viewmats"], s["Ks"], W, H,
        )
        return jnp.mean((c - tgt) ** 2)

    g_ref = jax.grad(loss_single, argnums=(0, 1))(s["means"], s["colors"])
    g_out = jax.grad(loss_packed, argnums=(0, 1))(s["means"], s["colors"])
    for gr, go in zip(g_ref, g_out):
        scale = max(float(jnp.abs(gr).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(go), np.asarray(gr), atol=5e-4 * scale
        )
