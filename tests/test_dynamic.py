"""G-SHARP dynamic components: hexplane, deform net, table, regularizers.

Mirrors the reference's contrib/dynamic test intents: grid-sample
correctness vs torch, zero-init identity of the deform net, table
resize semantics, smoothness regularizer zeros on constant planes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gsplat_tpu.contrib.dynamic import (
    DeformationTable,
    DynamicStrategy,
    deform_network_apply,
    deform_network_init,
    grid_sample_2d,
    hexplane_apply,
    hexplane_init,
    hexplane_regularization,
    plane_smoothness,
    spatial_planes,
    temporal_planes,
    time_l1,
)


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    grid = rng.normal(size=(8, 16, 24)).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, (100, 2)).astype(np.float32)  # incl. border
    out = grid_sample_2d(jnp.asarray(grid), jnp.asarray(coords))
    t = F.grid_sample(
        torch.from_numpy(grid)[None],
        torch.from_numpy(coords)[None, None],
        align_corners=True, mode="bilinear", padding_mode="border",
    )[0, :, 0].T.numpy()
    np.testing.assert_allclose(np.asarray(out), t, atol=1e-5)


def test_hexplane_shapes_and_identity_time_planes():
    params = hexplane_init(jax.random.PRNGKey(0))
    assert params["feat_dim"] == 64  # 32 x 2 scales
    pts = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (50, 4)).astype(np.float32)
    )
    feats = hexplane_apply(params, pts)
    assert feats.shape == (50, 64)
    assert bool(jnp.isfinite(feats).all())
    # temporal planes initialize to ones
    for p in temporal_planes(params):
        assert float(jnp.abs(p - 1.0).max()) == 0.0
    assert len(spatial_planes(params)) == 6
    # ones-initialized temporal planes -> time_l1 == 0, smoothness == 0
    assert float(time_l1(temporal_planes(params))) == 0.0
    assert float(plane_smoothness(temporal_planes(params))) == 0.0
    assert float(hexplane_regularization(params)) > 0.0  # spatial planes random


def test_deform_net_zero_init_is_identity():
    params = deform_network_init(jax.random.PRNGKey(2), feature_dim=64)
    rng = np.random.default_rng(3)
    means = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(20, 4)).astype(np.float32))
    opac = jnp.asarray(rng.normal(size=(20, 1)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(20, 64)).astype(np.float32))
    m2, q2, o2 = deform_network_apply(
        params, means, quats, opac, jnp.zeros((20, 1)), feats
    )
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(means))
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(quats))
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(opac))

    # gradients flow into the heads (trunk learns through them)
    def loss(p):
        m, _, _ = deform_network_apply(p, means, quats, opac, None, feats)
        return (m**2).sum()

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["pos"]["w"]).sum()) > 0


def test_deformation_table_resize_semantics():
    t = DeformationTable(6)
    t.set_indices([1, 4])
    assert t.mask.sum() == 2
    t.duplicate([1, 2])  # appends flags of 1 (True) and 2 (False)
    assert len(t) == 8 and t.mask[6] and not t.mask[7]
    t.split([1], factor=2)  # removes idx 1, appends 2 True children
    assert len(t) == 9 and t.mask[-1] and t.mask[-2]
    keep = np.ones(9, bool); keep[0] = False
    t.prune(keep)
    assert len(t) == 8


def test_dynamic_strategy_mask_follows_topology():
    """dynamic_mask rows follow duplicate/split edits (children inherit)."""
    strat = DynamicStrategy(
        refine_start_iter=0, refine_stop_iter=100, refine_every=1,
        grow_grad2d=1e-9, sidecar_state_keys=("dynamic_mask",),
    )
    cap = 32
    n = 8
    rng = np.random.default_rng(4)
    params = dict(
        means=jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32)),
        quats=jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32)),
        scales=jnp.asarray(np.log(rng.uniform(0.001, 0.002, (cap, 3))).astype(np.float32)),
        opacities=jnp.asarray(np.full(cap, 2.0, np.float32)),
    )
    alive = jnp.asarray(np.arange(cap) < n)
    state = strat.initialize_state(cap)
    state["dynamic_mask"] = state["dynamic_mask"].at[:4].set(True)
    # every alive gaussian has high grads -> all duplicate (small scales)
    state["grad2d"] = jnp.where(alive, 1.0, 0.0)
    state["count"] = jnp.ones(cap)
    moments = (jax.tree.map(jnp.zeros_like, params),)
    params2, _, alive2, state2 = strat.refine(
        params, moments, alive, state, step=10, key=jax.random.PRNGKey(0)
    )
    m = np.asarray(state2["dynamic_mask"])
    a2 = np.asarray(alive2)
    assert a2.sum() == 2 * n  # all duplicated
    # the 8 new slots inherit flags of parents 0..7 => 4 True among them
    assert m[:4].all() and not m[4:8].any()
    assert m[n : n + 4].all() and not m[n + 4 : 2 * n].any()
