"""Strategy ops + MCMC/Default strategies on capacity-padded arrays."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.optimizers import AdamState, adam_init, selective_adam_update
from gsplat_tpu.strategy import DefaultStrategy, MCMCStrategy, ops

CAP = 64


@pytest.fixture()
def setup():
    rng = np.random.default_rng(0)
    n_alive = 40
    params = {
        "means": jnp.asarray(rng.standard_normal((CAP, 3)).astype(np.float32)),
        "quats": jnp.asarray(rng.standard_normal((CAP, 4)).astype(np.float32)),
        "scales": jnp.asarray(
            np.log(rng.random((CAP, 3)) * 0.05 + 0.01).astype(np.float32)
        ),
        "opacities": jnp.asarray(
            (rng.random(CAP) * 4 - 2).astype(np.float32)
        ),
    }
    alive = jnp.asarray(np.arange(CAP) < n_alive)
    opt = adam_init(params)
    moments = (opt.mu, opt.nu)
    return params, moments, alive


def test_duplicate(setup):
    params, moments, alive = setup
    mask = jnp.zeros(CAP, bool).at[jnp.asarray([1, 5, 7])].set(True)
    p2, m2, a2 = ops.duplicate(params, moments, alive, mask)
    assert int(a2.sum()) == int(alive.sum()) + 3
    # new slots contain copies of 1, 5, 7
    new = np.where(np.asarray(a2) & ~np.asarray(alive))[0]
    src = [1, 5, 7]
    for d, s in zip(sorted(new), src):
        np.testing.assert_array_equal(
            np.asarray(p2["means"][d]), np.asarray(params["means"][s])
        )


def test_split(setup):
    params, moments, alive = setup
    mask = jnp.zeros(CAP, bool).at[jnp.asarray([2, 3])].set(True)
    key = jax.random.PRNGKey(0)
    p2, m2, a2 = ops.split(params, moments, alive, mask, key)
    assert int(a2.sum()) == int(alive.sum()) + 2
    # original slots keep position near the original (sampled from gaussian)
    d = np.asarray(p2["means"][2]) - np.asarray(params["means"][2])
    scale = np.exp(np.asarray(params["scales"][2])).max()
    assert np.linalg.norm(d) < 10 * scale + 1e-3
    # scales shrank by 1.6
    np.testing.assert_allclose(
        np.asarray(p2["scales"][2]),
        np.asarray(params["scales"][2]) - math.log(1.6),
        atol=1e-5,
    )
    # untouched gaussians unchanged
    np.testing.assert_array_equal(
        np.asarray(p2["means"][10]), np.asarray(params["means"][10])
    )


def test_remove_and_reset(setup):
    params, moments, alive = setup
    mask = jnp.zeros(CAP, bool).at[0].set(True)
    a2 = ops.remove(alive, mask)
    assert not bool(a2[0]) and int(a2.sum()) == int(alive.sum()) - 1

    p2, m2 = ops.reset_opa(params, moments, 0.01)
    lim = math.log(0.01 / 0.99)
    assert float(p2["opacities"].max()) <= lim + 1e-5
    assert float(jnp.abs(m2[0]["opacities"]).max()) == 0.0


def test_compute_relocation_matches_scalar():
    """Vectorized Eq.9 vs a direct double-sum transcription."""
    binoms = ops.make_binoms(51)
    op = jnp.asarray([0.9, 0.5, 0.05])
    sc = jnp.asarray([[0.1, 0.2, 0.3]] * 3)
    ratios = jnp.asarray([1, 3, 7], jnp.int32)
    new_op, new_sc = ops.compute_relocation(op, sc, ratios, binoms)
    b = np.asarray(binoms)
    for i, (o, n) in enumerate(zip(np.asarray(op), np.asarray(ratios))):
        no = 1.0 - (1.0 - o) ** (1.0 / n)
        no = min(max(no, 0.005), 1.0 - np.finfo(np.float32).eps)
        denom = 0.0
        for ii in range(1, n + 1):
            for k in range(ii):
                denom += b[ii - 1, k] * ((-1) ** k / np.sqrt(k + 1)) * no ** (k + 1)
        np.testing.assert_allclose(float(new_op[i]), no, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_sc[i]), (o / denom) * np.asarray(sc[i]), rtol=1e-4
        )


def test_mcmc_refine_and_noise(setup):
    params, moments, alive = setup
    # make some gaussians dead (opacity below threshold)
    params = dict(params)
    params["opacities"] = params["opacities"].at[:5].set(-8.0)  # ~0.0003
    strat = MCMCStrategy(cap_max=CAP, refine_every=1)
    state = strat.initialize_state()
    key = jax.random.PRNGKey(1)
    p2, m2, a2 = strat.refine(params, moments, alive, state, key)
    # dead ones got relocated: opacity raised above min
    assert float(jax.nn.sigmoid(p2["opacities"][np.arange(5)]).min()) >= 0.005 - 1e-6
    # grew by ~5% (clamped by capacity)
    assert int(a2.sum()) >= int(alive.sum())

    p3 = strat.inject_noise(p2, a2, jax.random.PRNGKey(2), lr_means=1e-5)
    moved = np.abs(np.asarray(p3["means"]) - np.asarray(p2["means"])).sum(-1)
    assert (moved[np.asarray(a2)] >= 0).all()
    assert (moved[~np.asarray(a2)] == 0).all()


def test_default_strategy_flow(setup):
    params, moments, alive = setup
    strat = DefaultStrategy(
        refine_start_iter=0, grow_grad2d=0.1, grow_scale3d=10.0
    )
    state = strat.initialize_state(CAP, scene_scale=1.0)
    C = 2
    grads = jnp.zeros((C, CAP, 2)).at[:, 4, :].set(0.5)
    radii = jnp.zeros((C, CAP, 2), jnp.int32).at[:, :45, :].set(3)
    state = strat.update_state(state, grads, radii, 64, 48, C)
    assert float(state["count"][4]) == 2.0
    assert float(state["grad2d"][4]) > 0

    p2, m2, a2, s2 = strat.refine(
        params, moments, alive, state, step=100, key=jax.random.PRNGKey(0)
    )
    # gaussian 4 had high grad + small scale => duplicated
    assert int(a2.sum()) >= int(alive.sum())
    assert float(s2["grad2d"].sum()) == 0.0  # stats reset


def test_selective_adam_visibility(setup):
    params, _, alive = setup
    state = adam_init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    vis = jnp.zeros(CAP, bool).at[:10].set(True)
    lrs = {k: 1e-2 for k in params}
    p2, s2 = selective_adam_update(params, grads, state, lrs, visibility=vis)
    ch = np.abs(np.asarray(p2["means"]) - np.asarray(params["means"])).sum(-1)
    assert (ch[:10] > 0).all()
    assert (ch[10:] == 0).all()
    # moments untouched for invisible
    assert float(jnp.abs(s2.mu["means"][10:]).max()) == 0.0
