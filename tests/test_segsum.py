"""Unit tests for the Pallas segmented row-sum kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.segsum_pallas import PIECE, SEG, segment_rowsum


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("E", [7, 513, 1500])
def test_segment_rowsum_matches_numpy(seed, E):
    rng = np.random.default_rng(seed)
    F, live = 16, 11
    # segment lengths incl. empties and one huge run (> several pieces)
    lens = rng.integers(0, 9, size=E)
    lens[rng.integers(0, E)] = 3 * PIECE + 17
    bounds = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    P = int(bounds[-1])
    P_pad = P + 2 * PIECE
    data = rng.normal(size=(F, P_pad)).astype(np.float32)
    # garbage (incl. NaN) beyond the live stream must not leak in
    data[:, P:] = np.nan

    n_out = -(-E // SEG) * SEG
    out = segment_rowsum(
        jnp.asarray(data), jnp.asarray(bounds), n_out=n_out, live_rows=live
    )
    out = np.asarray(out)

    ref = np.zeros((F, E), np.float32)
    for g in range(E):
        ref[:live, g] = data[:live, bounds[g] : bounds[g + 1]].sum(axis=1)
    np.testing.assert_allclose(out[:, :E], ref, rtol=2e-5, atol=2e-4)
    assert np.all(out[live:] == 0.0)
    assert np.all(np.isfinite(out))


def test_segment_rowsum_all_empty():
    E = 100
    bounds = jnp.zeros((E + 1,), jnp.int32)
    data = jnp.full((8, 2 * PIECE), jnp.nan, jnp.float32)
    out = segment_rowsum(data, bounds, n_out=SEG, live_rows=8)
    assert np.all(np.asarray(out) == 0.0)
