"""Tile intersection vs a brute-force python-loop oracle (reference semantics:
gsplat/cuda/_torch_impl.py:_isect_tiles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.isect import (
    build_tile_worklist,
    isect_offset_encode,
    isect_tiles,
)


def _brute_force_isect(means2d, radii, depths, tile_size, tile_width, tile_height):
    """Python-loop oracle: emits (tile_key, depth, flatten_id) gaussian-major,
    then stable-sorts by (tile_key, depth)."""
    I, N = means2d.shape[:2]
    n_tiles = tile_width * tile_height
    entries = []
    for i in range(I):
        for n in range(N):
            r = radii[i, n]
            if r[0] <= 0 or r[1] <= 0:
                continue
            tmin = np.floor(means2d[i, n] / tile_size - r / tile_size).astype(int)
            tmax = np.ceil(means2d[i, n] / tile_size + r / tile_size).astype(int)
            x0, x1 = np.clip([tmin[0], tmax[0]], 0, tile_width)
            y0, y1 = np.clip([tmin[1], tmax[1]], 0, tile_height)
            for y in range(y0, y1):
                for x in range(x0, x1):
                    entries.append(
                        (i * n_tiles + y * tile_width + x, depths[i, n], i * N + n)
                    )
    order = sorted(range(len(entries)), key=lambda k: (entries[k][0], entries[k][1], k))
    return [entries[k] for k in order]


@pytest.fixture(scope="module")
def scene2d():
    rng = np.random.default_rng(0)
    I, N = 2, 300
    W, H, ts = 64, 48, 16
    tw, th = (W + ts - 1) // ts, (H + ts - 1) // ts
    means2d = rng.uniform(-10, 74, (I, N, 2)).astype(np.float32)
    radii = rng.integers(0, 12, (I, N, 2)).astype(np.int32)
    depths = (rng.random((I, N)) * 10 + 0.1).astype(np.float32)
    return means2d, radii, depths, ts, tw, th


def test_isect_tiles_matches_brute_force(scene2d):
    means2d, radii, depths, ts, tw, th = scene2d
    ref = _brute_force_isect(means2d, radii, depths, ts, tw, th)
    n_ref = len(ref)

    out = isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        ts, tw, th, capacity=4096,
    )
    assert int(out.n_isects) == n_ref
    assert not bool(out.overflow)
    keys = np.asarray(out.tile_keys)[:n_ref]
    deps = np.asarray(out.depth_keys)[:n_ref]
    fids = np.asarray(out.flatten_ids)[:n_ref]
    ref_keys = np.array([e[0] for e in ref])
    ref_deps = np.array([e[1] for e in ref])
    ref_fids = np.array([e[2] for e in ref])
    np.testing.assert_array_equal(keys, ref_keys)
    np.testing.assert_allclose(deps, ref_deps, rtol=0, atol=0)
    np.testing.assert_array_equal(fids, ref_fids)
    # padding is sentinel
    assert (np.asarray(out.tile_keys)[n_ref:] == 2 * tw * th).all()

    # tiles_per_gauss matches
    tpg = np.asarray(out.tiles_per_gauss)
    I, N = means2d.shape[:2]
    ref_tpg = np.zeros((I, N), np.int32)
    for k, _, f in ref:
        ref_tpg[f // N, f % N] += 1
    np.testing.assert_array_equal(tpg, ref_tpg)


def test_isect_offsets(scene2d):
    means2d, radii, depths, ts, tw, th = scene2d
    I = means2d.shape[0]
    out = isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        ts, tw, th, capacity=4096,
    )
    offsets = np.asarray(isect_offset_encode(out.tile_keys, I, tw, th))
    assert offsets.shape == (I, th, tw)
    keys = np.asarray(out.tile_keys)
    n = int(out.n_isects)
    flat = offsets.reshape(-1)
    bounds = np.concatenate([flat, [n]])
    for t in range(I * th * tw):
        seg = keys[bounds[t] : bounds[t + 1]]
        assert (seg == t).all(), f"tile {t} segment mismatch"


def test_overflow_flag(scene2d):
    means2d, radii, depths, ts, tw, th = scene2d
    out = isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        ts, tw, th, capacity=16,
    )
    assert bool(out.overflow)


def test_worklist_alignment(scene2d):
    means2d, radii, depths, ts, tw, th = scene2d
    I = means2d.shape[0]
    chunk = 8
    out = isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        ts, tw, th, capacity=4096,
    )
    wl = build_tile_worklist(out.tile_keys, I * tw * th, chunk)
    src = np.asarray(wl.src_idx)
    valid = np.asarray(wl.valid)
    starts = np.asarray(wl.tile_starts)
    counts = np.asarray(wl.tile_counts)
    cstarts = np.asarray(wl.chunk_starts)
    nchunks = np.asarray(wl.n_chunks)
    keys = np.asarray(out.tile_keys)

    assert counts.sum() == int(out.n_isects)
    np.testing.assert_array_equal(nchunks, (counts + chunk - 1) // chunk)
    # each tile's aligned span reproduces its sorted range, padded to chunk
    for t in range(I * tw * th):
        a0 = cstarts[t] * chunk
        span = nchunks[t] * chunk
        v = valid[a0 : a0 + span]
        s = src[a0 : a0 + span]
        assert v[: counts[t]].all()
        assert not v[counts[t] :].any()
        np.testing.assert_array_equal(
            s[: counts[t]], np.arange(starts[t], starts[t] + counts[t])
        )
        if counts[t]:
            assert (keys[s[: counts[t]]] == t).all()
    # per-gaussian emission runs partition the live entries
    n = int(out.n_isects)
    cnt = np.asarray(out.tiles_per_gauss).reshape(-1)
    assert cnt.sum() == n
