"""PLAS-style self-organizing 2D grid sort (jnp, TPU/CPU).

Role parity with the reference's PLAS dependency
(`/root/reference/gsplat/compression/sort.py:22-63`, fraunhoferhhi/PLAS):
arrange high-dimensional splat attribute vectors on a 2D grid so that
NEIGHBORING grid cells hold similar vectors — PNG's Paeth/Up/Sub predictors
then code small residuals, shrinking the compressed bytes.  The reference
sorts the concatenated (means, quats, scales, opacities, sh0) vectors; so
does this.

Algorithm (the PLAS recipe, re-formulated for SIMD/vector hardware instead
of CUDA block-parallel assignment solving): coarse-to-fine annealed pair
swaps against a blurred target field.

  for scale in [S/2, S/4, ..., 1]:
    repeat a few times:
      target = box-blur(grid, radius ~ scale)     # the "organized" field
      pair cells at offset `scale` along a random axis with random parity
      swap each pair iff it lowers  sum |cell - target|^2

Pair swaps against a blurred target are exactly the 2-cell linear
assignment problem (PLAS solves small LAPs per block; 2-cell LAP = one
compare), and the annealed scale schedule is PLAS's multi-resolution
hierarchy.  Everything is jit-compiled elementwise/reduce work — no
gathers, no sorts — so it runs at memory speed on TPU and acceptably on
CPU for test sizes.
"""

from __future__ import annotations

import functools

import numpy as np


def _blur(grid, radius: int):
    """Separable box blur with edge clamping: [S, S, F] -> [S, S, F]."""
    import jax.numpy as jnp

    S = grid.shape[0]
    r = max(int(radius), 1)
    # cumulative-sum box filter along each axis (O(S) per axis)
    def box1d(x, axis):
        pad_lo = jnp.repeat(jnp.take(x, jnp.array([0]), axis=axis), r, axis)
        pad_hi = jnp.repeat(jnp.take(x, jnp.array([S - 1]), axis=axis), r, axis)
        xp = jnp.concatenate([pad_lo, x, pad_hi], axis=axis)
        cs = jnp.cumsum(xp, axis=axis)
        zeros = jnp.zeros_like(jnp.take(cs, jnp.array([0]), axis=axis))
        cs = jnp.concatenate([zeros, cs], axis=axis)
        hi = jax_take_range(cs, 2 * r + 1, S, axis)
        lo = jax_take_range(cs, 0, S, axis)
        return (hi - lo) / (2 * r + 1)

    return box1d(box1d(grid, 0), 1)


def jax_take_range(x, start, size, axis):
    import jax.lax as lax

    idx = [0] * x.ndim
    sizes = list(x.shape)
    idx[axis] = start
    sizes[axis] = size
    return lax.dynamic_slice(x, idx, sizes)


def plas_sort_indices(
    params: np.ndarray,  # [N, F] attribute vectors, N == n_sidelen**2
    n_sidelen: int,
    iters_per_scale: int = 8,
    seed: int = 0,
    normalize: bool = True,
    init_order: np.ndarray = None,  # optional warm-start permutation
) -> np.ndarray:
    """Return a permutation of [0, N) arranging rows on an organized grid.

    The permutation maps grid position -> source row (apply as
    `params[perm]`), matching `sort_with_plas`'s sorted_indices contract
    (reference sort.py:57-61).
    """
    import jax
    import jax.numpy as jnp

    # Host-side utility (like the rest of PngCompression): pin to the CPU
    # backend — the ~2 jit specializations per annealed scale would each pay
    # the remote-TPU compile round-trip otherwise.
    cpu = jax.devices("cpu")[0]

    N, F = params.shape
    S = n_sidelen
    assert N == S * S, (N, S)
    p = params.astype(np.float32)
    if normalize:
        # normalize per attribute so no channel dominates the distance
        # (callers may pre-weight channels and pass normalize=False)
        mins = p.min(axis=0)
        maxs = p.max(axis=0)
        p = (p - mins) / np.where(maxs - mins == 0, 1, maxs - mins)

    base = np.arange(N, dtype=np.int32) if init_order is None else (
        np.asarray(init_order, np.int32)
    )
    with jax.default_device(cpu):
        local = _plas_loop(p[base], S, N, F, iters_per_scale, seed)
    return base[local]


def _plas_loop(p, S, N, F, iters_per_scale, seed):
    import jax
    import jax.numpy as jnp

    grid = jnp.asarray(p.reshape(S, S, F))
    idx = jnp.arange(N, dtype=jnp.int32).reshape(S, S)

    @functools.partial(jax.jit, static_argnames=("offset", "axis", "radius"))
    def sweep(grid, idx, parity, offset: int, axis: int, radius: int):
        """One annealed pair-swap sweep at the given offset/axis."""
        target = _blur(grid, radius)
        # pair cell i with cell i+offset along `axis`, pairs anchored at
        # (parity * offset) so successive sweeps cover both pairings
        S_ = grid.shape[0]
        coord = jnp.arange(S_)
        # block id along the axis: cells with the same block id and
        # adjacent sub-position form a pair
        k = (coord + parity * offset) // offset
        is_lead = (k % 2) == 0
        partner = jnp.where(is_lead, coord + offset, coord - offset)
        valid = (partner >= 0) & (partner < S_)
        partner_c = jnp.clip(partner, 0, S_ - 1)

        def take(arr, pos):
            return jnp.take(arr, pos, axis=axis)

        g_par = take(grid, partner_c)
        i_par = take(idx, partner_c)
        t_own = target
        t_par = take(target, partner_c)

        d_now = jnp.sum((grid - t_own) ** 2, -1) + jnp.sum(
            (g_par - t_par) ** 2, -1
        )
        d_swp = jnp.sum((g_par - t_own) ** 2, -1) + jnp.sum(
            (grid - t_par) ** 2, -1
        )
        do = (d_swp < d_now) & valid.reshape(
            (S_, 1) if axis == 0 else (1, S_)
        )
        new_grid = jnp.where(do[..., None], g_par, grid)
        new_idx = jnp.where(do, i_par, idx)
        return new_grid, new_idx

    rng = np.random.default_rng(seed)
    scale = S // 2
    while scale >= 1:
        radius = max(scale // 2, 1)
        # cover all four (axis, parity) pairings each round, in a
        # randomized order (deterministic coverage converges much faster
        # than random draws, which can starve a pairing for many sweeps)
        for _ in range(max(iters_per_scale // 4, 1)):
            pairings = [(a, p) for a in (0, 1) for p in (0, 1)]
            rng.shuffle(pairings)
            for axis, parity in pairings:
                grid, idx = sweep(
                    grid, idx, parity, offset=int(scale), axis=axis,
                    radius=int(radius),
                )
        scale //= 2
    return np.asarray(idx).reshape(-1)
