"""Topology operations on capacity-padded gaussian parameter pytrees.

TPU-native redesign of gsplat/strategy/ops.py: where the reference resizes
tensors (torch.cat / boolean indexing) and surgically edits torch.optim
state (`_update_param_with_optimizer`, ops.py:96), here every array has a
STATIC capacity and an `alive` mask; "adding" gaussians writes into free
slots and "removing" clears mask bits — no re-jits, no reallocation. The
parameter/optimizer-state contract matches the reference exactly:
slots that receive new gaussians get zeroed Adam moments
(ops.py:duplicate/split/relocate optimizer_fn => zeros).

All functions are pure and jittable; masks may select any data-dependent
number of gaussians. When free capacity runs out, excess additions are
dropped (the analog of MCMC's cap_max clamp).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.math import quat_to_rotmat

# MCMC noise-gate defaults (reference: gsplat/strategy/ops.py
# DEFAULT_MCMC_OPACITY_{T,K} used by inject_noise_to_position :463)
DEFAULT_MCMC_OPACITY_T = 0.005
DEFAULT_MCMC_OPACITY_K = 100.0


def _tree_write(params: Any, dst: jax.Array, src: jax.Array) -> Any:
    """params[dst] = params[src] for every leaf (out-of-range dst dropped)."""
    return jax.tree.map(
        lambda p: p.at[dst].set(p[src], mode="drop"), params
    )


def _tree_zero_at(tree: Any, idx: jax.Array) -> Any:
    """tree[idx] = 0 for every leaf (out-of-range idx dropped)."""
    return jax.tree.map(
        lambda v: v.at[idx].set(jnp.zeros_like(v[idx]), mode="drop"), tree
    )


def _ranked_pairs(
    mask: jax.Array, free: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pair the k-th masked slot with the k-th free slot.

    Returns (dst, src, n): for k < n, params[dst[k]] should be written from
    src[k]; for k >= n both index out of range (cap) so scatters drop them.
    """
    cap = mask.shape[0]
    sel_pos = jnp.nonzero(mask, size=cap, fill_value=cap)[0]
    free_pos = jnp.nonzero(free, size=cap, fill_value=cap)[0]
    n = jnp.minimum(jnp.sum(mask), jnp.sum(free))
    k = jnp.arange(cap)
    dst = jnp.where(k < n, free_pos, cap).astype(jnp.int32)
    src = jnp.where(k < n, sel_pos, cap).astype(jnp.int32)
    return dst, src, n


def duplicate(
    params: Dict[str, jax.Array],
    opt_moments: Any,  # pytree(s) shaped like params (e.g. (mu, nu))
    alive: jax.Array,  # [cap] bool
    mask: jax.Array,  # [cap] bool — gaussians to duplicate (subset of alive)
    extra: Any = None,  # optional per-gaussian sidecar pytree ([cap, ...])
):
    """Copy masked gaussians into free slots. Parity: ops.py:duplicate (:141).

    New slots get zeroed optimizer moments (reference optimizer_fn).
    `extra` rows are copied parent->child (e.g. DynamicStrategy's
    dynamic_mask — children inherit the parent flag).
    """
    dst, src, _ = _ranked_pairs(mask & alive, ~alive)
    params = _tree_write(params, dst, src)
    opt_moments = _tree_zero_at(opt_moments, dst)
    alive = alive.at[dst].set(True, mode="drop")
    if extra is not None:
        extra = _tree_write(extra, dst, src)
        return params, opt_moments, alive, extra
    return params, opt_moments, alive


def split(
    params: Dict[str, jax.Array],
    opt_moments: Any,
    alive: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    revised_opacity: bool = False,
    extra: Any = None,  # optional per-gaussian sidecar pytree ([cap, ...])
    sample_axes: Tuple[int, ...] = (0, 1, 2),
):
    """Split masked gaussians into two samples. Parity: ops.py:split (:175).

    The reference removes the original and appends two sampled copies; here
    sample 0 overwrites the original slot and sample 1 goes to a free slot.
    Both positions are drawn from the gaussian (mean + R S n), scales
    shrink by 1.6 in log space, and both slots' optimizer moments reset.

    `sample_axes` restricts the position sampling to a subset of the local
    frame's axes.  Surfel (2DGS) models pass (0, 1): their normal-axis
    scale never receives a render gradient (the rasterizer only uses the
    two tangent axes), so it stays frozen at its init value — an isolated
    init point with a huge knn scale would otherwise fling split children
    hundreds of units along the normal (observed in the round-4 garden
    2DGS run: children at radius ~184 with s_z ~ e^5.3).
    """
    cap = alive.shape[0]
    mask = mask & alive
    dst, src, _ = _ranked_pairs(mask, ~alive)

    scales = jnp.exp(params["scales"])  # [cap, 3]
    if tuple(sample_axes) != (0, 1, 2):
        axes_mask = jnp.asarray(
            [1.0 if i in tuple(sample_axes) else 0.0 for i in range(3)],
            scales.dtype,
        )
        scales = scales * axes_mask
    R = quat_to_rotmat(params["quats"])  # [cap, 3, 3]
    noise = jax.random.normal(key, (2, cap, 3), params["means"].dtype)
    samples = jnp.einsum(
        "nij,nj,bnj->bni", R, scales, noise, precision="highest"
    )  # [2, cap, 3]

    new_scales = params["scales"] - math.log(1.6)
    new_op = params["opacities"]
    if revised_opacity:
        # arXiv:2404.06109: o' = 1 - sqrt(1 - o)
        o = jax.nn.sigmoid(params["opacities"])
        new_op = jax.scipy.special.logit(
            jnp.clip(1.0 - jnp.sqrt(1.0 - o), 1e-7, 1.0 - 1e-7)
        )

    # sample 0 overwrites the original slot (masked in place)
    p0 = dict(params)
    p0["means"] = jnp.where(
        mask[:, None], params["means"] + samples[0], params["means"]
    )
    p0["scales"] = jnp.where(mask[:, None], new_scales, params["scales"])
    p0["opacities"] = jnp.where(mask, new_op, params["opacities"])

    # sample 1 goes to the paired free slot, copied from the updated p0
    # but with its own position sample
    p1_src = dict(p0)
    p1_src["means"] = jnp.where(
        mask[:, None], params["means"] + samples[1], params["means"]
    )
    params = jax.tree.map(
        lambda pa, pb: pa.at[dst].set(pb[src], mode="drop"), p0, p1_src
    )

    # zero moments for both the rewritten originals and the new slots
    sel_idx = jnp.where(mask, jnp.arange(cap), cap).astype(jnp.int32)
    opt_moments = _tree_zero_at(opt_moments, sel_idx)
    opt_moments = _tree_zero_at(opt_moments, dst)
    alive = alive.at[dst].set(True, mode="drop")
    if extra is not None:
        extra = _tree_write(extra, dst, src)  # children inherit parent rows
        return params, opt_moments, alive, extra
    return params, opt_moments, alive


def remove(
    alive: jax.Array, mask: jax.Array
) -> jax.Array:
    """Deactivate masked gaussians. Parity: ops.py:remove (:238).

    Only the mask changes; freed slots are rewritten (and their moments
    zeroed) when reused.
    """
    return alive & ~mask


def reset_opa(
    params: Dict[str, jax.Array],
    opt_moments: Any,
    value: float,
) -> Tuple[Dict[str, jax.Array], Any]:
    """Clamp opacities to at most logit(value); zero their moments.

    Parity: ops.py:reset_opa (:271).
    """
    limit = math.log(value / (1.0 - value))
    params = dict(params)
    params["opacities"] = jnp.minimum(params["opacities"], limit)
    opt_moments = jax.tree.map(
        lambda m: {
            **m, "opacities": jnp.zeros_like(m["opacities"])
        } if isinstance(m, dict) else m,
        opt_moments,
        is_leaf=lambda x: isinstance(x, dict),
    )
    return params, opt_moments


def make_binoms(n_max: int = 51) -> jnp.ndarray:
    """Binomial coefficient table C(n, k). Parity: mcmc.py:93-100."""
    import numpy as np

    b = np.zeros((n_max, n_max), np.float32)
    for n in range(n_max):
        for k in range(n + 1):
            b[n, k] = math.comb(n, k)
    return jnp.asarray(b)


def compute_relocation(
    opacities: jax.Array,  # [cap] (post-sigmoid)
    scales: jax.Array,  # [cap, 3] (post-exp)
    ratios: jax.Array,  # [cap] int32 (sample multiplicities, >= 1)
    binoms: jax.Array,  # [n_max, n_max]
    min_opacity: float = 0.005,
) -> Tuple[jax.Array, jax.Array]:
    """MCMC relocation (Eq. 9 of arXiv:2404.09591).

    Parity: cuda/csrc/RelocationCUDA.cu:36-79 with the same
    clamp-before-scale deviation. The double sum collapses via the
    hockey-stick identity: denom(n) = sum_k C(n, k+1) (-1)^k/sqrt(k+1)
    o'^(k+1).
    """
    n_max = binoms.shape[0]
    n = jnp.clip(ratios, 1, n_max).astype(jnp.int32)
    new_op = 1.0 - jnp.power(1.0 - opacities, 1.0 / n.astype(opacities.dtype))
    new_op = jnp.clip(new_op, min_opacity, 1.0 - jnp.finfo(jnp.float32).eps)

    ks = jnp.arange(n_max, dtype=jnp.float32)  # k = 0..n_max-1
    sign = jnp.where(jnp.arange(n_max) % 2 == 0, 1.0, -1.0)
    term = sign / jnp.sqrt(ks + 1.0) * jnp.power(
        new_op[:, None], ks[None, :] + 1.0
    )  # [cap, n_max]
    # C(n, k+1) for each row's n — gather rows of the binom table
    cnk = binoms[n]  # [cap, n_max]; binoms[n, k+1] needed:
    cnk1 = jnp.concatenate(
        [cnk[:, 1:], jnp.zeros((cnk.shape[0], 1), cnk.dtype)], axis=1
    )
    kmask = ks[None, :] < n[:, None].astype(jnp.float32)
    denom = jnp.sum(jnp.where(kmask, cnk1 * term, 0.0), axis=1)
    coeff = opacities / jnp.where(denom == 0, 1.0, denom)
    new_scales = coeff[:, None] * scales
    return new_op, new_scales


def _sample_alive(
    key: jax.Array,
    opacities: jax.Array,  # [cap] post-sigmoid
    alive: jax.Array,  # [cap]
    n_draws: int,
) -> jax.Array:
    """Multinomial sample (with replacement) of alive slots by opacity.

    Inverse-CDF sampling: O(cap log cap) memory-light, unlike
    jax.random.categorical which materializes an [n_draws, cap] Gumbel
    matrix (90 GB at cap=150k when n_draws == cap).
    """
    w = jnp.where(alive, jnp.maximum(opacities, 1e-12), 0.0)
    cum = jnp.cumsum(w)
    total = cum[-1]
    u = jax.random.uniform(key, (n_draws,)) * total
    idx = jnp.searchsorted(cum, u, side="right").astype(jnp.int32)
    return jnp.clip(idx, 0, w.shape[0] - 1)


def relocate(
    params: Dict[str, jax.Array],
    opt_moments: Any,
    alive: jax.Array,
    dead_mask: jax.Array,  # [cap] (subset of alive)
    binoms: jax.Array,
    key: jax.Array,
    min_opacity: float = 0.005,
) -> Tuple[Dict[str, jax.Array], Any, jax.Array]:
    """Teleport dead gaussians onto opacity-sampled live ones.

    Parity: ops.py:relocate (:302): sample with replacement by opacity,
    apply `compute_relocation` to the sampled sources (updating them
    in place), copy the updated source into each dead slot, zero the
    sampled sources' moments.
    """
    cap = alive.shape[0]
    dead_mask = dead_mask & alive
    live = alive & ~dead_mask
    op = jax.nn.sigmoid(params["opacities"])

    draws = _sample_alive(key, op, live, cap)  # [cap] candidate sources
    n_dead = jnp.sum(dead_mask)
    k = jnp.arange(cap)
    use = k < n_dead
    sampled = jnp.where(use, draws, cap).astype(jnp.int32)  # OOB when unused

    ratios = jnp.zeros(cap, jnp.int32).at[sampled].add(1, mode="drop") + 1
    new_op, new_scales = compute_relocation(
        op, jnp.exp(params["scales"]), ratios, binoms, min_opacity
    )

    touched = jnp.zeros(cap, bool).at[sampled].set(True, mode="drop")
    params = dict(params)
    params["opacities"] = jnp.where(
        touched, jax.scipy.special.logit(new_op), params["opacities"]
    )
    params["scales"] = jnp.where(
        touched[:, None], jnp.log(new_scales), params["scales"]
    )

    dead_pos = jnp.nonzero(dead_mask, size=cap, fill_value=cap)[0]
    dst = jnp.where(use, dead_pos, cap).astype(jnp.int32)
    params = _tree_write(params, dst, jnp.where(use, sampled, 0))

    sampled_idx = jnp.where(touched, k, cap).astype(jnp.int32)
    opt_moments = _tree_zero_at(opt_moments, sampled_idx)
    # note: the reference zeroes only the sampled sources' moments; the
    # dead slots keep theirs (they were near-zero-opacity anyway). We zero
    # both for stability.
    opt_moments = _tree_zero_at(opt_moments, dst)
    return params, opt_moments, alive


def sample_add(
    params: Dict[str, jax.Array],
    opt_moments: Any,
    alive: jax.Array,
    n_add: jax.Array,  # [] int32 — how many to add (clamped by free slots)
    binoms: jax.Array,
    key: jax.Array,
    min_opacity: float = 0.005,
) -> Tuple[Dict[str, jax.Array], Any, jax.Array]:
    """Add new gaussians sampled from live ones (MCMC grow).

    Parity: ops.py:sample_add (:360): relocation math updates the sampled
    sources in place and the new slots copy the updated sources.
    """
    cap = alive.shape[0]
    op = jax.nn.sigmoid(params["opacities"])
    draws = _sample_alive(key, op, alive, cap)
    free_pos = jnp.nonzero(~alive, size=cap, fill_value=cap)[0]
    k = jnp.arange(cap)
    n = jnp.minimum(n_add, jnp.sum(~alive))
    use = k < n
    sampled = jnp.where(use, draws, cap).astype(jnp.int32)

    ratios = jnp.zeros(cap, jnp.int32).at[sampled].add(1, mode="drop") + 1
    new_op, new_scales = compute_relocation(
        op, jnp.exp(params["scales"]), ratios, binoms, min_opacity
    )
    touched = jnp.zeros(cap, bool).at[sampled].set(True, mode="drop")
    params = dict(params)
    params["opacities"] = jnp.where(
        touched, jax.scipy.special.logit(new_op), params["opacities"]
    )
    params["scales"] = jnp.where(
        touched[:, None], jnp.log(new_scales), params["scales"]
    )

    dst = jnp.where(use, free_pos, cap).astype(jnp.int32)
    params = _tree_write(params, dst, jnp.where(use, sampled, 0))
    sampled_idx = jnp.where(touched, k, cap).astype(jnp.int32)
    opt_moments = _tree_zero_at(opt_moments, sampled_idx)
    opt_moments = _tree_zero_at(opt_moments, dst)
    alive = alive.at[dst].set(True, mode="drop")
    return params, opt_moments, alive


def inject_noise_to_position(
    params: Dict[str, jax.Array],
    alive: jax.Array,
    key: jax.Array,
    noise_scale: jax.Array | float,
    t: float = DEFAULT_MCMC_OPACITY_T,
    k: float = DEFAULT_MCMC_OPACITY_K,
) -> Dict[str, jax.Array]:
    """Covariance-shaped, opacity-gated positional noise (MCMC explore).

    Parity: ops.py:inject_noise_to_position (:463) / MCMCPerturbCUDA.cu:
    means += Sigma @ (randn * sigmoid(-k (o - t)) * noise_scale). On TPU
    this fuses into one XLA pass — no custom kernel needed.
    """
    op = jax.nn.sigmoid(params["opacities"])
    scales = jnp.exp(params["scales"])
    R = quat_to_rotmat(params["quats"])
    M = R * scales[..., None, :]
    # covar = M M^T; noise' = covar @ n
    n = jax.random.normal(key, params["means"].shape, params["means"].dtype)
    gate = jax.nn.sigmoid(-k * (op - t)) * noise_scale
    n = n * gate[:, None]
    noise = jnp.einsum(
        "nij,nkj,nk->ni", M, M, n, precision="highest"
    )
    params = dict(params)
    params["means"] = jnp.where(
        alive[:, None], params["means"] + noise, params["means"]
    )
    return params
