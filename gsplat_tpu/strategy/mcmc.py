"""MCMC densification strategy (3DGS as Markov Chain Monte Carlo).

Parity: gsplat/strategy/mcmc.py — relocate dead gaussians (opacity <=
min_opacity) onto opacity-sampled live ones with the Eq.9 correction, grow
5% per refine up to cap_max, and inject covariance-shaped noise scaled by
lr * noise_lr every step.

This is the TPU flagship strategy: the parameter arrays are allocated at
`cap_max` once and only the `alive` mask changes — zero recompilation
across the whole training run. All methods are pure functions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import ops
from .ops import DEFAULT_MCMC_OPACITY_K, DEFAULT_MCMC_OPACITY_T


@dataclasses.dataclass(frozen=True)
class MCMCStrategy:
    """Config mirror of gsplat/strategy/mcmc.py:MCMCStrategy (:80-91)."""

    cap_max: int = 1_000_000
    noise_lr: float = 5e5
    refine_start_iter: int = 500
    refine_stop_iter: int = 25_000
    noise_injection_stop_iter: int = -1
    refine_every: int = 100
    min_opacity: float = 0.005
    noise_opacity_t: float = DEFAULT_MCMC_OPACITY_T
    noise_opacity_k: float = DEFAULT_MCMC_OPACITY_K

    def initialize_state(self) -> Dict[str, Any]:
        return {"binoms": ops.make_binoms(51)}

    def should_refine(self, step: int) -> bool:
        """Host-side schedule check (static per call site)."""
        return (
            self.refine_start_iter < step < self.refine_stop_iter
            and step % self.refine_every == 0
        )

    def should_inject_noise(self, step: int) -> bool:
        stop = (
            self.noise_injection_stop_iter
            if self.noise_injection_stop_iter >= 0
            else float("inf")
        )
        return step < stop

    def refine(
        self,
        params: Dict[str, jax.Array],
        opt_moments: Any,
        alive: jax.Array,
        state: Dict[str, Any],
        key: jax.Array,
    ) -> Tuple[Dict[str, jax.Array], Any, jax.Array]:
        """Relocate dead gaussians, then grow 5% toward cap_max.

        Parity: mcmc.py:step_post_backward (:139-193). Jittable.
        """
        k1, k2 = jax.random.split(key)
        binoms = state["binoms"]
        dead = alive & (
            jax.nn.sigmoid(params["opacities"]) <= self.min_opacity
        )
        params, opt_moments, alive = ops.relocate(
            params, opt_moments, alive, dead, binoms, k1,
            min_opacity=self.min_opacity,
        )
        current = jnp.sum(alive)
        n_target = jnp.minimum(
            self.cap_max, (1.05 * current.astype(jnp.float32)).astype(jnp.int32)
        )
        n_add = jnp.maximum(0, n_target - current)
        params, opt_moments, alive = ops.sample_add(
            params, opt_moments, alive, n_add, binoms, k2,
            min_opacity=self.min_opacity,
        )
        return params, opt_moments, alive

    def inject_noise(
        self,
        params: Dict[str, jax.Array],
        alive: jax.Array,
        key: jax.Array,
        lr_means: jax.Array | float,
    ) -> Dict[str, jax.Array]:
        """Noise step, scaled by the current means learning rate. Jittable."""
        return ops.inject_noise_to_position(
            params, alive, key,
            noise_scale=lr_means * self.noise_lr,
            t=self.noise_opacity_t, k=self.noise_opacity_k,
        )
