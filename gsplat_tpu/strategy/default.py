"""Default (ADC) densification strategy — the original 3DGS recipe + AbsGS.

Parity: gsplat/strategy/default.py — accumulate screen-space gradient norms
per gaussian, duplicate small high-gradient gaussians, split large ones,
prune transparent/oversized ones, and periodically reset opacities.

TPU adaptation: parameters live in capacity-padded arrays with an `alive`
mask (see strategy/ops.py), so growth writes into free slots instead of
reallocating. Screen gradients arrive as the cotangent of the
`means2d_offset` carrier of `rasterization()` ([C, cap, 2]) — the JAX
replacement for the reference's `meta["means2d"].grad` retain_grad hook
(default.py:158-170).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import ops


@dataclasses.dataclass(frozen=True)
class DefaultStrategy:
    """Config mirror of gsplat/strategy/default.py:DefaultStrategy (:99-114)."""

    prune_opa: float = 0.005
    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    grow_scale2d: float = 0.05
    prune_scale3d: float = 0.1
    prune_scale2d: float = 0.15
    refine_scale2d_stop_iter: int = 0
    refine_start_iter: int = 500
    refine_stop_iter: int = 15_000
    reset_every: int = 3000
    refine_every: int = 100
    pause_refine_after_reset: int = 0
    absgrad: bool = False
    revised_opacity: bool = False
    # state keys holding per-gaussian sidecar rows that must follow
    # topology edits (children inherit parents) — e.g. DynamicStrategy's
    # dynamic_mask
    sidecar_state_keys: Tuple[str, ...] = ()
    # which local-frame scale axes participate in the is_small/is_prune
    # scale tests AND the split position sampling.  Surfel (2DGS) models
    # pass (0, 1): the normal-axis scale gets no render gradient and stays
    # frozen at init, so including it misclassifies every surfel with a
    # large init s_z as "too big to duplicate" and flings split children
    # along the normal (the round-4 garden 2DGS oscillation)
    scale_axes: Tuple[int, ...] = (0, 1, 2)

    def initialize_state(
        self, cap: int, scene_scale: float = 1.0
    ) -> Dict[str, Any]:
        state = {
            "grad2d": jnp.zeros(cap, jnp.float32),
            "count": jnp.zeros(cap, jnp.float32),
            "scene_scale": scene_scale,
        }
        if self.refine_scale2d_stop_iter > 0:
            state["radii"] = jnp.zeros(cap, jnp.float32)
        return state

    def should_refine(self, step: int) -> bool:
        return (
            step < self.refine_stop_iter
            and step > self.refine_start_iter
            and step % self.refine_every == 0
            and step % self.reset_every >= self.pause_refine_after_reset
        )

    def should_reset_opa(self, step: int) -> bool:
        return step % self.reset_every == 0 and step > 0

    def update_state(
        self,
        state: Dict[str, Any],
        screen_grads: jax.Array,  # [C, cap, 2] cotangent of means2d_offset
        radii: jax.Array,  # [C, cap, 2] int32
        width: int,
        height: int,
        n_cameras: int,
    ) -> Dict[str, Any]:
        """Accumulate per-gaussian gradient norms and visibility counts.

        Parity: default.py:_update_state (:229-280): grads normalized to
        pixel units x n_cameras; only gaussians with radii > 0 counted.
        Dense layout means the reference's index_add becomes a camera-axis
        reduction — no scatter.
        """
        g = screen_grads * jnp.asarray(
            [width / 2.0 * n_cameras, height / 2.0 * n_cameras],
            screen_grads.dtype,
        )
        sel = (radii > 0).all(axis=-1)  # [C, cap]
        norms = jnp.linalg.norm(g, axis=-1) * sel  # [C, cap]
        state = dict(state)
        state["grad2d"] = state["grad2d"] + norms.sum(axis=0)
        state["count"] = state["count"] + sel.sum(axis=0).astype(jnp.float32)
        if "radii" in state:
            r = (radii.max(axis=-1) * sel).max(axis=0).astype(jnp.float32)
            state["radii"] = jnp.maximum(
                state["radii"], r / float(max(width, height))
            )
        return state

    def refine(
        self,
        params: Dict[str, jax.Array],
        opt_moments: Any,
        alive: jax.Array,
        state: Dict[str, Any],
        step: int,
        key: jax.Array,
    ) -> Tuple[Dict[str, jax.Array], Any, jax.Array, Dict[str, Any]]:
        """Grow (duplicate + split) then prune. Parity: default.py:172-225.

        `step` must be a static Python int (schedule already resolved).
        Jittable per step value.
        """
        grads = state["grad2d"] / jnp.maximum(state["count"], 1.0)
        is_grad_high = (grads > self.grow_grad2d) & alive
        ax = list(self.scale_axes)
        scale_max = jnp.exp(params["scales"][..., ax]).max(axis=-1)
        is_small = scale_max <= self.grow_scale3d * state["scene_scale"]
        is_dupli = is_grad_high & is_small
        is_split = is_grad_high & ~is_small
        if step < self.refine_scale2d_stop_iter and "radii" in state:
            is_split |= (state["radii"] > self.grow_scale2d) & alive

        sidecar = {k: state[k] for k in self.sidecar_state_keys if k in state}
        if sidecar:
            params, opt_moments, alive, sidecar = ops.duplicate(
                params, opt_moments, alive, is_dupli, extra=sidecar
            )
            params, opt_moments, alive, sidecar = ops.split(
                params, opt_moments, alive, is_split, key,
                revised_opacity=self.revised_opacity, extra=sidecar,
                sample_axes=self.scale_axes,
            )
        else:
            params, opt_moments, alive = ops.duplicate(
                params, opt_moments, alive, is_dupli
            )
            # gaussians added by duplication are not split (reference :318-326)
            params, opt_moments, alive = ops.split(
                params, opt_moments, alive, is_split, key,
                revised_opacity=self.revised_opacity,
                sample_axes=self.scale_axes,
            )

        # prune (reference recomputes scales on the grown set, :343-377)
        scale_max = jnp.exp(params["scales"][..., ax]).max(axis=-1)
        is_prune = (
            jax.nn.sigmoid(params["opacities"]) < self.prune_opa
        ) & alive
        if step > self.reset_every:
            is_too_big = scale_max > self.prune_scale3d * state["scene_scale"]
            if step < self.refine_scale2d_stop_iter and "radii" in state:
                is_too_big |= state["radii"] > self.prune_scale2d
            is_prune |= is_too_big & alive
        alive = ops.remove(alive, is_prune)

        # reset running stats (reference :214-217)
        state = dict(state)
        state.update(sidecar)
        state["grad2d"] = jnp.zeros_like(state["grad2d"])
        state["count"] = jnp.zeros_like(state["count"])
        if "radii" in state:
            state["radii"] = jnp.zeros_like(state["radii"])
        return params, opt_moments, alive, state

    def reset_opa(
        self, params: Dict[str, jax.Array], opt_moments: Any
    ) -> Tuple[Dict[str, jax.Array], Any]:
        """Opacity reset to 2x prune threshold. Parity: default.py:218-224."""
        return ops.reset_opa(params, opt_moments, self.prune_opa * 2.0)
