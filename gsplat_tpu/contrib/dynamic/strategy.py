"""DynamicStrategy: deformable-aware densification.

Behavior parity: gsplat/contrib/dynamic/strategy.py — DefaultStrategy plus
a per-gaussian `dynamic_mask` in strategy state that resizes in lock-step
with every topology edit (children inherit the parent's flag; pruned
gaussians drop out via the alive mask).

TPU adaptation: params are capacity-padded with an `alive` mask, so the
mask never reallocates — duplicate/split copy parent rows into the child
slots through the `extra` sidecar of strategy/ops. The HexPlane +
DeformNet trainables are NOT per-gaussian and must live in their own
optimizer (the trainer applies the deformation before calling
`rasterization`, mirroring G-SHARP's rasterize_splats).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

from ...strategy.default import DefaultStrategy


@dataclasses.dataclass(frozen=True)
class DynamicStrategy(DefaultStrategy):
    """DefaultStrategy + dynamic_mask bookkeeping."""

    def initialize_state(
        self, cap: int, scene_scale: float = 1.0
    ) -> Dict[str, Any]:
        state = super().initialize_state(cap, scene_scale)
        state["dynamic_mask"] = jnp.zeros(cap, dtype=bool)
        return state
