"""Learning-rate schedules used by the trainers.

Parity: the reference uses torch ExponentialLR with gamma = 0.01^(1/steps)
for the means (examples/simple_trainer.py:809-814) and a TwoStageScheduler
(gsplat/training/schedulers.py:53) for staged training.
"""

from __future__ import annotations

import jax.numpy as jnp


def exponential_lr(
    step, base_lr: float, max_steps: int, final_ratio: float = 0.01
):
    """base_lr * final_ratio^(step / max_steps) — ExponentialLR equivalent."""
    return base_lr * jnp.power(final_ratio, step / max_steps)


def two_stage_lr(
    step,
    base_lr: float,
    stage1_steps: int,
    stage2_lr: float,
):
    """Constant base_lr through stage 1, then stage2_lr.

    Parity: gsplat/training/schedulers.py:TwoStageScheduler (:53).
    """
    return jnp.where(step < stage1_steps, base_lr, stage2_lr)
