"""Adam optimizers for gaussian parameter pytrees.

TPU-native equivalents of the reference's optimizers:
  * `adam_update` — standard Adam with bias correction, per-leaf learning
    rates (the reference uses one torch.optim.Adam per parameter group,
    simple_trainer.py:356-377).
  * `selective_adam_update` — the fused visibility-gated Adam
    (gsplat/optimizers/selective_adam.py + AdamCUDA.cu:36-71): skips
    gaussians that were not visible this step and applies NO bias
    correction, exactly like the CUDA kernel. On TPU this is a plain jnp
    elementwise chain that XLA fuses into one pass — no custom kernel
    needed (the CUDA kernel exists to fuse what torch eager cannot).

State layout: a pytree-of-arrays mirroring the params pytree, so strategy
topology edits can zero per-slot moments with the same masks they use on
the params (strategy/ops.py relies on this).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any  # first moments, same pytree as params
    nu: Any  # second moments
    count: jax.Array  # [] int32 step count (bias correction)


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(
        mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )


def adam_update(
    params: Any,
    grads: Any,
    state: AdamState,
    lrs: Dict[str, float] | Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[Any, AdamState]:
    """Standard Adam with bias correction and per-leaf learning rates.

    `lrs` is either a dict keyed like the params dict (values may be floats
    or scalar arrays for scheduled rates) or a pytree-prefix of params.
    eps default matches the reference trainer (simple_trainer.py:367).
    """
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        mh = m / c1
        vh = v / c2
        return p - lr * mh / (jnp.sqrt(vh) + eps), m, v

    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        lr = lrs[k] if isinstance(lrs, dict) else lrs
        # values may themselves be pytrees (e.g. hexplane plane-grid lists)
        res = jax.tree.map(
            lambda p, g, m, v: upd(p, g, m, v, lr),
            params[k], grads[k], state.mu[k], state.nu[k],
        )
        istup = lambda t: isinstance(t, tuple)
        new_p[k] = jax.tree.map(lambda t: t[0], res, is_leaf=istup)
        new_m[k] = jax.tree.map(lambda t: t[1], res, is_leaf=istup)
        new_v[k] = jax.tree.map(lambda t: t[2], res, is_leaf=istup)
    return new_p, AdamState(mu=new_m, nu=new_v, count=count)


def selective_adam_update(
    params: Any,
    grads: Any,
    state: AdamState,
    lrs: Dict[str, float] | Any,
    visibility: Optional[jax.Array] = None,  # [N] bool
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> tuple[Any, AdamState]:
    """Visibility-gated Adam without bias correction.

    Parity: gsplat/optimizers/selective_adam.py:step (:62-101) and the
    fused `adam` op (cuda/csrc/AdamCUDA.cu:36-71): gaussians with
    visibility == False keep their parameters AND moments untouched.
    """
    def upd(p, g, m, v, lr):
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        p_new = p - lr * m_new / (jnp.sqrt(v_new) + eps)
        if visibility is not None:
            vis = visibility.reshape(
                visibility.shape + (1,) * (p.ndim - visibility.ndim)
            )
            p_new = jnp.where(vis, p_new, p)
            m_new = jnp.where(vis, m_new, m)
            v_new = jnp.where(vis, v_new, v)
        return p_new, m_new, v_new

    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        lr = lrs[k] if isinstance(lrs, dict) else lrs
        new_p[k], new_m[k], new_v[k] = upd(
            params[k], grads[k], state.mu[k], state.nu[k], lr
        )
    return new_p, AdamState(mu=new_m, nu=new_v, count=state.count + 1)
