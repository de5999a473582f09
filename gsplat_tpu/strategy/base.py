"""Strategy base contract (parity: gsplat/strategy/base.py:23-64).

JAX adaptation: there is no loss.backward() — the trainer computes grads
functionally — so the pre/post "backward" hooks become pre/post-update
callbacks with the same names. check_sanity validates that the parameter
pytree and the Adam moment pytrees share a structure (the analog of the
one-param-group-per-parameter invariant).
"""

from __future__ import annotations

from typing import Any, Dict


class Strategy:
    """Densification-strategy interface."""

    def check_sanity(self, params: Dict[str, Any], opt_moments: Any) -> None:
        """Params and optimizer moments must share keys/structure."""
        import jax

        p_struct = jax.tree.structure(params)
        for moments in (
            opt_moments if isinstance(opt_moments, tuple) else (opt_moments,)
        ):
            m_struct = jax.tree.structure(moments)
            assert p_struct == m_struct, (
                "params and optimizer moments must share a pytree structure, "
                f"got {p_struct} vs {m_struct}"
            )

    def step_pre_backward(self, *args, **kwargs):
        """Hook before the gradient computation (reference: pre-backward)."""

    def step_post_backward(self, *args, **kwargs):
        """Hook after the update (reference: post-backward)."""
