"""HexPlane regularizers (parity: gsplat/contrib/dynamic/regulation.py).

plane_smoothness / time_smoothness: mean squared second-difference along
the H axis (for temporal planes, H is time per the reversed grid layout),
summed across planes. time_l1: L1 deviation from the ones-initialization.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from .hexplane import spatial_planes, temporal_planes

Array = jax.Array


def _second_difference_squared(planes: Sequence[Array]) -> Array:
    total = None
    for p in planes:
        if p.ndim not in (3, 4):
            raise ValueError(f"expected (C, H, W) planes, got shape {p.shape}")
        if p.shape[-2] < 3:
            continue
        first = p[..., 1:, :] - p[..., :-1, :]
        second = first[..., 1:, :] - first[..., :-1, :]
        c = jnp.mean(second**2)
        total = c if total is None else total + c
    return jnp.zeros(()) if total is None else total


def plane_smoothness(planes: Sequence[Array]) -> Array:
    """Spatial smoothness over the (xy, xz, yz) planes."""
    return _second_difference_squared(planes)


def time_smoothness(planes: Sequence[Array]) -> Array:
    """Temporal smoothness over the (xt, yt, zt) planes (H axis = time)."""
    return _second_difference_squared(planes)


def time_l1(planes: Sequence[Array]) -> Array:
    """L1 deviation from the ones init on spatio-temporal planes."""
    total = None
    for p in planes:
        c = jnp.mean(jnp.abs(1.0 - p))
        total = c if total is None else total + c
    return jnp.zeros(()) if total is None else total


def hexplane_regularization(
    field_params: Dict,
    lambda_plane_smooth: float = 1.0,
    lambda_time_smooth: float = 1.0,
    lambda_time_l1: float = 1.0,
) -> Array:
    """Weighted sum of the three regularizers over a hexplane params dict."""
    sp = spatial_planes(field_params)
    tp = temporal_planes(field_params)
    return (
        lambda_plane_smooth * plane_smoothness(sp)
        + lambda_time_smooth * time_smoothness(tp)
        + lambda_time_l1 * time_l1(tp)
    )
