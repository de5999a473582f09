"""DeformNetwork + DeformationTable (G-SHARP dynamic scenes).

Behavior parity (independently implemented, pure jnp):
  gsplat/contrib/dynamic/deformation.py — a ReLU MLP trunk over HexPlane
  features with three ZERO-INITIALIZED linear heads emitting deltas on
  (means, quats, opacities): the at-construction forward is the identity
  map. DeformationTable is the per-gaussian dynamic flag with
  prune/duplicate/split resize ops that mirror DefaultStrategy topology
  edits.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def deform_network_init(
    key: jax.Array,
    feature_dim: int,
    hidden_dim: int = 64,
    num_layers: int = 3,
) -> Dict:
    """Parameter pytree for the deform MLP. Heads zero-init => identity."""
    if num_layers < 1:
        raise ValueError(f"num_layers must be >= 1, got {num_layers}")
    if feature_dim < 1:
        raise ValueError(f"feature_dim must be >= 1, got {feature_dim}")
    params = {"trunk": []}
    dims = [feature_dim] + [hidden_dim] * num_layers
    for i in range(num_layers):
        key, sub = jax.random.split(key)
        # He-uniform like torch's default Linear init
        bound = 1.0 / np.sqrt(dims[i])
        w = jax.random.uniform(sub, (dims[i], dims[i + 1]), jnp.float32, -bound, bound)
        key, sub = jax.random.split(key)
        b = jax.random.uniform(sub, (dims[i + 1],), jnp.float32, -bound, bound)
        params["trunk"].append({"w": w, "b": b})
    for head, out in (("pos", 3), ("quat", 4), ("opacity", 1)):
        params[head] = {
            "w": jnp.zeros((hidden_dim, out), jnp.float32),
            "b": jnp.zeros((out,), jnp.float32),
        }
    return params


def deform_network_apply(
    params: Dict,
    means: Array,  # [N, 3]
    quats: Array,  # [N, 4]
    opacities: Array,  # [N, 1]
    t: Array,  # reserved (time lives in plane_features)
    plane_features: Array,  # [N, feature_dim]
) -> Tuple[Array, Array, Array]:
    """(means + d, quats + d, opacities + d)."""
    h = plane_features
    for layer in params["trunk"]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    d_means = h @ params["pos"]["w"] + params["pos"]["b"]
    d_quats = h @ params["quat"]["w"] + params["quat"]["b"]
    d_op = h @ params["opacity"]["w"] + params["opacity"]["b"]
    return means + d_means, quats + d_quats, opacities + d_op


class DeformationTable:
    """Per-gaussian bool flag: which gaussians run through the deform net.

    Parity: contrib/dynamic/deformation.py:DeformationTable — resize ops
    mirror DefaultStrategy topology edits (children inherit the parent's
    flag). Stored as numpy (host bookkeeping, like the optimizer-state
    reshapes in strategy/ops.py).
    """

    def __init__(self, num_gaussians: int):
        if num_gaussians < 0:
            raise ValueError("num_gaussians must be >= 0")
        self.mask = np.zeros(num_gaussians, dtype=bool)

    def __len__(self) -> int:
        return int(self.mask.shape[0])

    def set_indices(self, indices, value: bool = True) -> None:
        self.mask[np.asarray(indices)] = value

    def prune(self, keep_mask) -> None:
        keep_mask = np.asarray(keep_mask)
        if keep_mask.shape != self.mask.shape:
            raise ValueError(
                f"keep_mask shape {keep_mask.shape} != table {self.mask.shape}"
            )
        self.mask = self.mask[keep_mask]

    def duplicate(self, indices) -> None:
        self.mask = np.concatenate([self.mask, self.mask[np.asarray(indices)]])

    def split(self, indices, factor: int = 2) -> None:
        if factor < 1:
            raise ValueError(f"factor must be >= 1, got {factor}")
        indices = np.asarray(indices)
        keep = np.ones(self.mask.shape[0], dtype=bool)
        keep[indices] = False
        children = np.repeat(self.mask[indices], factor)
        self.mask = np.concatenate([self.mask[keep], children])
