"""Camera pose and appearance optimization modules (functional JAX).

Parity: /root/reference/examples/utils.py — `CameraOptModule` (:27-63,
9D per-camera deltas: 3 translation + 6D rotation, right-multiplied onto
camtoworlds) and `AppearanceOptModule` (:66-130, per-camera embedding +
view-direction SH bases + gaussian features through a small MLP color
head).  Here both are plain parameter pytrees + pure functions so they jit
and shard with the rest of the training step (no module framework needed).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.sh import eval_sh_bases, num_sh_bases

IDENTITY_6D = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], jnp.float32)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Zhou et al. continuous 6D rotation -> [..., 3, 3] matrix."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def init_pose_deltas(n_cameras: int) -> jax.Array:
    """Zero-initialized per-camera pose deltas [n, 9] (3 trans + 6D rot).

    Parity: CameraOptModule.zero_init (utils.py:37).
    """
    return jnp.zeros((n_cameras, 9), jnp.float32)


def apply_pose_deltas(
    camtoworlds: jax.Array,  # [..., 4, 4]
    deltas: jax.Array,  # [..., 9]
) -> jax.Array:
    """camtoworld @ [R(d6 + I) | dx] — differentiable pose adjustment.

    Parity: CameraOptModule.forward (utils.py:43-63).
    """
    dx = deltas[..., :3]
    rot = rotation_6d_to_matrix(deltas[..., 3:] + IDENTITY_6D)
    top = jnp.concatenate([rot, dx[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], camtoworlds.dtype),
        top.shape[:-2] + (1, 4),
    )
    transform = jnp.concatenate([top, bottom], axis=-2)
    return camtoworlds @ transform


def init_appearance(
    key: jax.Array,
    n_cameras: int,
    feature_dim: int,
    embed_dim: int = 16,
    sh_degree: int = 3,
    mlp_width: int = 64,
    mlp_depth: int = 2,
) -> Dict[str, jax.Array]:
    """Parameters for the appearance color head (embeds + MLP).

    Parity: AppearanceOptModule.__init__ (utils.py:69-91).
    """
    K = num_sh_bases(sh_degree)
    dims = [embed_dim + feature_dim + K] + [mlp_width] * (mlp_depth) + [3]
    # every leaf is a float array so the whole dict can ride through
    # value_and_grad; layer count and max SH degree are recovered from the
    # weight shapes in apply_appearance
    params: Dict[str, jax.Array] = {
        "embeds": jnp.zeros((n_cameras, embed_dim), jnp.float32),
    }
    for i in range(len(dims) - 1):
        key, k1 = jax.random.split(key)
        bound = 1.0 / jnp.sqrt(dims[i])
        params[f"w{i}"] = jax.random.uniform(
            k1, (dims[i], dims[i + 1]), jnp.float32, -bound, bound
        )
        params[f"b{i}"] = jnp.zeros((dims[i + 1],), jnp.float32)
    # zero-init the color head so the initial appearance adjustment is
    # exactly zero (reference simple_trainer.py:553-555 zeros the last
    # layer; without this, step 0 starts with random per-view color shifts)
    last = len(dims) - 2
    params[f"w{last}"] = jnp.zeros_like(params[f"w{last}"])
    return params


def apply_appearance(
    params: Dict[str, jax.Array],
    features: jax.Array,  # [N, feature_dim]
    embed_ids: Optional[jax.Array],  # [C] or None
    dirs: jax.Array,  # [C, N, 3]
    sh_degree: int,
) -> jax.Array:
    """Per-view color adjustment [C, N, 3].

    Parity: AppearanceOptModule.forward (utils.py:93-130): zero embedding
    when embed_ids is None; SH bases masked beyond the active degree.
    """
    C, N = dirs.shape[:2]
    embed_dim = params["embeds"].shape[1]
    if embed_ids is None:
        emb = jnp.zeros((C, embed_dim), jnp.float32)
    else:
        emb = params["embeds"][embed_ids]
    emb = jnp.broadcast_to(emb[:, None, :], (C, N, embed_dim))
    feats = jnp.broadcast_to(features[None], (C, N, features.shape[-1]))
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    # max basis count = first-layer fan-in minus the non-SH inputs
    K_total = params["w0"].shape[0] - embed_dim - features.shape[-1]
    K_use = min(num_sh_bases(sh_degree), K_total)
    bases = jnp.zeros((C, N, K_total), jnp.float32)
    bases = bases.at[..., :K_use].set(eval_sh_bases(K_use, d))
    h = jnp.concatenate([emb, feats, bases], axis=-1)
    n_layers = sum(1 for k in params if k.startswith("w"))
    for i in range(n_layers):
        h = h @ params[f"w{i}"] + params[f"b{i}"]
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h
