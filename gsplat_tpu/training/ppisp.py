"""Learned per-camera ISP (PPISP analog) — differentiable capture model.

Role parity with the reference trainer's `post_processing="ppisp"`
(simple_trainer.py:231-241, 578-590: the external `ppisp` package — a
per-camera/per-frame learned image signal processor trained jointly with
the splats so the 3D model absorbs scene radiance while the ISP absorbs
capture-side variation).  The reference package is proprietary; this is
a from-scratch TPU-friendly formulation of the same physical chain:

    rendered linear image
      -> per-frame exposure            exp(e_f)             [frames]
      -> per-camera white balance      diag(g_c)            [cams, 3]
      -> per-camera color matrix       I + M_c              [cams, 3, 3]
      -> per-camera radial vignetting  1/(1 + v1 r^2 + v2 r^4 + v3 r^6)
      -> per-camera tone curve (CRF)   x^(softplus gamma), monotone

All stages are smooth, initialized to the identity, and regularized
toward it, so step 0 reproduces the raw render exactly (the same
zero-init contract as the appearance head and bilateral grids).  The
reference's optional "controller" (a distilled predictor of the ISP
parameters for unseen frames) is intentionally out of scope; eval uses
the identity ISP, mirroring how held-out views skip per-view modules.

Everything is plain jnp over [..., H, W, 3] images — elementwise + one
3x3 matmul per pixel, fully fused by XLA.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def init_ppisp(num_cameras: int, num_frames: int) -> Dict[str, jax.Array]:
    """Identity-initialized ISP parameters."""
    return {
        "exposure": jnp.zeros((num_frames,), jnp.float32),  # log-scale
        "wb": jnp.zeros((num_cameras, 3), jnp.float32),  # log-gains
        "ccm": jnp.zeros((num_cameras, 3, 3), jnp.float32),  # delta from I
        "vignette": jnp.zeros((num_cameras, 3), jnp.float32),  # v1..v3
        "gamma": jnp.zeros((num_cameras,), jnp.float32),  # softplus-offset
    }


def apply_ppisp(
    params: Dict[str, jax.Array],
    img: jax.Array,  # [C, H, W, 3] (or [H, W, 3])
    camera_idx: jax.Array,  # [C] int32
    frame_idx: jax.Array,  # [C] int32
) -> jax.Array:
    """Apply the learned capture chain to rendered images."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
        camera_idx = jnp.atleast_1d(camera_idx)
        frame_idx = jnp.atleast_1d(frame_idx)
    C, H, W, _ = img.shape

    exposure = jnp.exp(params["exposure"][frame_idx])  # [C]
    gains = jnp.exp(params["wb"][camera_idx])  # [C, 3]
    ccm = jnp.eye(3) + params["ccm"][camera_idx]  # [C, 3, 3]
    vig = params["vignette"][camera_idx]  # [C, 3]
    # gamma = softplus-shifted so 0 -> exactly 1.0 (identity curve)
    gamma = jax.nn.softplus(params["gamma"][camera_idx] + _SP_INV_1)  # [C]

    x = img * exposure[:, None, None, None]
    x = x * gains[:, None, None, :]
    x = jnp.einsum("chwd,ced->chwe", x, ccm)

    # normalized radius from the image center
    ys = (jnp.arange(H) + 0.5) / H - 0.5
    xs = (jnp.arange(W) + 0.5) / W - 0.5
    r2 = (xs[None, :] ** 2 + ys[:, None] ** 2) / 0.5  # [H, W], ~[0, 1]
    poly = (
        1.0
        + vig[:, 0, None, None] * r2
        + vig[:, 1, None, None] * r2**2
        + vig[:, 2, None, None] * r2**3
    )
    x = x / jnp.maximum(poly, 0.1)[..., None]

    x = jnp.clip(x, 0.0, None)
    x = jnp.power(x + 1e-8, gamma[:, None, None, None])
    return x[0] if squeeze else x


# softplus(z) == 1  =>  z = log(e - 1)
_SP_INV_1 = float(jnp.log(jnp.expm1(1.0)))


def ppisp_regularization(params: Dict[str, jax.Array]) -> jax.Array:
    """L2 pull toward the identity ISP (exposure excluded: frames really
    do differ in exposure; everything else should stay near-physical)."""
    return (
        jnp.mean(params["wb"] ** 2)
        + jnp.mean(params["ccm"] ** 2)
        + jnp.mean(params["vignette"] ** 2)
        + jnp.mean(params["gamma"] ** 2)
    )
