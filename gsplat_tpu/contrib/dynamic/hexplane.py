"""HexPlaneField: multi-resolution 6-plane decomposition of a 4D field.

Behavior parity (independently implemented, pure jnp):
  gsplat/contrib/dynamic/hexplane.py (G-SHARP port): per scale, six 2D
  feature planes over every pair of (x, y, z, t) axes are bilinearly
  sampled and multiplied elementwise; scales are concatenated. Grids over
  pairs containing the time axis initialize to ones (identity-like start),
  spatial pairs to U(0.1, 0.5). Spatial coords are AABB-normalized to
  [-1, 1]; time passes through. Sampling clamps out-of-range coords
  (grid_sample padding_mode="border", align_corners=True).

JAX adaptation: a functional module — `hexplane_init(key, ...)` returns the
parameter pytree, `hexplane_apply(params, xyzt)` evaluates it — so the
planes slot into any optimizer pytree.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_PLANE_CONFIG = {
    "grid_dimensions": 2,
    "input_coordinate_dim": 4,
    "output_coordinate_dim": 32,
    "resolution": [64, 64, 64, 25],
}
DEFAULT_MULTIRES = (1, 2)

SPATIAL_PLANE_IDXS = (0, 1, 3)  # xy, xz, yz
TEMPORAL_PLANE_IDXS = (2, 4, 5)  # xt, yt, zt


def grid_sample_2d(grid: Array, coords: Array) -> Array:
    """Bilinear sample of grid [C, H, W] at coords [N, 2] in [-1, 1].

    align_corners=True + border padding (parity: the torch grid_sample
    call in _grid_sample_wrapper). coords[:, 0] indexes W, coords[:, 1] H.
    """
    C, H, W = grid.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2) if W > 1 else jnp.zeros_like(x, jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2) if H > 1 else jnp.zeros_like(y, jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = x - x0
    wy = y - y0
    g = grid  # [C, H, W]
    v00 = g[:, y0, x0]  # [C, N]
    v01 = g[:, y0, x1]
    v10 = g[:, y1, x0]
    v11 = g[:, y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).T  # [N, C]


def hexplane_init(
    key: jax.Array,
    bounds: float = 1.6,
    planes_config: Optional[dict] = None,
    multires: Optional[Sequence[int]] = None,
) -> Dict:
    """Initialize HexPlane parameters.

    Returns {'grids': [scale][plane] arrays [C, H, W], 'aabb': [2, 3],
    'config': ..., 'feat_dim': int}.
    """
    config = dict(planes_config or DEFAULT_PLANE_CONFIG)
    multires = list(multires if multires is not None else DEFAULT_MULTIRES)
    in_dim = config["input_coordinate_dim"]
    out_dim = config["output_coordinate_dim"]
    grid_nd = config["grid_dimensions"]
    coo_combs = list(itertools.combinations(range(in_dim), grid_nd))
    has_time = in_dim == 4

    grids: List[List[Array]] = []
    feat_dim = 0
    for res in multires:
        base = list(config["resolution"])
        reso = [r * res for r in base[:3]] + base[3:]
        scale_planes = []
        for comb in coo_combs:
            # reversed order: shape [C, reso[comb[-1]], ..., reso[comb[0]]]
            shape = (out_dim,) + tuple(reso[c] for c in comb[::-1])
            if has_time and 3 in comb:
                p = jnp.ones(shape, jnp.float32)
            else:
                key, sub = jax.random.split(key)
                p = jax.random.uniform(sub, shape, jnp.float32, 0.1, 0.5)
            scale_planes.append(p)
        feat_dim += out_dim
        grids.append(scale_planes)

    aabb = jnp.asarray(
        [[bounds, bounds, bounds], [-bounds, -bounds, -bounds]], jnp.float32
    )
    return dict(
        grids=grids,
        aabb=aabb,
        config=config,
        multires=multires,
        feat_dim=feat_dim,
        coo_combs=coo_combs,
    )


def hexplane_apply(params: Dict, xyzt: Array) -> Array:
    """Sample the field at [N, 4] (x, y, z, t) points -> [N, feat_dim]."""
    if xyzt.shape[-1] != 4:
        raise ValueError(f"xyzt last dim must be 4, got {xyzt.shape}")
    aabb = params["aabb"]
    xyz = (xyzt[..., :3] - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0
    pts = jnp.concatenate([xyz, xyzt[..., 3:]], axis=-1).reshape(-1, 4)

    outs = []
    for scale_planes in params["grids"]:
        interp = 1.0
        for plane, comb in zip(scale_planes, params["coo_combs"]):
            # plane [C, reso[c1], reso[c0]]: W axis = first comb coord
            coords = pts[:, list(comb)]  # [N, 2] = (c0, c1) -> (x=W, y=H)
            interp = interp * grid_sample_2d(plane, coords)
        outs.append(interp)
    return jnp.concatenate(outs, axis=-1)


def spatial_planes(params: Dict) -> List[Array]:
    """Flat list of spatial (xy, xz, yz) planes across scales."""
    return [s[i] for s in params["grids"] for i in SPATIAL_PLANE_IDXS]


def temporal_planes(params: Dict) -> List[Array]:
    """Flat list of spatio-temporal (xt, yt, zt) planes across scales."""
    return [s[i] for s in params["grids"] for i in TEMPORAL_PLANE_IDXS]
