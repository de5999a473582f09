"""Pure-jnp reference eval3d rasterizer (test oracle; autodiff-backed).

Ray-based 3D gaussian evaluation: instead of a screen-space conic, each
(gaussian, pixel) response is computed in the gaussian's whitened local
frame from the pixel's world ray.

Behavior parity (independently implemented):
  gsplat/cuda/_torch_impl_eval3d.py:accumulate_eval3d /
  _compute_ray_gaussian_distance / _compute_gaussian_alphas:
    u  = M r_d,  u_hat = u/||u||            (M = diag(1/s) R^T)
    g  = M (r_o - x)
    hit_t = -u_hat . g;  behind if hit_t < 0  (response forced to 0)
    grayDist = || u_hat x g ||^2
    alpha = min(opacity * exp(-0.5 grayDist), 1 - sqrt(T_eps))
    hitDist = || s * (u_hat * hit_t) ||       (optional last channel)
    normals: R[:, 2] flipped toward the ray   (optional extra channels)

Memory scales with H*W*max_range — test-size scenes only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .math import quat_to_rotmat
from .projection import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_THRESHOLD
from .rasterize_ref import _composite_weights


def iscl_rot_from_quat_scale(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """M = diag(1/s) R^T [..., 3, 3]: world->whitened-local transform
    (parity: _torch_impl_eval3d.py:_compute_gaussian_transform)."""
    R = quat_to_rotmat(quats)
    return jnp.swapaxes(R, -1, -2) / scales[..., :, None]


def rasterize_to_pixels_eval3d_ref(
    means: jax.Array,  # [N, 3] world
    quats: jax.Array,  # [N, 4] wxyz
    scales: jax.Array,  # [N, 3]
    colors: jax.Array,  # [I, N, D]
    opacities: jax.Array,  # [I, N]
    rays: jax.Array,  # [I, H, W, 6] world (origin, direction)
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jax.Array,  # [I, th, tw] int32
    flatten_ids: jax.Array,  # [P] int32 into [I*N]
    n_isects: jax.Array,  # [] int32
    max_range: int,
    backgrounds: Optional[jax.Array] = None,  # [I, D]
    use_hit_distance: bool = False,
    return_normals: bool = False,
) -> Tuple[jax.Array, ...]:
    """Returns (render [I,H,W,D], alphas [I,H,W,1], normals [I,H,W,3]|None)."""
    I, N = colors.shape[0], colors.shape[1]
    th, tw = isect_offsets.shape[-2], isect_offsets.shape[-1]
    D = colors.shape[-1]

    M = iscl_rot_from_quat_scale(quats, scales)  # [N, 3, 3]
    cl = colors.reshape(I * N, D)
    op = opacities.reshape(I * N)

    ys = jnp.arange(image_height, dtype=jnp.int32)
    xs = jnp.arange(image_width, dtype=jnp.int32)
    ty = ys // tile_size
    tx = xs // tile_size

    offsets_flat = isect_offsets.reshape(I, th * tw)
    bounds = jnp.concatenate(
        [offsets_flat.reshape(-1), n_isects.reshape(1)], axis=0
    )
    tile_lin = ty[:, None] * tw + tx[None, :]
    tile_flat = (
        jnp.arange(I, dtype=jnp.int32)[:, None, None] * (th * tw)
        + tile_lin[None]
    )
    start = bounds[tile_flat]
    end = bounds[tile_flat + 1]

    r = jnp.arange(max_range, dtype=jnp.int32)
    slot = start[..., None] + r  # [I, H, W, R]
    in_range = slot < end[..., None]
    slot_c = jnp.minimum(slot, flatten_ids.shape[0] - 1)
    gflat = flatten_ids[slot_c]  # flat ids in [I*N]
    g = gflat % N  # gaussian index (shared geometry)

    ro = rays[..., :3][..., None, :]  # [I, H, W, 1, 3]
    rd = rays[..., 3:][..., None, :]
    x = means[g]  # [I, H, W, R, 3]
    Mg = M[g]  # [I, H, W, R, 3, 3]

    u = jnp.einsum("...ij,...j->...i", Mg, jnp.broadcast_to(rd, x.shape))
    gv = jnp.einsum("...ij,...j->...i", Mg, ro - x)
    un = jnp.linalg.norm(u, axis=-1, keepdims=True)
    uh = u / jnp.where(un > 0.0, un, 1.0)
    hit_t = -jnp.sum(uh * gv, axis=-1)
    c = jnp.cross(uh, gv)
    gray = jnp.sum(c * c, axis=-1)
    vis = jnp.exp(-0.5 * gray)
    alpha = jnp.minimum(MAX_ALPHA, op[gflat] * vis)
    gate = (hit_t >= 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range
    alpha = jnp.where(gate, alpha, 0.0)

    weights, t_final = _composite_weights(alpha, axis=-1)

    vals = cl[gflat]  # [I, H, W, R, D]
    if use_hit_distance:
        hd = hit_t * jnp.linalg.norm(scales[g] * uh, axis=-1)
        vals = jnp.concatenate([vals[..., :-1], hd[..., None]], axis=-1)

    render = jnp.einsum("ihwr,ihwrd->ihwd", weights, vals)
    render_alpha = (1.0 - t_final)[..., None]
    if backgrounds is not None:
        render = render + t_final[..., None] * backgrounds[:, None, None, :]

    normals_img = None
    if return_normals:
        R3 = quat_to_rotmat(quats)[..., :, 2]  # [N, 3]
        n = R3[g]  # [I, H, W, R, 3]
        sgn = jnp.where(jnp.sum(n * rd, axis=-1, keepdims=True) > 0.0, -1.0, 1.0)
        normals_img = jnp.einsum("ihwr,ihwrd->ihwd", weights, sgn * n)

    return render, render_alpha, normals_img
