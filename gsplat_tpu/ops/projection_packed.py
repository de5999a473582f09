"""Packed (visibility-compacted) projection.

Public analog of gsplat/cuda/_wrapper.py:fully_fused_projection(packed=True)
over ProjectionEWA3DGSPacked.cu: emit only visible (radii > 0) gaussians in
CSR-like form with per-entry camera/gaussian ids.

TPU-native design: the CUDA op sizes its outputs with a two-pass
block-count + prefix scan (ProjectionEWA3DGSPacked.cu:39-120). Under XLA
shapes are static, so the compaction targets a caller-provided `capacity`
(nnz slots): a stable argsort of the visibility mask front-compacts the
entries (XLA sort = the TPU replacement for the CUDA stream compaction),
and `nnz`/`overflow` report the true count. `indptr` [I+1] gives the CSR
row offsets like the CUDA op.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .projection import fully_fused_projection


def compact_visible(
    valid: jax.Array,  # [I, N] bool
    arrays,  # list of [I, N, ...] arrays to compact
    capacity: int,
):
    """Front-compact entries where `valid` into `capacity` slots.

    Returns (camera_ids [cap], gaussian_ids [cap], compacted arrays,
    sel_mask [cap], nnz, overflow). Entries are ordered camera-major then
    gaussian (the CUDA packed order); invalid slots have ids -1 and zeroed
    payloads.
    """
    I, N = valid.shape
    flat = valid.reshape(-1)
    # stable sort: valid entries first, original order preserved
    order = jnp.argsort(~flat, stable=True)[:capacity]
    sel_valid = flat[order]
    nnz = flat.sum().astype(jnp.int32)
    overflow = nnz > capacity

    camera_ids = jnp.where(sel_valid, (order // N).astype(jnp.int32), -1)
    gaussian_ids = jnp.where(sel_valid, (order % N).astype(jnp.int32), -1)
    outs = []
    for a in arrays:
        af = a.reshape((I * N,) + a.shape[2:])[order]
        zero = jnp.zeros_like(af)
        mask = sel_valid.reshape((-1,) + (1,) * (af.ndim - 1))
        outs.append(jnp.where(mask, af, zero))
    # CSR row offsets per camera
    counts = valid.sum(axis=1).astype(jnp.int32)
    indptr = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(jnp.minimum(counts, capacity))]
    )
    indptr = jnp.minimum(indptr, capacity)
    return camera_ids, gaussian_ids, outs, sel_valid, nnz, overflow, indptr


def fully_fused_projection_packed(
    means: jax.Array,  # [N, 3]
    covars: Optional[jax.Array],
    quats: Optional[jax.Array],
    scales: Optional[jax.Array],
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    capacity: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    calc_compensations: bool = False,
    camera_model: str = "pinhole",
    opacities: Optional[jax.Array] = None,
):
    """Packed projection: per-visible-splat arrays of length `capacity`.

    Returns a dict with camera_ids, gaussian_ids, radii, means2d, depths,
    conics, compensations (or None), valid, indptr, nnz, overflow —
    mirroring the CUDA packed outputs (batch_ids are implicit: unbatched).
    """
    radii, means2d, depths, conics, compensations = fully_fused_projection(
        means, covars, quats, scales, viewmats, Ks, width, height,
        eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
        radius_clip=radius_clip, calc_compensations=calc_compensations,
        camera_model=camera_model, opacities=opacities,
    )
    valid = (radii > 0).all(-1)  # [C, N]
    arrays = [radii, means2d, depths, conics]
    if compensations is not None:
        arrays.append(compensations)
    cam_ids, gs_ids, outs, sel_valid, nnz, overflow, indptr = compact_visible(
        valid, arrays, capacity
    )
    out = dict(
        camera_ids=cam_ids,
        gaussian_ids=gs_ids,
        radii=outs[0],
        means2d=outs[1],
        depths=outs[2],
        conics=outs[3],
        compensations=outs[4] if compensations is not None else None,
        valid=sel_valid,
        indptr=indptr,
        nnz=nnz,
        overflow=overflow,
    )
    return out
