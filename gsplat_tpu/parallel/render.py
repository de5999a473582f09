"""SPMD distributed rasterization over a JAX device mesh (the Grendel scheme).

TPU-native redesign of the reference's distributed mode (arXiv 2406.18533;
gsplat/distributed.py + gsplat/cuda/csrc/DistributedCollectives.cpp), which is
Gaussian-sharded data parallelism with a camera-space all-to-all:

  1. Gaussians are sharded over mesh axis `gs` (each shard owns N_local);
     parameters, optimizer state, and densification stay shard-local —
     no gradient all-reduce for splat params.
  2. Cameras are data-parallel over the same axis: each shard renders its
     own C_local cameras.
  3. Seam A — camera all-gather (`lax.all_gather`; reference:
     DistributedCollectives.cpp:299 `gather_cameras_for_distributed`).
  4. Seam B — projected-splat all-to-all (`lax.all_to_all` of the dense
     [W*C_local, N_local] projection outputs; reference: the dense path of
     `scatter_projection_for_distributed`, DistributedCollectives.cpp:411-451).
     Tiling + rasterization then run purely shard-locally.
  5. Backward: `jax.grad` through `shard_map` records the reverse
     collectives automatically (the analog of the reference's
     `_c10d_functional_autograd` ops, DistributedCollectives.cpp:51-86).

Where NCCL process groups and torch.distributed bootstrap were needed, here
the entire pipeline is one `shard_map`ped pure function over a
`jax.sharding.Mesh` — it runs identically on 1 device (identity collectives,
the reference's world_size==1 CI trick) and on a pod slice. Two exchange
modes are implemented: the dense exchange (exact match for the reference's
`packed=False` distributed semantics) and the count-routed packed/ragged
exchange (lax.ragged_all_to_all with a transposed VJP — the analog of the
reference's packed CSR exchange), both with gradients through the
collectives.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

import functools

from ..ops.projection import fully_fused_projection
from ..ops.rasterize import rasterize_to_pixels_packed
from ..ops.rasterize_pallas import DEFAULT_CHUNK, TILE
from ..ops.sh import spherical_harmonics


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _ragged_exchange(payload, cnt, axis, recv_cap, send_cap):
    """Count-routed splat exchange: `payload[l]` rows go to their
    destination shard, packed contiguously per sender.

    `payload` is [L, R] (rows = splats in send order, grouped by
    destination), `cnt` is the all-gathered [W, W] count matrix
    (cnt[s, d] = rows sender s ships to destination d).  Returns the
    [recv_cap, R] receive buffer (rows grouped by sender) plus the valid
    row count.  The TPU analog of the reference's packed distributed
    scatter (DistributedCollectives.cpp:343-409: bincounts -> exchanged
    counts -> batched all-to-all); here one `lax.ragged_all_to_all` whose
    backward is the transposed exchange.
    """
    out, _ = _ragged_exchange_fwd(payload, cnt, axis, recv_cap, send_cap)
    return out


def _ragged_a2a(operand, out, input_offsets, send_sizes, output_offsets,
                recv_sizes, axis):
    """lax.ragged_all_to_all with an exact jnp emulation on CPU (the
    XLA:CPU thunk emitter lacks the op; the 8-device host mesh used by the
    test suite and the driver dry-run goes through the emulation)."""
    if jax.default_backend() != "cpu":
        return jax.lax.ragged_all_to_all(
            operand, out, input_offsets, send_sizes, output_offsets,
            recv_sizes, axis_name=axis,
        )
    data = jax.lax.all_gather(operand, axis)  # [W, L, R]
    io = jax.lax.all_gather(input_offsets, axis)  # [W, W]
    ss = jax.lax.all_gather(send_sizes, axis)
    oo = jax.lax.all_gather(output_offsets, axis)
    me = jax.lax.axis_index(axis)
    Wn = data.shape[0]
    L = data.shape[1]
    rows = jnp.arange(out.shape[0], dtype=jnp.int32)
    for s_idx in range(Wn):
        size = ss[s_idx, me]
        src0 = io[s_idx, me]
        dst0 = oo[s_idx, me]
        take = (rows >= dst0) & (rows < dst0 + size)
        src = jnp.clip(rows - dst0 + src0, 0, L - 1)
        out = jnp.where(take[:, None], data[s_idx][src], out)
    return out


def _clamped_routes(cnt, recv_cap):
    """Per-(sender, dest) admitted row counts, clipped so every receive
    buffer fits recv_cap.  Computed identically on every shard from the
    all-gathered count matrix, so senders and receivers always agree."""
    col_cum = jnp.cumsum(cnt, axis=0) - cnt  # rows before sender s at dest d
    allowed = jnp.clip(recv_cap - col_cum, 0, cnt)
    return allowed, jnp.minimum(col_cum, recv_cap)


def _ragged_exchange_fwd(payload, cnt, axis, recv_cap, send_cap):
    me = jax.lax.axis_index(axis)
    R = payload.shape[1]
    allowed, col_cum = _clamped_routes(cnt, recv_cap)
    send_sizes = allowed[me]  # [W] rows I send to each dest
    full_sizes = cnt[me]
    input_offsets = jnp.cumsum(full_sizes) - full_sizes  # my send layout
    recv_sizes = allowed[:, me]  # [W] rows I receive from each sender
    output_offsets = col_cum[me]  # where my block starts at each dest
    out = jnp.zeros((recv_cap, R), payload.dtype)
    out = _ragged_a2a(
        payload, out, input_offsets, send_sizes, output_offsets, recv_sizes,
        axis,
    )
    return (out, jnp.sum(recv_sizes)), (cnt,)


def _ragged_exchange_bwd(axis, recv_cap, send_cap, res, cts):
    (cnt,) = res
    g_out, _ = cts
    me = jax.lax.axis_index(axis)
    allowed, col_cum = _clamped_routes(cnt, recv_cap)
    # reverse exchange: my received blocks go back to their senders at the
    # positions they were sent from (rows dropped by the clamp get zero
    # gradients — they never contributed forward)
    input_offsets = col_cum[:, me]  # my recv layout (by sender)
    send_sizes = allowed[:, me]  # block from sender s returns to s
    full_cum = jnp.cumsum(cnt, axis=1) - cnt
    output_offsets = full_cum[:, me]  # where it lands in s's send buffer
    recv_sizes = allowed[me]  # I get my (admitted) sends back
    g_payload = jnp.zeros((send_cap, g_out.shape[1]), g_out.dtype)
    g_payload = _ragged_a2a(
        g_out, g_payload, input_offsets, send_sizes, output_offsets,
        recv_sizes, axis,
    )
    return g_payload, jnp.zeros_like(cnt)


_ragged_exchange.defvjp(_ragged_exchange_fwd, _ragged_exchange_bwd)
from ..rendering import (
    _campos_from_viewmats,
    _round_up,
    render_mode_has_color,
    render_mode_has_depth_channel,
    render_mode_has_expected_depth,
    render_projected,
)


def rasterization_sharded(
    means: jax.Array,  # [N, 3] sharded over `axis`
    quats: Optional[jax.Array],  # [N, 4]
    scales: Optional[jax.Array],  # [N, 3]
    opacities: jax.Array,  # [N]
    colors: jax.Array,  # [N, D] or [N, K, D] SH
    viewmats: jax.Array,  # [C, 4, 4] sharded over `axis` (camera DP)
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    *,
    mesh: Mesh,
    axis: str = "gs",
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = 0.3,
    sh_degree: Optional[int] = None,
    tile_size: int = TILE,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    render_mode: str = "RGB",
    rasterize_mode: str = "classic",
    camera_model: str = "pinhole",
    isect_capacity: Optional[int] = None,
    means2d_offset: Optional[jax.Array] = None,  # [C, N, 2] grad carrier
    absgrad: bool = False,
    packed: bool = False,  # count-routed (ragged) splat exchange
    packed_capacity: Optional[int] = None,  # receive-buffer rows per shard
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Collaboratively render C cameras from mesh-sharded Gaussians.

    Every shard contributes its local Gaussians to every camera and returns
    the renders for its own cameras; the result is the same [C, H, W, X]
    (camera-sharded) image stack as single-device `rasterization()`.
    Constraints mirror the reference's distributed mode
    (Rendering.cpp:190-234): pinhole/ortho/fisheye classic 3DGS, per-gaussian
    colors or SH, C divisible by the mesh axis size.

    `means2d_offset` ([C, N, 2], zeros) is the densification-gradient
    carrier: its cotangent under `jax.grad` is each camera's screen-space
    mean gradient for the *global* gaussian axis (with `absgrad=True`, the
    AbsGS tile-granular absolute gradient) — shard-local slices are what the
    strategies consume.
    """
    W_mesh = mesh.shape[axis]
    N = means.shape[0]
    C = viewmats.shape[0]
    assert C % W_mesh == 0, (
        f"camera count {C} must be divisible by mesh axis {axis}={W_mesh}"
    )
    assert N % W_mesh == 0, (
        f"gaussian count {N} must be divisible by mesh axis {axis}={W_mesh} "
        "(pad with zero-opacity gaussians)"
    )
    assert quats is not None and scales is not None, (
        "the sharded path requires quats+scales (no covars), matching the "
        "reference's distributed constraints (Rendering.cpp:190-234)"
    )
    has_color = render_mode_has_color(render_mode)
    has_depth = render_mode_has_depth_channel(render_mode)
    calc_comp = rasterize_mode == "antialiased"

    # background: None == zeros (identical blend), which keeps the shard_map
    # arity static
    D_color = colors.shape[-1] if has_color else 0
    D_out_global = D_color + (1 if (has_depth or not has_color) else 0)
    if backgrounds is None:
        backgrounds = jnp.zeros((C, D_out_global), means.dtype)

    if isect_capacity is None:
        isect_capacity = _round_up(
            max(4 * (C // W_mesh) * N, DEFAULT_CHUNK), DEFAULT_CHUNK
        )
    else:
        isect_capacity = _round_up(isect_capacity, DEFAULT_CHUNK)

    th = -(-height // tile_size)
    tw = -(-width // tile_size)
    recv_cap = (
        packed_capacity if packed_capacity is not None
        else (C // W_mesh) * N
    )

    use_sh = sh_degree is not None
    offset = (
        means2d_offset
        if means2d_offset is not None
        else jnp.zeros((C, N, 2), means.dtype)
    )

    def _shard_fn(
        means_l, quats_l, scales_l, op_l, colors_l, vm_l, ks_l, bg_l, off_l
    ):
        # each arg arrives with the leading axis divided by W_mesh
        n_l = means_l.shape[0]
        c_l = vm_l.shape[0]

        # Seam A: camera all-gather over ICI (tiled=False keeps the device
        # axis for the later all_to_all split).
        vm_all = jax.lax.all_gather(vm_l, axis)  # [W, C_l, 4, 4]
        ks_all = jax.lax.all_gather(ks_l, axis)
        I = W_mesh * c_l
        vm_flat = vm_all.reshape(I, 4, 4)
        ks_flat = ks_all.reshape(I, 3, 3)

        # project local gaussians against ALL cameras
        radii, means2d, depths, conics, comp = fully_fused_projection(
            means_l, None, quats_l, scales_l, vm_flat, ks_flat, width, height,
            eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip, calc_compensations=calc_comp,
            camera_model=camera_model, opacities=op_l,
        )  # [I, n_l, ...]
        op_b = jnp.broadcast_to(op_l[None], (I, n_l))
        if calc_comp:
            op_b = op_b * comp

        if has_color:
            if use_sh:
                campos = _campos_from_viewmats(vm_flat)  # [I, 3]
                dirs = means_l[None] - campos[:, None]  # [I, n_l, 3]
                feats = spherical_harmonics(
                    sh_degree, dirs, colors_l, masks=(radii > 0).all(-1)
                )
                feats = jnp.maximum(feats + 0.5, 0.0)
            else:
                feats = jnp.broadcast_to(
                    colors_l[None], (I, n_l, colors_l.shape[-1])
                )
            if has_depth:
                feats = jnp.concatenate([feats, depths[..., None]], -1)
        else:
            feats = depths[..., None]
        D_out = feats.shape[-1]

        # the screen-grad carrier: off_l is [C, n_l, 2] (gaussian-sharded,
        # all cameras) — exactly the projection layout, no gather needed;
        # its cotangent lands shard-local, which is what strategies consume
        means2d = means2d + off_l

        if packed:
            # Seam B (packed): per-destination visibility compaction + a
            # count-routed ragged exchange — traffic scales with the
            # visible splats, not cameras x gaussians (the analog of
            # DistributedCollectives.cpp:343-409).
            alive = (radii > 0).all(-1)  # [I, n_l]
            dest = (
                jnp.arange(I, dtype=jnp.int32)[:, None] // c_l
            )  # [I, 1] destination shard per camera
            dest = jnp.broadcast_to(dest, (I, n_l))
            key = jnp.where(alive, dest, W_mesh).reshape(-1)
            L0 = I * n_l
            f32 = lambda v: v.astype(jnp.float32)
            cam_local = jnp.broadcast_to(
                (jnp.arange(I, dtype=jnp.int32) % c_l)[:, None], (I, n_l)
            )
            rows = [
                means2d[..., 0].reshape(-1), means2d[..., 1].reshape(-1),
                conics[..., 0].reshape(-1), conics[..., 1].reshape(-1),
                conics[..., 2].reshape(-1), op_b.reshape(-1),
                depths.reshape(-1),
                f32(radii[..., 0]).reshape(-1), f32(radii[..., 1]).reshape(-1),
                f32(cam_local).reshape(-1),
            ] + [feats[..., i].reshape(-1) for i in range(D_out)]
            iota_l = jnp.arange(L0, dtype=jnp.int32)
            packed_rows = jax.lax.sort(
                (key, iota_l) + tuple(rows), num_keys=2, is_stable=False
            )[2:]
            cnt_me = jnp.sum(
                alive.reshape(W_mesh, c_l * n_l).astype(jnp.int32), axis=1
            )
            cnt = jax.lax.all_gather(cnt_me, axis)  # [W, W]
            payload = jnp.stack(packed_rows, axis=1)  # [L0, R]
            recv, n_recv = _ragged_exchange(
                payload, cnt, axis, recv_cap, L0
            )
            m2_e = recv[:, 0:2]
            cn_e = recv[:, 2:5]
            op_e = recv[:, 5]
            dep_e = recv[:, 6]
            rad_e = recv[:, 7:9].astype(jnp.int32)
            cam_e = recv[:, 9].astype(jnp.int32)
            feats_e = recv[:, 10 : 10 + D_out]

            bg_le = bg_l
            if bg_le.shape[-1] < D_out:
                bg_le = jnp.pad(
                    bg_le, ((0, 0), (0, D_out - bg_le.shape[-1]))
                )
            render, alphas, aux = rasterize_to_pixels_packed(
                m2_e, cn_e, feats_e, op_e, rad_e, dep_e, cam_e,
                n_recv.astype(jnp.int32), c_l, width, height,
                isect_capacity, backgrounds=bg_le,
            )
            ex_overflow = jnp.sum(cnt[:, jax.lax.axis_index(axis)]) > recv_cap
            return (
                render, alphas, aux["n_isects"][None],
                (aux["isect_overflow"] | ex_overflow)[None],
            )

        # Seam B: dense all-to-all of the projected splats — split the
        # camera axis back to its owners, concatenate the gaussian axis.
        def exch(x):
            # [W*c_l, n_l, ...] -> [c_l, W*n_l, ...]: camera groups scatter
            # to their owners, gaussian axis concatenates in global order
            return jax.lax.all_to_all(
                x, axis, split_axis=0, concat_axis=1, tiled=True
            )

        radii_e = exch(radii)
        means2d_e = exch(means2d)
        depths_e = exch(depths)
        conics_e = exch(conics)
        op_e = exch(op_b)
        feats_e = exch(feats)

        bg_le = bg_l
        if bg_le.shape[-1] < D_out:
            bg_le = jnp.pad(bg_le, ((0, 0), (0, D_out - bg_le.shape[-1])))

        render, alphas, aux = render_projected(
            means2d_e, conics_e, feats_e, op_e, radii_e, depths_e,
            width, height, tile_size, isect_capacity,
            backgrounds=bg_le,
        )
        return render, alphas, aux["n_isects"][None], aux["isect_overflow"][None]

    in_specs = (
        P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
        P(axis),  # backgrounds: camera-sharded
        P(None, axis),  # offset: gaussian axis sharded, camera axis whole
    )
    out_specs = (P(axis), P(axis), P(axis), P(axis))

    # jit the whole sharded pipeline: an un-jitted shard_map executes
    # EAGERLY, dispatching every primitive per-shard with its own
    # mini-compile (~45 ms/primitive measured on the virtual CPU mesh —
    # a ~1000x slowdown); under jit it is one XLA program, persistently
    # cached across processes
    fn = jax.jit(
        jax.shard_map(
            _shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )
    render, alphas, n_isects, overflow = fn(
        means, quats, scales, opacities, colors, viewmats, Ks,
        backgrounds, offset,
    )

    if render_mode_has_expected_depth(render_mode):
        d = render[..., -1:] / jnp.maximum(alphas, 1e-10)
        render = jnp.concatenate([render[..., :-1], d], -1)

    meta = {
        "width": width,
        "height": height,
        "tile_size": tile_size,
        "tile_width": tw,
        "tile_height": th,
        "n_cameras": C,
        "n_isects": n_isects,
        "isect_overflow": overflow,
        "isect_capacity": isect_capacity,
        "mesh_axis": axis,
        "world_size": W_mesh,
    }
    return render, alphas, meta
