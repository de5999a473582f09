"""Multi-host bootstrap + collective helpers.

Analog of gsplat/distributed.py (:117-375): where the reference spawns one
process per GPU and initializes a NCCL group (`cli()` / `_distributed_worker`),
on TPU the runtime is SPMD — one process per host, all devices visible, and
collectives are compiler-inserted (`jax.shard_map` over a `Mesh`). This
module provides:

  * `cli(fn, args)` — multi-host entry: initializes `jax.distributed` from
    the standard environment (JAX coordinator vars, or OpenMPI `OMPI_*` vars
    like the reference's multi-node path, distributed.py:330-352) and calls
    `fn(local_rank, world_rank, world_size, args)` once per process.
  * `world_info()` — (process_index, process_count, local_device_count).
  * mesh/collective helpers mirroring the reference's functional API:
    `all_gather_tensor_list`, `all_to_all_tensor_list` — batched into one
    collective like the reference (:164-181, :244-264), for use INSIDE
    shard_map'ped functions.

Gradients flow through these collectives automatically under `jax.grad`
(the analog of the `_c10d_functional_autograd` ops the reference uses,
DistributedCollectives.cpp:51-86).
"""

from __future__ import annotations

import os
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def world_info():
    """(world_rank, world_size, local_device_count)."""
    return (
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
    )


def _maybe_init_distributed() -> None:
    """Initialize jax.distributed from the environment if multi-host.

    Accepts either JAX-native env (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID) or OpenMPI env (the reference's multi-node bootstrap,
    distributed.py:330-352).
    """
    # NOTE: read the env FIRST — jax.process_count() initializes the XLA
    # backend, after which jax.distributed.initialize refuses to run.
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if coord is None and "OMPI_COMM_WORLD_SIZE" not in os.environ:
        return  # single-process (or runtime-initialized) launch
    if coord is None and "OMPI_COMM_WORLD_SIZE" in os.environ:
        nproc = os.environ["OMPI_COMM_WORLD_SIZE"]
        pid = os.environ["OMPI_COMM_WORLD_RANK"]
        main_addr = os.environ.get("MASTER_ADDR", "127.0.0.1")
        main_port = os.environ.get("MASTER_PORT", "8476")
        coord = f"{main_addr}:{main_port}"
    if coord is not None and int(nproc or 1) > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )


def cli(fn: Callable, args: Any = None) -> Any:
    """Run `fn(local_rank, world_rank, world_size, args)` in this process.

    Parity with gsplat/distributed.py:cli (:287-375) adapted to SPMD: the
    TPU runtime already runs one process per host with all local devices
    attached, so no process spawning happens here — only coordinator
    initialization (when launched multi-host) and rank bookkeeping.
    """
    _maybe_init_distributed()
    world_rank = jax.process_index()
    world_size = jax.process_count()
    local_rank = 0  # one process per host owns all local devices
    return fn(local_rank, world_rank, world_size, args)


def make_gs_mesh(axis: str = "gs", devices: Optional[Sequence] = None) -> Mesh:
    """1D device mesh over all devices (the gaussian-shard axis)."""
    devs = np.array(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


# --- collective helpers (call inside shard_map'ped functions) --------------


def all_gather_tensor_list(
    tensors: List[jax.Array], axis: str
) -> List[jax.Array]:
    """All-gather a list of arrays in ONE collective (flatten-cat-split).

    Parity: distributed.py:all_gather_tensor_list (:117-181). Returns each
    array with the mesh axis gathered into the leading dim ([W * n, ...]).
    """
    flat = jnp.concatenate([t.reshape(t.shape[0], -1) for t in tensors], axis=1)
    gathered = jax.lax.all_gather(flat, axis, tiled=True)  # [W*n, sum]
    out = []
    col = 0
    for t in tensors:
        width = int(np.prod(t.shape[1:])) if t.ndim > 1 else 1
        piece = gathered[:, col : col + width]
        out.append(piece.reshape((gathered.shape[0],) + t.shape[1:]))
        col += width
    return out


def all_to_all_tensor_list(
    tensors: List[jax.Array], axis: str
) -> List[jax.Array]:
    """All-to-all a list of arrays in ONE collective along the leading dim.

    Each array's leading dim must be divisible by the axis size; shard i of
    each input goes to device i. Parity: distributed.py:all_to_all_tensor_list
    (:185-264, dense path).
    """
    flat = jnp.concatenate(
        [t.reshape(t.shape[0], -1) for t in tensors], axis=1
    )
    exchanged = jax.lax.all_to_all(
        flat, axis, split_axis=0, concat_axis=0, tiled=True
    )
    out = []
    col = 0
    for t in tensors:
        width = int(np.prod(t.shape[1:])) if t.ndim > 1 else 1
        piece = exchanged[:, col : col + width]
        out.append(piece.reshape((exchanged.shape[0],) + t.shape[1:]))
        col += width
    return out
