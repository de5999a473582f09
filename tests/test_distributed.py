"""Distributed helpers on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gsplat_tpu.distributed import (
    all_gather_tensor_list,
    all_to_all_tensor_list,
    cli,
    make_gs_mesh,
    world_info,
)


def test_world_info_and_cli():
    rank, size, local = world_info()
    assert rank == 0 and size == 1 and local >= 8

    got = {}

    def fn(local_rank, world_rank, world_size, args):
        got.update(locals())
        return "ok"

    assert cli(fn, {"x": 1}) == "ok"
    assert got["world_size"] == 1


def test_all_gather_tensor_list():
    mesh = make_gs_mesh()
    W = mesh.shape["gs"]
    a = jnp.arange(W * 2 * 3, dtype=jnp.float32).reshape(W * 2, 3)
    b = jnp.arange(W * 2, dtype=jnp.float32)

    def f(a_l, b_l):
        ga, gb = all_gather_tensor_list([a_l, b_l], "gs")
        return ga, gb

    ga, gb = jax.shard_map(
        f, mesh=mesh, in_specs=(P("gs"), P("gs")),
        out_specs=(P(), P()), check_vma=False,
    )(a, b)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(b))


def test_all_to_all_tensor_list():
    mesh = make_gs_mesh()
    W = mesh.shape["gs"]
    # global [W*W] arranged so device i holds rows [i*W:(i+1)*W]
    a = jnp.arange(W * W * 2, dtype=jnp.float32).reshape(W * W, 2)

    def f(a_l):
        (out,) = all_to_all_tensor_list([a_l], "gs")
        return out

    out = jax.shard_map(
        f, mesh=mesh, in_specs=(P("gs"),), out_specs=P("gs"),
        check_vma=False,
    )(a)
    # all_to_all of a [W, ...] per-device block = global transpose of blocks
    blocks = np.asarray(a).reshape(W, W, 2)
    expected = blocks.transpose(1, 0, 2).reshape(W * W, 2)
    np.testing.assert_array_equal(np.asarray(out), expected)
