"""Real multi-process jax.distributed test through distributed.cli.

The analog of the reference's tests/_test_distributed.py (:43-122), which
spawns real workers over NCCL.  Here two OS processes form a CPU
collective group via jax.distributed (coordinator env), build a global
2-process mesh, and run a cross-process psum + all_gather through
`gsplat_tpu.distributed.cli` — the exact multi-host bootstrap path a TPU
pod uses (one process per host).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])
from gsplat_tpu.distributed import cli

def main(local_rank, world_rank, world_size, args):
    assert world_size == 2, world_size
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())  # global devices across both processes
    assert len(devs) == 2, devs
    mesh = Mesh(devs, ("x",))

    def f(v):
        s = jax.lax.psum(v, "x")
        g = jax.lax.all_gather(v, "x", tiled=True)
        return s, g

    fn = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=P("x"), out_specs=(P("x"), P("x")),
            check_vma=False,
        )
    )
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("x")),
        np.asarray([[float(world_rank + 1)]], np.float32),
        (2, 1),
    )
    s, g = fn(arr)
    total = float(jax.device_get(s.addressable_shards[0].data)[0, 0])
    assert total == 3.0, total  # 1 + 2 across processes
    print(f"RANK{world_rank}_OK", flush=True)

cli(main)
"""


def test_two_process_cli(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    portno = port.getsockname()[1]
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{portno}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
            REPO_ROOT=str(Path(__file__).resolve().parents[1]),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)  # one device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"RANK{rank}_OK" in out, out[-2000:]


RENDER_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])
from gsplat_tpu.distributed import cli

def main(local_rank, world_rank, world_size, args):
    # The actual sharded renderer across a REAL process boundary: dense and
    # packed exchanges, forward + gradient, vs single-device rasterization
    # computed locally on each rank (reference tests/_test_distributed.py
    # :43-122 runs the same comparison over NCCL workers).
    assert world_size == 2, world_size
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gsplat_tpu.parallel import rasterization_sharded
    from gsplat_tpu.rendering import rasterization

    W, H, N, C = 48, 32, 64, 2
    rng = np.random.default_rng(11)  # identical scene on both ranks
    means = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2, 8, N)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.4 + 0.05).astype(np.float32)
    opacities = rng.random(N).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, :3, 3] = rng.uniform(-0.5, 0.5, (C, 3)).astype(np.float32)
    Ks = np.tile(
        np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]],
                 np.float32), (C, 1, 1),
    )
    tgt = np.random.default_rng(4).random((C, H, W, 3)).astype(np.float32)

    devs = np.array(jax.devices())
    assert len(devs) == 2
    mesh = Mesh(devs, ("gs",))
    sh = NamedSharding(mesh, P("gs"))

    def glob(x):
        n = x.shape[0] // 2
        loc = x[world_rank * n : (world_rank + 1) * n]
        return jax.make_array_from_process_local_data(sh, loc, x.shape)

    g = {
        "means": glob(means), "quats": glob(quats), "scales": glob(scales),
        "opacities": glob(opacities), "colors": glob(colors),
        "viewmats": glob(viewmats), "Ks": glob(Ks), "tgt": glob(tgt),
    }

    # local single-device reference (full scene)
    ref_c, _, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(colors),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
    )
    ref_c = np.asarray(ref_c)

    for packed in (False, True):
        out_c = jax.jit(
            lambda m, q, s, o, col, vm, k: rasterization_sharded(
                m, q, s, o, col, vm, k, W, H, mesh=mesh, packed=packed,
                packed_capacity=N if packed else None,
            )[0]
        )(g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
          g["viewmats"], g["Ks"])
        mine = np.asarray(out_c.addressable_shards[0].data)
        np.testing.assert_allclose(
            mine, ref_c[world_rank : world_rank + 1], atol=3e-5,
            err_msg=f"packed={packed}",
        )

    # gradients through the cross-process exchange (all global arrays must
    # be jit ARGUMENTS — closure constants can't be fetched cross-process)
    def loss_sharded(m, q, s, o, col, vm, k, t):
        c, _, _ = rasterization_sharded(
            m, q, s, o, col, vm, k, W, H, mesh=mesh,
        )
        return jnp.mean((c - t) ** 2)

    def loss_single(m):
        c, _, _ = rasterization(
            m, jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opacities), jnp.asarray(colors),
            jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
        )
        return jnp.mean((c - jnp.asarray(tgt)) ** 2)

    gm = jax.jit(jax.grad(loss_sharded))(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        g["viewmats"], g["Ks"], g["tgt"],
    )
    gm_ref = np.asarray(jax.grad(loss_single)(jnp.asarray(means)))
    mine = np.asarray(gm.addressable_shards[0].data)
    n = N // 2
    want = gm_ref[world_rank * n : (world_rank + 1) * n]
    scale = max(float(np.abs(gm_ref).max()), 1e-6)
    np.testing.assert_allclose(mine, want, atol=5e-4 * scale)

    print(f"RANK{world_rank}_RENDER_OK", flush=True)

cli(main)
"""


def test_two_process_sharded_render(tmp_path):
    """rasterization_sharded (dense AND packed) + grads across a real
    2-process mesh — the only place the ragged exchange's cross-process
    control flow runs before a pod."""
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    portno = port.getsockname()[1]
    port.close()

    script = tmp_path / "render_worker.py"
    script.write_text(RENDER_WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{portno}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
            REPO_ROOT=str(Path(__file__).resolve().parents[1]),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)  # one device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"RANK{rank}_RENDER_OK" in out, out[-2000:]
