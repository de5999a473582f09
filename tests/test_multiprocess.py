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
