"""Microbench: per-gaussian gradient reduction variants at bench scale.

After the id-sort, grads are [Wc~11, P] rows sorted by gaussian id with
per-gaussian boundaries `positions` [E+1]. The reduction is
sum-per-segment, formulated as cumsum + boundary gather. Variants differ
in layout (where P lands: sublanes vs lanes) and gather granularity.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

P = 8_650_752
E = 2_794_625
Wc = 11


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    rows = [jnp.asarray(rng.standard_normal(P).astype(np.float32))
            for _ in range(Wc)]
    # ~3 slots per gaussian boundaries
    cnt = rng.integers(0, 7, E)
    pos = np.concatenate([[0], np.cumsum(cnt)]).clip(0, P).astype(np.int32)
    positions = jnp.asarray(pos)

    # A: current — stack [P, Wc], cumsum axis 0, row-gather [E+1, Wc]
    def variant_a(positions, *rows):
        v_rows = jnp.stack(rows, axis=1)
        cs = jnp.concatenate(
            [jnp.zeros((1, Wc), jnp.float32), jnp.cumsum(v_rows, axis=0)],
            axis=0,
        )
        csg = cs[positions]
        return csg[1:] - csg[:-1]

    # B: per-row 1-D cumsum + 1-D gathers
    def variant_b(positions, *rows):
        outs = []
        for r in rows:
            cs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(r)])
            g = cs[positions]
            outs.append(g[1:] - g[:-1])
        return jnp.stack(outs, axis=1)

    # C: [Wc, P] stacked, cumsum axis 1 (lanes), take along lanes
    def variant_c(positions, *rows):
        m = jnp.stack(rows, axis=0)
        cs = jnp.cumsum(m, axis=1)
        cs = jnp.concatenate([jnp.zeros((Wc, 1), jnp.float32), cs], axis=1)
        g = jnp.take(cs, positions, axis=1)
        return (g[:, 1:] - g[:, :-1]).T

    # D: per-row cumsum + gather, no stack (returns tuple)
    def variant_d(positions, *rows):
        outs = []
        for r in rows:
            cs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(r)])
            g = jnp.take(cs, positions)
            outs.append(g[1:] - g[:-1])
        return tuple(outs)

    a = timeit("A stack[P,Wc] cumsum0 rowgather", jax.jit(variant_a), positions, *rows)
    b = timeit("B per-row cumsum + gather", jax.jit(variant_b), positions, *rows)
    c = timeit("C [Wc,P] cumsum1 lanegather", jax.jit(variant_c), positions, *rows)
    d = timeit("D per-row no-stack", jax.jit(variant_d), positions, *rows)
    print("allclose b:", bool(jnp.allclose(a, b, atol=1e-3)),
          "c:", bool(jnp.allclose(a, c, atol=1e-3)), flush=True)

    # the id-sort payload count scaling
    ids = jnp.asarray(rng.integers(0, E, P).astype(np.int32))
    for n in (2, 6, 10, 12):
        ops = (ids,) + tuple(rows[: n - 1])
        f = jax.jit(lambda *xs: jax.lax.sort(xs, num_keys=1, is_stable=False))
        timeit(f"idsort ops={n}", f, *ops)


if __name__ == "__main__":
    main()
