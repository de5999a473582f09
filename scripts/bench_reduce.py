"""Microbench: backward per-gaussian reduction layouts at bench scale.

The round-2 stage budget showed `cumsum + boundary reduce + unsort` at
~128 ms.  Hypothesis: the [P, 9] layout pads the 9-wide minor dim to 128
lanes (14x traffic) in the axis-0 cumsum.  Compare against a field-major
[9, P] lane cumsum + lane boundary gather.
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
E = 2_796_870
W = 9


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
    print(f"{name:48s} {dt:9.2f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (W, P), jnp.float32)
    # E+1 monotone boundaries over [0, P]
    pos_np = np.sort(
        np.random.default_rng(0).integers(0, P, size=E + 1)
    ).astype(np.int32)
    pos_np[0], pos_np[-1] = 0, P
    positions = jnp.asarray(pos_np)
    perm = jnp.asarray(np.random.default_rng(1).permutation(E).astype(np.int32))

    def slot_major(v, positions, perm):
        v_rows = jnp.stack([v[i] for i in range(W)], axis=1)  # [P, W]
        cs = jnp.concatenate(
            [jnp.zeros((1, W), v.dtype), jnp.cumsum(v_rows, axis=0)], axis=0
        )
        csg = cs[positions]
        v_gauss = csg[1:] - csg[:-1]
        uns = jax.lax.sort(
            (perm,) + tuple(v_gauss[:, i] for i in range(W)),
            num_keys=1, is_stable=False,
        )
        return jnp.stack(uns[1:], axis=1)

    def field_major(v, positions, perm):
        cs = jnp.concatenate(
            [jnp.zeros((W, 1), v.dtype), jnp.cumsum(v, axis=1)], axis=1
        )  # [W, P+1]
        csg = cs[:, positions]  # [W, E+1] lane gather
        v_gauss = csg[:, 1:] - csg[:, :-1]  # [W, E]
        uns = jax.lax.sort(
            (perm,) + tuple(v_gauss[i] for i in range(W)),
            num_keys=1, is_stable=False,
        )
        return jnp.stack(uns[1:], axis=1)

    def field_major_take(v, positions, perm):
        cs = jnp.concatenate(
            [jnp.zeros((W, 1), v.dtype), jnp.cumsum(v, axis=1)], axis=1
        )
        csg = jnp.take(cs, positions, axis=1)
        v_gauss = csg[:, 1:] - csg[:, :-1]
        uns = jax.lax.sort(
            (perm,) + tuple(v_gauss[i] for i in range(W)),
            num_keys=1, is_stable=False,
        )
        return jnp.stack(uns[1:], axis=1)

    # pieces, to see where time goes
    timeit("cumsum [P,9] axis0", jax.jit(
        lambda v: jnp.cumsum(jnp.stack([v[i] for i in range(W)], axis=1), axis=0)
    ), v)
    timeit("cumsum [9,P] axis1", jax.jit(lambda v: jnp.cumsum(v, axis=1)), v)
    cs = jnp.cumsum(v, axis=1)
    timeit("lane gather [9,P] at E+1", jax.jit(
        lambda cs, p: cs[:, p]
    ), cs, positions)
    cs_r = jnp.cumsum(jnp.stack([v[i] for i in range(W)], axis=1), axis=0)
    timeit("row gather [P,9] at E+1", jax.jit(
        lambda cs, p: cs[p]
    ), cs_r, positions)
    timeit("unsort (10 ops at E)", jax.jit(
        lambda g, perm: jax.lax.sort(
            (perm,) + tuple(g[i][:E] for i in range(W)), num_keys=1,
            is_stable=False)
    ), v[:, :E], perm)

    a = timeit("FULL slot-major (round-2 shape)", jax.jit(slot_major), v, positions, perm)
    b = timeit("FULL field-major", jax.jit(field_major), v, positions, perm)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    print("parity ok")


if __name__ == "__main__":
    main()
