"""Micro-profile of _core_bwd's reduce internals: cumsum vs boundary gather
vs unsort, at bench scale (P=8.65M slots, E=2.79M gaussians, 9 grad rows)."""

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


P = 8_650_752
E = 2_794_625
Wc = 9

key = jax.random.PRNGKey(0)
v_rows = jax.random.normal(key, (P, Wc), jnp.float32)
# monotone boundary positions: E+1 sorted ints in [0, P]
pos_np = np.sort(np.random.randint(0, P + 1, size=E + 1)).astype(np.int32)
pos_np[0], pos_np[-1] = 0, P
positions = jnp.asarray(pos_np)
perm = jnp.asarray(np.random.permutation(E).astype(np.int32))

cs_fn = jax.jit(lambda v: jnp.concatenate(
    [jnp.zeros((1, Wc), v.dtype), jnp.cumsum(v, axis=0)], axis=0))
cs = timeit("cumsum [P,9]", cs_fn, v_rows)

gather_fn = jax.jit(lambda cs, p: cs[p])
csg = timeit("boundary row gather cs[positions] [E+1,9]", gather_fn, cs, positions)

diff_fn = jax.jit(lambda csg: csg[1:] - csg[:-1])
v_gauss = timeit("diff", diff_fn, csg)

unsort_fn = jax.jit(lambda p, vg: jnp.stack(jax.lax.sort(
    (p,) + tuple(vg[:, i] for i in range(Wc)), num_keys=1, is_stable=False
)[1:], axis=1))
timeit("unsort at E (10 ops)", unsort_fn, perm, v_gauss)

# alternatives ---------------------------------------------------------------
# cumsum per column (stacked rows layout [9, P])
v_rows_t = v_rows.T
cs_t_fn = jax.jit(lambda v: jnp.cumsum(v, axis=1))
timeit("cumsum [9,P] axis=1", cs_t_fn, v_rows_t)

# gather transposed layout
cs_t = jnp.pad(jnp.cumsum(v_rows_t, axis=1), ((0, 0), (1, 0)))
gather_t_fn = jax.jit(lambda cs, p: cs[:, p])
timeit("boundary gather transposed [9, E+1]", gather_t_fn, cs_t, positions)

# gather via take_along_axis
ta_fn = jax.jit(lambda cs, p: jnp.take(cs, p, axis=0))
timeit("jnp.take rows", ta_fn, cs, positions)
