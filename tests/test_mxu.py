"""Exactness of the 3-component bf16 MXU decomposition (ops/mxu.py).

The hot kernels multiply f32 data against 0/1 matrices (triangular scans,
one-hot selections).  These tests pin the bit-exactness claims that let the
kernels run those matmuls in 3 bf16 passes instead of Precision.HIGHEST's 6:
  * one-hot selection reproduces every operand bit-for-bit (single-term
    sums of exact products), across the full f32 magnitude range;
  * the scan matmul matches a f64 reference within f32 accumulation noise.

Runs in interpret/CPU mode in CI; the same assertions run on hardware with
GSPLAT_TPU_TEST_PLATFORM=tpu (where the bf16 matmuls hit the real MXU).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ops.mxu import dot_01_exact, sel_01_exact


def _hard_values(rng, n):
    """f32 values spanning the ranges the pipeline moves."""
    vals = np.concatenate([
        rng.standard_normal(n).astype(np.float32),
        (rng.standard_normal(n) * 1e6).astype(np.float32),
        (rng.standard_normal(n) * 1e-6).astype(np.float32),
        rng.integers(0, 2**24, n).astype(np.float32),  # exact int transport
        -rng.integers(0, 2**24, n).astype(np.float32),
        np.full(n, 3.38e38, np.float32),  # largest exact magnitude
        np.full(n, 1e-30, np.float32),  # smallest exact magnitude
        np.zeros(n, np.float32),
    ])
    rng.shuffle(vals)
    return vals


def test_sel_one_hot_bit_exact():
    rng = np.random.default_rng(0)
    W, C, F = 256, 128, 12
    x = _hard_values(rng, W * F // 8)[: F * W].reshape(F, W)
    src = rng.integers(0, W, C)
    onehot = np.zeros((C, W), np.float32)
    onehot[np.arange(C), src] = 1.0

    out = jax.jit(sel_01_exact)(jnp.asarray(x), jnp.asarray(onehot))
    expect = x[:, src]
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_sel_no_hit_is_zero():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    onehot = jnp.zeros((64, 128), jnp.float32)
    out = jax.jit(sel_01_exact)(x, onehot)
    np.testing.assert_array_equal(np.asarray(out), np.zeros((4, 64)))


def test_scan_matmul_f32_accurate():
    rng = np.random.default_rng(2)
    S, L = 64, 128
    x = (rng.standard_normal((S, L)) * rng.choice([1e-3, 1.0, 1e3], (S, L))
         ).astype(np.float32)
    tri = np.triu(np.ones((L, L), np.float32))  # T[i,j]=1 iff i<=j

    out = np.asarray(jax.jit(dot_01_exact)(jnp.asarray(x), jnp.asarray(tri)))
    ref = np.cumsum(x.astype(np.float64), axis=1)

    def highest(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    base = np.asarray(jax.jit(highest)(jnp.asarray(x), jnp.asarray(tri)))
    # f32 accumulation noise only — the same error class as HIGHEST
    scale = np.abs(x).sum(axis=1, keepdims=True)  # worst-case partial sum
    err_out = np.abs(out - ref) / scale
    err_base = np.abs(base - ref) / scale
    assert err_out.max() < 1e-6, err_out.max()
    assert err_out.max() < max(4.0 * err_base.max(), 1e-7)
