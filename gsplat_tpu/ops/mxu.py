"""Exact half-cost MXU matmuls against 0/1 matrices (TPU kernels' hot path).

Every large matmul in the rasterization kernels multiplies f32 DATA against
a matrix that is EXACTLY representable in bf16 — triangular scan matrices
(`ops/rasterize_pallas.py:_cumsum_lane`) and one-hot selection masks
(`ops/gather_pallas.py:_sel`). `Precision.HIGHEST` reaches f32 accuracy by
decomposing BOTH operands into bf16 triples (6 MXU passes). Decomposing
only the data side into three bf16 components

    x = x1 + x2 + x3,  x1 = bf16(x), x2 = bf16(x - x1), x3 = bf16(rest)

and running ONE native bf16 matmul on the row-concatenated components gives
the same class of result (each product term is exact: bf16 value times
0.0/1.0; accumulation is f32 either way) in 3 passes — half the MXU time.

Exactness domains (all verified on hardware by tests/test_mxu.py):
  * one-hot selection: each output is a single product term ->
    out = x1 + x2 + x3 = x, bit-exact for x == 0 and |x| in
    [~2e-31, 3.39e38]: above bf16's max finite the value itself is not
    bf16-splittable, and below 2**23 * bf16_min_normal the trailing
    residual (as small as |x| * 2**-23) flushes as a bf16 denormal
    (graceful: relative error <= 2**-16 down to ~3e-36, and such
    magnitudes are sub-threshold everywhere in this pipeline — alpha
    gates at 1/255, depths clamp at the near plane, cumsum ints < 2**24
    split exactly into 8+8+8 mantissa bits).
  * scan matrices: sums of exact per-element terms with f32 accumulation —
    the same rounding class as HIGHEST (which also accumulates in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _trunc_bf16(x: jax.Array) -> jax.Array:
    """Truncate an f32 to its top 8 mantissa bits (a bf16-exact f32).

    Bit-masking, NOT a rounding convert: XLA's allow_excess_precision
    (default on) folds f32->bf16->f32 convert chains to identity, which
    would erase the residual components.  The masked value converts to
    bf16 EXACTLY (low mantissa bits are zero), so later converts are safe.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-65536)), jnp.float32
    )


def split3(x: jax.Array) -> jax.Array:
    """f32 [R, C] -> bf16 [3R, C]: exact three-component decomposition.

    x1 + x2 + x3 == x bit-for-bit (truncation splits the 24-bit mantissa
    into 8+8+8); each component is exactly bf16-representable.
    """
    x1 = _trunc_bf16(x)
    r = x - x1  # exact: r carries mantissa bits 8..23 of x
    x2 = _trunc_bf16(r)
    x3 = r - x2  # exact: the last 8 mantissa bits
    return jnp.concatenate(
        [x1.astype(jnp.bfloat16), x2.astype(jnp.bfloat16),
         x3.astype(jnp.bfloat16)],
        axis=0,
    )


def _sum3(o: jax.Array) -> jax.Array:
    """[3R, C] -> [R, C]: recombine the three component products."""
    r = o.shape[0] // 3
    return o[0:r] + o[r : 2 * r] + o[2 * r :]


def dot_01_exact(x: jax.Array, m01: jax.Array) -> jax.Array:
    """x [R, K] f32  @  m01 [K, C] (0/1-valued)  ->  [R, C] f32.

    Three bf16 passes; f32-exact (see module docstring). `m01` must be
    exactly bf16-representable (0/1 matrices are).
    """
    o = jax.lax.dot_general(
        split3(x),
        m01.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return _sum3(o)


def sel_01_exact(x: jax.Array, onehot_t: jax.Array) -> jax.Array:
    """x [R, W] f32  (x)  onehot_t [C, W] (0/1)  ->  [R, C] f32.

    Contraction over the shared W axis (dot_general (((1,), (1,)), ...)).
    With at most one hot entry per output, the result is bit-exact
    (single-term sums of exact products).
    """
    o = jax.lax.dot_general(
        split3(x),
        onehot_t.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return _sum3(o)
