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

from typing import Tuple

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


def dot_01_faithful(x: jax.Array, m01: jax.Array) -> jax.Array:
    """x [R, K] f32 @ m01 [K, C] (0/1-valued) -> [R, C] f32, TWO bf16 passes.

    Data-side 2-split (nearest-rounded): per-element residual <= 2**-18 |x|
    with random sign, f32 accumulation.  For scan matrices (sums over <= K
    exact terms) the error class is ~2**-18 * sqrt(K) relative — 2/3 the
    MXU cost of `dot_01_exact` at ~2e-5 relative accuracy, which is far
    inside the compositing pipeline's gates (alpha threshold 1/255,
    transmittance cutoff 1e-4).
    """
    x1, x2 = split2_fast(x)
    xc = jnp.concatenate(
        [x1.astype(jnp.bfloat16), x2], axis=0
    )
    o = jax.lax.dot_general(
        xc,
        m01.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    r = o.shape[0] // 2
    return o[0:r] + o[r:]


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


def _round_bf16(x: jax.Array) -> jax.Array:
    """Round an f32 to the nearest bf16-exact f32 (mantissa bit-add+mask).

    Unlike `_trunc_bf16` (truncation toward zero), this rounds half away
    from zero, so split residuals have RANDOM sign: dropped cross terms in
    `dot_faithful` accumulate as sqrt(K) instead of the coherent K growth
    truncation causes (every truncated residue shares the product's sign).
    The +0x8000 carry propagates into the exponent exactly as FP rounding
    requires; sign-magnitude layout makes it symmetric for negatives.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits + jnp.int32(0x8000), jnp.int32(-65536)),
        jnp.float32,
    )


def split2(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """f32 [R, C] -> two bf16-exact f32 components (nearest-rounded).

    x1 + x2 captures ~17 of f32's 24 mantissa bits; the residual is
    <= 2**-18 |x| with random sign (see `_round_bf16`).
    """
    x1 = _round_bf16(x)
    r = x - x1  # exact (Sterbenz: x1 within one bf16 ulp of x)
    x2 = _round_bf16(r)
    return x1, x2


def split2_fast(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """f32 [R, C] -> (bf16-exact f32 hi, bf16 lo): 5-op faithful split.

    `split2` spends ~9 VPU ops per array (two nearest-roundings via
    bitcast/add/mask chains); this variant truncates the hi part (3 bit
    ops, unfoldable) and lets the RESIDUAL's native f32->bf16 convert do
    the one rounding that matters: x ~ x1 + bf16(r) with error
    |r - bf16(r)| <= 2**-9 |r| <= 2**-17 |x|, random sign (the residual's
    rounding direction is uncorrelated with the product sign).  One ulp
    looser than `split2` (2**-17 vs 2**-18) at half the VPU cost — used in
    the rasterization kernels' per-chunk splits, where the split overhead
    is a measurable slice of the whole pipeline.

    Returns (x1 as f32 — exactly bf16-representable, r as bf16).
    """
    x1 = _trunc_bf16(x)
    return x1, (x - x1).astype(jnp.bfloat16)


def dot_faithful(
    a: jax.Array, b: jax.Array, dims=(((1,), (0,)), ((), ()))
) -> jax.Array:
    """a [.., K, ..] f32 @ b f32 -> f32 with ~2**-16-relative per-product
    error: both sides 2-split into bf16, three cross products
    (a1*b1 + a1*b2 + a2*b1) in ONE bf16 matmul via K-axis concatenation,
    f32 accumulation.

    3 K-passes vs Precision.HIGHEST's 6 (which 3-splits both sides).  Used
    for the rasterization kernels' data x data matmuls (color
    accumulation, pixel-basis moment reductions), where the dropped
    a2*b2 + residual terms are ~2**-16 of each product — far below the
    compositing pipeline's gate/oracle tolerances, at half the MXU cost.
    The contraction must be a single axis on each side (`dims` as in
    jax.lax.dot_general; default: last of a vs first of b).
    """
    (ka,), (kb,) = dims[0]
    a1, a2 = split2_fast(a)
    b1, b2 = split2_fast(b)
    a1 = a1.astype(jnp.bfloat16)
    b1 = b1.astype(jnp.bfloat16)
    ac = jnp.concatenate([a1, a1, a2], axis=ka)
    bc = jnp.concatenate([b1, b2, b1], axis=kb)
    return jax.lax.dot_general(
        ac, bc, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


def dot_exact2_exact3(
    a: jax.Array, b: jax.Array, dims=(((1,), (0,)), ((), ()))
) -> jax.Array:
    """f32-EXACT-class matmul for an `a` side that is exactly 2-splittable
    (<= 16 significant mantissa bits) against arbitrary f32 `b`.

    a = a1 + a2 (exact), b = b1 + b2 + b3 (exact 3-split): all SIX cross
    products are bf16 x bf16 (8-bit x 8-bit mantissas -> exact in the f32
    accumulator), so the only rounding is the f32 accumulation itself —
    the same class as a native f32 dot, at 6 K-passes in ONE bf16 matmul.
    Used for the conic evaluation sigma = basis @ coeffs, where faithful
    2x2 splitting is not enough (the per-slot constant/linear/quadratic
    terms cancel to a small sigma near gaussian centers).
    """
    (ka,), (kb,) = dims[0]
    a1, a2 = split2_fast(a)  # exact for <=16-bit mantissas
    a1 = a1.astype(jnp.bfloat16)
    b1 = _trunc_bf16(b)
    r = b - b1
    b2 = _trunc_bf16(r)
    b3 = r - b2
    ac = jnp.concatenate([a1, a1, a1, a2, a2, a2], axis=ka)
    bc = jnp.concatenate([b1, b2, b3, b1, b2, b3], axis=kb).astype(
        jnp.bfloat16
    )
    return jax.lax.dot_general(
        ac, bc, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


def dot_exact2_faithful(
    a: jax.Array, b: jax.Array, dims=(((1,), (0,)), ((), ()))
) -> jax.Array:
    """Like `dot_faithful` but for an `a` side that is EXACTLY 2-splittable
    (<= 16 significant mantissa bits, e.g. the rasterizer's pixel-moment
    basis: half-integer coords and their products need <= 10 bits).

    All four cross products ride one bf16 matmul (4 K-passes vs HIGHEST's
    6), leaving only a * r_b with |r_b| <= 2**-18 |b| and random sign —
    per-product error ~2**-18, within 2x of HIGHEST at 2/3 the MXU cost.
    """
    (ka,), (kb,) = dims[0]
    a1, a2 = split2_fast(a)  # exact: a1 + a2 == a for <=16-bit mantissas
    b1, b2 = split2_fast(b)
    ac = jnp.concatenate([a1.astype(jnp.bfloat16), a1.astype(jnp.bfloat16),
                          a2, a2], axis=ka)
    bc = jnp.concatenate([b1.astype(jnp.bfloat16), b2,
                          b1.astype(jnp.bfloat16), b2], axis=kb)
    return jax.lax.dot_general(
        ac, bc, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# bf16-pair packing (the inference fast path's sort-payload compression)
# ---------------------------------------------------------------------------


def pack_bf16_pair(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Round two f32 arrays to bf16 and pack into one f32-typed carrier.

    The carrier's bits are (bf16(hi) << 16) | bf16(lo) — an opaque payload
    that rides sorts/DMAs as a single row at half the bytes of its inputs.
    Rel. error per component ~2**-9 (bf16 rounding): inference-grade only.
    Works inside Pallas TPU kernels and in plain jnp (same-width bitcasts
    only, which Mosaic supports).
    """
    bc = jax.lax.bitcast_convert_type
    uh = bc(hi.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    ul = bc(lo.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return bc((uh << 16) | ul, jnp.float32)


def unpack_bf16_pair(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Inverse of `pack_bf16_pair`: f32 carrier -> (hi f32, lo f32)."""
    bc = jax.lax.bitcast_convert_type
    u = bc(packed, jnp.uint32)
    hi = bc((u >> 16).astype(jnp.uint16), jnp.bfloat16)
    lo = bc((u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    return hi.astype(jnp.float32), lo.astype(jnp.float32)


def dot_exact2_plain(
    a: jax.Array, b: jax.Array, dims=(((1,), (0,)), ((), ()))
) -> jax.Array:
    """Exact-2-splittable `a` times a bf16-grade `b`: 2 MXU passes.

    For the inference fast path, where `b` is unpacked from bf16 pairs
    (already ~2**-9): splitting `b` further buys nothing, but the basis
    side still needs its exact 2-split — its quadratic terms cancel near
    gaussian centers, and a plain bf16 basis would put an absolute
    ~2**-9 * max|term| error into the cancellation.
    """
    (ka,), (kb,) = dims[0]
    a1, a2 = split2_fast(a)
    ac = jnp.concatenate(
        [a1.astype(jnp.bfloat16).astype(jnp.float32), a2], axis=ka
    )
    b16 = b.astype(jnp.bfloat16)
    bc = jnp.concatenate([b16, b16], axis=kb)
    return jax.lax.dot_general(
        ac.astype(jnp.bfloat16), bc,
        dimension_numbers=dims, preferred_element_type=jnp.float32,
    )


def dot_01_plain(x: jax.Array, m01: jax.Array) -> jax.Array:
    """Single-pass bf16 scan matmul (inference-grade, ~2**-9 data rounding)."""
    return jax.lax.dot(
        x.astype(jnp.bfloat16), m01.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def dot_plain_faithful(
    a: jax.Array, b: jax.Array, dims=(((1,), (1,)), ((), ()))
) -> jax.Array:
    """bf16-grade `a` times a faithful-2-split `b`: 2 MXU passes.

    For accumulating bf16-sourced colors against f32 compositing weights:
    re-rounding the weights to one bf16 would add ~2**-9 relative noise
    on the weight side; the 2-split keeps it at ~2**-17.
    """
    (ka,), (kb,) = dims[0]
    b1, b2 = split2_fast(b)
    a16 = a.astype(jnp.bfloat16)
    ac = jnp.concatenate([a16, a16], axis=ka)
    bc = jnp.concatenate([b1.astype(jnp.bfloat16), b2], axis=kb)
    return jax.lax.dot_general(
        ac, bc, dimension_numbers=dims, preferred_element_type=jnp.float32
    )
