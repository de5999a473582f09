"""Pallas TPU segmented row-sum: per-gaussian reduction of slot gradients.

Replaces the backward reduction's `cumsum + boundary gather` (XLA's gather
runs per-element on TPU: ~65 ms for 9 x 2.8M boundary reads at bench
scale) with a windowed one-hot MXU reduction: one grid step per chunk of
512 output segments (gaussians), a dynamic while-loop DMA-ing the chunk's
contiguous slot range in 512-lane pieces, and one bf16 matmul per piece
accumulating every segment's partial sum at once.

Input is the id-sorted gradient stream (slots grouped by gaussian —
emission order), segment boundaries are a monotone [E+1] cumsum.  This is
the TPU analog of the reference backward's atomicAdd scatter to gaussians
(RasterizeToPixels3DGSSerialBatchBwd.cu:42-320) — deterministic f32
accumulation in segment order, and numerically BETTER than the previous
cumsum-difference (no catastrophic cancellation against long prefixes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import split2

SEG = 512  # output segments per grid step
PIECE = 512  # slot lanes per DMA piece
NBUF = 4  # DMA pipeline depth


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _segsum_kernel(
    # scalar prefetch
    bstart_ref,  # [G] int32: floor-128 slot base per chunk
    npiece_ref,  # [G] int32: DMA pieces per chunk
    # inputs
    btab_ref,  # (8, SEG) f32: rows lo_hi, lo_lo, hi_hi, hi_lo (segment
    #            start/end boundaries as exact 12-bit hi/lo f32 pairs)
    data_hbm,  # [F, P_pad] f32 in HBM
    # outputs
    out_ref,  # (F, SEG)
    # scratch
    buf_ref,  # (NBUF, F, PIECE)
    acc_ref,  # (F, SEG)
    sem,  # (NBUF,)
    *,
    live_rows: int,
):
    c = pl.program_id(0)
    base = bstart_ref[c]
    n_p = npiece_ref[c]

    lo = btab_ref[0:1, :] * 4096.0 + btab_ref[1:2, :]  # (1, SEG) f32 exact
    hi = btab_ref[2:3, :] * 4096.0 + btab_ref[3:4, :]
    lo_col = jnp.transpose(lo, (1, 0))  # (SEG, 1)
    hi_col = jnp.transpose(hi, (1, 0))

    def dma(p):
        off = pl.multiple_of(base + p * PIECE, 128)
        slot = jax.lax.rem(p, NBUF)
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(off, PIECE)], buf_ref.at[slot], sem.at[slot]
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(n_p > 0)
    def _():
        for k in range(NBUF):
            @pl.when(k < n_p)
            def _():
                dma(k).start()

        def body(p, _):
            slot = jax.lax.rem(p, NBUF)
            dma(p).wait()

            # slot index per lane, as exact f32 (P < 2**24)
            s_row = (base + p * PIECE) + jax.lax.broadcasted_iota(
                jnp.int32, (1, PIECE), 1
            )
            s_f = s_row.astype(jnp.float32)
            # hot[g, s] = segment g owns slot s; slots outside every
            # segment (head lanes of the floor-128 base, the sentinel
            # tail) match no row
            hot = ((s_f >= lo_col) & (s_f < hi_col)).astype(jnp.float32)

            # mask data lanes outside this chunk's live range (bounds are
            # contiguous, so [first lo, last hi) is exactly the owned
            # span): the sentinel tail may hold garbage/NaN and
            # 0 * NaN = NaN would poison the matmul
            valid = (s_f >= lo[0:1, 0:1]) & (s_f < hi[0:1, SEG - 1 : SEG])
            buf = jnp.where(valid, buf_ref[slot][0:live_rows], 0.0)

            # faithful 2-split bf16 matmul (one-hot side exact in bf16):
            # per-product residual ~2**-18 with random sign — gradient
            # sums in f32 accumulation, same class as the oracle
            b1, b2 = split2(buf)
            bc = jnp.concatenate([b1, b2], axis=0).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                bc,
                hot.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2F_live, SEG)
            fl = live_rows
            acc_ref[0:fl] += part[0:fl] + part[fl : 2 * fl]

            @pl.when(p + NBUF < n_p)
            def _():
                dma(p + NBUF).start()
            return ()

        jax.lax.fori_loop(0, n_p, body, ())

    out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("n_out", "live_rows"))
def segment_rowsum(
    data: jax.Array,  # [F, P_pad] f32 (id-sorted: slots grouped by segment)
    bounds: jax.Array,  # [E+1] int32 monotone slot boundaries (bounds[0]=0)
    *,
    n_out: int,  # E rounded up to SEG
    live_rows: int,  # rows of `data` to reduce (<= F)
):
    """out[:, g] = sum over data[:, bounds[g]:bounds[g+1]] — [F, n_out]."""
    F = data.shape[0]
    E = bounds.shape[0] - 1
    G = n_out // SEG
    assert n_out % SEG == 0 and n_out >= E

    bpad = jnp.concatenate(
        [bounds, jnp.broadcast_to(bounds[-1:], (n_out - E,))]
    )  # [n_out + 1]
    lo = bpad[:n_out]
    hi = bpad[1 : n_out + 1]
    btab = jnp.stack(
        [
            (lo >> 12).astype(jnp.float32),
            (lo & 0xFFF).astype(jnp.float32),
            (hi >> 12).astype(jnp.float32),
            (hi & 0xFFF).astype(jnp.float32),
            *([jnp.zeros((n_out,), jnp.float32)] * 4),
        ]
    )  # [8, n_out]

    seg_lo = lo.reshape(G, SEG)[:, 0]
    seg_hi = hi.reshape(G, SEG)[:, -1]
    bstart = (seg_lo // 128) * 128
    npiece = -(-(seg_hi - bstart) // PIECE)
    npiece = jnp.maximum(npiece, 0).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, SEG), lambda c, *_: (0, c)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((F, SEG), lambda c, *_: (0, c))],
        scratch_shapes=[
            pltpu.VMEM((NBUF, F, PIECE), jnp.float32),
            pltpu.VMEM((F, SEG), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(_segsum_kernel, live_rows=live_rows),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((F, n_out), jnp.float32)],
        interpret=_interpret(),
    )(bstart.astype(jnp.int32), npiece, btab, data)
    return out
