"""Stage-by-stage timing of the rasterization pipeline at bench scale.

Times each piece of ops/rasterize.py separately on the real chip so
optimization effort goes where the milliseconds are.  Also microbenches
lax.sort operand/key scaling at worklist size, and prints a roofline
table (bytes moved / flops vs v5e peaks) for the measured stages.

Honors GSPLAT_TPU_PACK_SORT / GSPLAT_TPU_PACK_GRADS for the packed
training pipeline's stage shapes.
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

from gsplat_tpu.ops import rasterize as rz
from gsplat_tpu.ops.rasterize import PACK_GRADS, PACK_SORT
from gsplat_tpu.ops.gather_pallas import CH, LANE, W_A, _hi_lo
from gsplat_tpu.ops.rasterize_pallas import (
    TILE, _bwd_call, _fwd_call, grad_pack_rows, packed_rows,
)
from gsplat_tpu.ops.segsum_pallas import PIECE as SEG_PIECE
from gsplat_tpu.ops.segsum_pallas import SEG as SEG_SEG
from gsplat_tpu.ops.segsum_pallas import segment_rowsum
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.utils.data import load_test_data

CHUNK = rz.RASTER_CHUNK


def _sync(out):
    # axon gotcha: block_until_ready can return early; force a host
    # transfer of one element, which waits for the device queue to drain
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


TIMES = {}


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    TIMES[name] = dt
    print(f"{name:40s} {dt:9.2f} ms", flush=True)
    return out


def main():
    means, quats, scales, opac, colors, viewmats, Ks, width, height = (
        load_test_data(scene_grid=5)
    )
    W, H = 3840, 2160
    Ks = Ks[:1].copy()
    Ks[:, 0, :] *= W / width
    Ks[:, 1, :] *= H / height
    viewmats = jnp.asarray(viewmats[:1])
    Ks = jnp.asarray(Ks)
    means, quats, scales, opac, colors = map(
        jnp.asarray, (means, quats, scales, opac, colors)
    )
    N = means.shape[0]
    I = 1
    D = 3
    cap_total = rz._round_up(8 * 1024 * 1024 + 256 * 1024, CH)
    row_cap = rz._round_up(2 * 1024 * 1024 + 384 * 1024, CH)
    tw, th = -(-W // TILE), -(-H // TILE)
    T = I * tw * th
    K = cap_total // CH

    # --- projection ---
    proj = jax.jit(
        lambda m, q, s, o: fully_fused_projection(
            m, None, q, s, viewmats, Ks, W, H,
            near_plane=0.01, far_plane=100.0, radius_clip=3.0,
            opacities=o,
        )
    )
    radii, means2d, depths, conics, _ = timeit(
        "projection", proj, means, quats, scales, opac
    )

    E = I * N
    m2 = means2d.reshape(E, 2)
    cn = conics.reshape(E, 3)
    op = jnp.broadcast_to(opac, (I, N)).reshape(E)
    cl = jnp.broadcast_to(colors, (I, N, D)).reshape(E, D)
    rad = radii.reshape(E, 2)
    dep = depths.reshape(E)

    # --- compaction sort (single sort incl. colors, no rank) ---
    def compact(m2, cn, op, cl, rad, dep):
        iota = jnp.arange(E, dtype=jnp.int32)
        alive = (rad > 0).all(axis=-1)
        n_live = jnp.sum(alive.astype(jnp.int32))
        ckey = (~alive).astype(jnp.int32)
        dep_key = jnp.where(alive, dep, jnp.inf)
        comp = jax.lax.sort(
            (ckey, dep_key, iota, m2[:, 0], m2[:, 1], rad[:, 0], rad[:, 1],
             cn[:, 0], cn[:, 1], cn[:, 2], op, iota // N)
            + tuple(cl[:, i] for i in range(D)),
            num_keys=3, is_stable=False,
        )
        return comp, n_live

    comp, n_live = timeit(
        "compaction sort (15 ops at E)", jax.jit(compact),
        m2, cn, op, cl, rad, dep,
    )
    perm = comp[2]
    m2_c = jnp.stack([comp[3], comp[4]], axis=1)
    rad_c = jnp.stack([comp[5], comp[6]], axis=1)
    cn_c = jnp.stack([comp[7], comp[8], comp[9]], axis=1)
    op_c = comp[10]
    im_c = comp[11]

    # --- tight plan ---
    plan = timeit(
        "make_tight_plan",
        jax.jit(
            lambda a, b, c, d, e, f: rz.make_tight_plan(
                a, b, c, d, e, f, I, TILE, tw, th, cap_total, row_cap
            )
        ),
        m2_c, rad_c, cn_c, op_c, im_c, n_live,
    )
    print("   n_isects:", int(plan.n_isects), " n_slots:", int(plan.n_slots[0]),
          " overflow:", bool(plan.overflow), flush=True)

    rr_geo = jnp.stack([plan.rr_x0, plan.rr_ty, plan.rr_im, plan.rr_gid])
    dummy_i = plan.dummy.astype(jnp.int32)

    # --- emission (tables + expand_emission2) ---
    from gsplat_tpu.ops.gather_pallas import expand_emission2

    def emit(comp, dummy_i, rr_geo, rr_cum_ex, rr_cum_in, win1, win2, n_slots):
        table_g = rz._build_field_table(
            [comp[3], comp[4], comp[7], comp[8], comp[9], comp[10]]
            + list(comp[12:]),
            dummy_i,
        )
        exh, exl = _hi_lo(rr_cum_ex)
        inh, inl = _hi_lo(rr_cum_in)
        tot_hi, tot_lo = _hi_lo(rr_cum_in[-1:])
        pad_hi = jnp.broadcast_to(tot_hi, (W_A,))
        pad_lo = jnp.broadcast_to(tot_lo, (W_A,))
        gidh, gidl = _hi_lo(rr_geo[3])
        f32 = lambda v: v.astype(jnp.float32)
        table_rr = jnp.stack([
            jnp.concatenate([exh, pad_hi]), jnp.concatenate([exl, pad_lo]),
            jnp.concatenate([inh, pad_hi]), jnp.concatenate([inl, pad_lo]),
            rz._pad_tail(f32(rr_geo[0]), W_A, 0.0),
            rz._pad_tail(f32(rr_geo[1]), W_A, 0.0),
            rz._pad_tail(f32(rr_geo[2]), W_A, float(I)),
            rz._pad_tail(gidh, W_A, 0.0),
            rz._pad_tail(gidl, W_A, 0.0),
            *([jnp.zeros((row_cap + W_A,), jnp.float32)] * 7),
        ])
        R_out = packed_rows(D) if PACK_SORT else 6 + D
        r_pad = rz._round_up(R_out + 2, 8)
        return expand_emission2(
            table_rr, table_g, win1, win2, n_slots,
            n_render=6 + D, r_pad=r_pad, tile_w=tw,
            tiles_per_im=tw * th, sentinel=T, k=K, packed=PACK_SORT,
        )

    keys, fields = timeit(
        "emission tables + expand",
        jax.jit(emit), comp, dummy_i, rr_geo,
        plan.rr_cum_ex, plan.rr_cum_in, plan.win1, plan.win2, plan.n_slots,
    )

    R = packed_rows(D) if PACK_SORT else 6 + D
    pos_iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    operands = (keys, pos_iota) + tuple(fields[i] for i in range(R))

    # --- the big sort ---
    s = timeit(
        f"BIG SORT ({R + 2} ops, 2 keys, P)",
        jax.jit(lambda *xs: jax.lax.sort(xs, num_keys=2, is_stable=False)),
        *operands,
    )

    keys_s, emis_s = s[0], s[1]
    srows = list(s[2:])
    srows += [jnp.zeros_like(srows[0])] * (rz._round_up(R, 8) - R)
    sorted_rows = jnp.stack(srows)

    def spans(keys_s):
        bounds = jnp.searchsorted(
            keys_s, jnp.arange(T + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        starts = bounds[:-1]
        counts = bounds[1:] - starts
        base = starts // CHUNK
        heads = starts - base * CHUNK
        return bounds, starts, counts, base, heads

    bounds, starts, counts, base, heads = timeit(
        "searchsorted spans", jax.jit(spans), keys_s
    )
    sorted_pad = jnp.pad(sorted_rows, ((0, 0), (0, 2 * CHUNK)))

    fwd_out = timeit(
        "FWD kernel",
        jax.jit(
            lambda sp, b, h, c: _fwd_call(
                sp, b, h, c, n_channels=D, tiles_w=tw,
                tiles_per_image=tw * th, width=W, height=H, n_tiles=T,
                chunk=CHUNK, packed=PACK_SORT,
            )
        ),
        sorted_pad, base, heads, counts,
    )
    pix_out, t_final = fwd_out

    v_pix = jnp.ones_like(pix_out)
    v_tf = jnp.zeros_like(t_final)
    bwd_out = timeit(
        "BWD kernel",
        jax.jit(
            lambda sp, b, h, c, vp, vt, po, tf: _bwd_call(
                sp, b, h, c, vp, vt, po, tf, n_channels=D, tiles_w=tw,
                tiles_per_image=tw * th, width=W, height=H, n_tiles=T,
                chunk=CHUNK, packed=PACK_SORT, pack_grads=PACK_GRADS,
            )
        ),
        sorted_pad, base, heads, counts, v_pix, v_tf, pix_out, t_final,
    )
    (v_slot,) = bwd_out

    P = emis_s.shape[0]
    live_total = bounds[-1:]

    n_sort_rows = grad_pack_rows(D) if PACK_GRADS else 6 + D

    def id_sort(v_slot, emis_s, live_total):
        pos = jnp.arange(P, dtype=jnp.int32)
        in_live = pos < live_total[0]
        ids = jnp.where(in_live, emis_s, rz.ID_SENTINEL)
        operands = (ids,) + tuple(v_slot[i, :P] for i in range(n_sort_rows))
        return jax.lax.sort(operands, num_keys=1, is_stable=False)

    srt = timeit(
        f"BWD ID-SORT ({n_sort_rows + 1} ops, 1 key, P)",
        jax.jit(id_sort), v_slot, emis_s, live_total,
    )

    def seg_reduce(srt, rr_cum_in, gh_bounds, dummy_i, n_slots_arr, perm):
        if PACK_GRADS:
            from gsplat_tpu.ops.mxu import unpack_bf16_pair

            rows = []
            for r in srt[1:]:
                hi, lo = unpack_bf16_pair(r)
                rows += [hi, lo]
            rows = rows[: 6 + D]
        else:
            rows = list(srt[1:])
        Wc = len(rows)
        F_pad = rz._round_up(Wc, 8)
        rows += [jnp.zeros_like(rows[0])] * (F_pad - Wc)
        data = jnp.pad(jnp.stack(rows), ((0, 0), (0, 2 * SEG_PIECE)))
        cum0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), rr_cum_in])
        gb = cum0[gh_bounds]
        gcnt = gb[1:] - gb[:-1]
        n_slots = n_slots_arr[0]
        gvrc = jnp.where(
            dummy_i == 1, 0,
            jnp.clip(jnp.minimum(gb[:-1] + gcnt, n_slots) - gb[:-1], 0, gcnt),
        )
        ends = jnp.cumsum(gvrc).astype(jnp.int32)
        positions = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends])
        vg = segment_rowsum(
            data, positions, n_out=rz._round_up(E, SEG_SEG), live_rows=Wc
        )
        uns = jax.lax.sort(
            (perm,) + tuple(vg[i, :E] for i in range(Wc)),
            num_keys=1, is_stable=False,
        )
        return jnp.stack(uns[1:], axis=1)

    timeit(
        "segsum reduce + unsort",
        jax.jit(seg_reduce), srt, plan.rr_cum_in, plan.gh_bounds, dummy_i,
        plan.n_slots, perm,
    )

    # --- lax.sort scaling microbench ---
    print("\n--- lax.sort scaling at P =", P, "---", flush=True)
    key1 = keys
    key2 = pos_iota.astype(jnp.float32)
    pay = [fields[i] for i in range(R)]
    for n_ops, n_keys in [(2, 1), (2, 2), (4, 2), (8, 2), (12, 2)]:
        ops = ([key1, key2] + pay)[:n_ops]
        if n_keys == 1:
            ops = [key1] + ops[1:]
        f = jax.jit(
            lambda *xs: jax.lax.sort(xs, num_keys=n_keys, is_stable=False)
        )
        timeit(f"sort ops={n_ops} keys={n_keys}", f, *ops)

    # --- roofline: measured vs v5e speed-of-light per stage ---
    # v5e (1 chip): HBM ~819 GB/s, MXU ~197 TFLOPS bf16 (394 TOPS int8).
    HBM = 819e9
    MXU = 197e12
    GB = 1e9
    n_slots = float(jnp.asarray(plan.n_slots)[0])
    Pf = float(P)
    Ef = float(E)
    F_sort_big = R + 2
    F_idsort = n_sort_rows + 1
    import math as _m

    log2P = _m.log2(Pf)
    log2E = _m.log2(Ef)

    def row(name, meas, bytes_sol, flops_sol, note):
        t_sol = max(bytes_sol / HBM, flops_sol / MXU) * 1e3
        pct = 100.0 * t_sol / max(meas, 1e-9)
        print(
            f"{name:34s} {meas:8.1f} ms   SoL {t_sol:7.2f} ms "
            f"({bytes_sol/GB:6.2f} GB, {flops_sol/1e9:8.1f} GFLOP) "
            f"-> {pct:5.1f}% of SoL   {note}"
        )
        return t_sol

    print("\n--- roofline (speed-of-light = max(HBM bytes, MXU flops); "
          "sorts priced as 4-digit radix-8 rescatter passes) ---")
    tot_meas = 0.0
    tot_sol = 0.0
    # a sort's minimal data movement: 4 radix passes x (read+write) of all
    # operands (32-bit keys, radix-256); XLA's bitonic network instead runs
    # ~log2(n)^2/2 compare-exchange passes over every operand.
    for nm, F_s, n in (
        ("compaction sort", 15, Ef),
        (f"big sort ({F_sort_big} ops)", F_sort_big, Pf),
        (f"bwd id-sort ({F_idsort} ops)", F_idsort, Pf),
    ):
        key = next((k for k in TIMES if k.lower().startswith(nm.split(" (")[0].lower())), None)
        meas = next((v for k, v in TIMES.items() if nm.split(" (")[0].upper() in k.upper()), 0.0)
        b = 4 * 2 * F_s * n * 4.0  # 4 passes x r+w x operands x 4B
        sol = row(nm, meas, b, 0.0, f"bitonic runs ~{log2P**2/2:.0f} passes vs 8 priced")
        tot_meas += meas
        tot_sol += sol
    # expansion: window DMAs + output write + one-hot select matmuls
    F_tab = 16 + 24
    b_exp = (F_tab * 768 * 4.0) * (Pf / 512) + (R + 2) * Pf * 4.0
    fl_exp = Pf * 768 * (F_tab + 4) * 2.0 * 3  # 3-pass exact bf16 splits
    meas = TIMES.get("emission tables + expand", 0.0)
    tot_meas += meas
    tot_sol += row("expansion", meas, b_exp, fl_exp, "windowed one-hot MXU select")
    # fwd kernel: stream worklist + sigma/scan/color matmuls
    R8 = -(-R // 8) * 8
    b_fwd = R8 * Pf * 4.0 + T * (D + 1) * 256 * 4.0
    fl_fwd = Pf * 256 * (48 + 128 * 2 + 2 * D * 3) * 2.0
    meas = TIMES.get("FWD kernel", 0.0)
    tot_meas += meas
    tot_sol += row("fwd kernel", meas, b_fwd, fl_fwd,
                   "+ ~3 VPU transcendentals / slot-pixel")
    # bwd kernel: fwd streams + grad writes + ~2.5x matmul work
    F_out = -(-(n_sort_rows if PACK_GRADS else 6 + D) // 8) * 8
    b_bwd = R8 * Pf * 4.0 + F_out * Pf * 4.0 + 2 * T * (D + 1) * 256 * 4.0
    fl_bwd = fl_fwd * 2.5
    meas = TIMES.get("BWD kernel", 0.0)
    tot_meas += meas
    tot_sol += row("bwd kernel", meas, b_bwd, fl_bwd, "front-to-back replay")
    # segsum reduce + unsort
    meas = TIMES.get("segsum reduce + unsort", 0.0)
    b_seg = 16 * Pf * 4.0 + 15 * Ef * 4.0 * 8
    fl_seg = Pf * 512 * 16 * 2.0 * 2
    tot_meas += meas
    tot_sol += row("segsum + unsort", meas, b_seg, fl_seg, "")
    for nm in ("projection", "make_tight_plan", "searchsorted spans"):
        meas = TIMES.get(nm, 0.0)
        tot_meas += meas
    print(f"{'TOTAL (measured stages)':34s} {tot_meas:8.1f} ms   "
          f"SoL {tot_sol:7.2f} ms -> pipeline at "
          f"{100.0 * tot_sol / max(tot_meas, 1e-9):.1f}% of speed-of-light")


if __name__ == "__main__":
    main()
