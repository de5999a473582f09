"""Stage-by-stage timing of the rasterization pipeline at bench scale.

Times each piece of ops/rasterize.py separately on the real chip so
optimization effort goes where the milliseconds are.  Also microbenches
lax.sort operand/key scaling at worklist size.
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
from gsplat_tpu.ops.gather_pallas import CH, LANE, W_A, _hi_lo
from gsplat_tpu.ops.rasterize_pallas import DEFAULT_CHUNK, TILE, _bwd_call, _fwd_call
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.utils.data import load_test_data


def _sync(out):
    # axon gotcha: block_until_ready can return early; force a host
    # transfer of one element, which waits for the device queue to drain
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

    # --- compaction sort (depth-ordered) ---
    def compact(m2, cn, op, rad, dep):
        iota = jnp.arange(E, dtype=jnp.int32)
        alive = (rad > 0).all(axis=-1)
        n_live = jnp.sum(alive.astype(jnp.int32))
        ckey = (~alive).astype(jnp.int32)
        dep_key = jnp.where(alive, dep, jnp.inf)
        comp = jax.lax.sort(
            (ckey, dep_key, iota, m2[:, 0], m2[:, 1], rad[:, 0], rad[:, 1],
             cn[:, 0], cn[:, 1], cn[:, 2], op, iota // N),
            num_keys=3, is_stable=False,
        )
        rank = jax.lax.sort((comp[2], iota), num_keys=1, is_stable=False)[1]
        return comp, rank, n_live

    comp, rank, n_live = timeit(
        "compaction sorts (2x at E)", jax.jit(compact), m2, cn, op, rad, dep
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

    def emit(m2f, cnf, clf, opf, depthf, rank):
        ops_c = jax.lax.sort(
            (rank, m2f[:, 0], m2f[:, 1], cnf[:, 0], cnf[:, 1],
             cnf[:, 2], opf) + tuple(clf[:, i] for i in range(D)),
            num_keys=1, is_stable=False,
        )
        g_rows = list(ops_c[1:])
        ok = dummy_i == 0
        g_rows = [jnp.where(ok, r, 0.0) for r in g_rows]
        g_rows += [jnp.zeros_like(depthf)] * (
            rz._round_up(len(g_rows), 8) - len(g_rows)
        )
        table_g = jnp.stack([rz._pad_tail(r, W_A, 0.0) for r in g_rows])
        exh, exl = _hi_lo(plan.rr_cum_ex)
        inh, inl = _hi_lo(plan.rr_cum_in)
        tot_hi, tot_lo = _hi_lo(plan.rr_cum_in[-1:])
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
        R = 6 + D
        r_pad = rz._round_up(R + 2, 8)
        return expand_emission2(
            table_rr, table_g, plan.win1, plan.win2, plan.n_slots,
            n_render=R, r_pad=r_pad, tile_w=tw,
            tiles_per_im=tw * th, sentinel=T, k=K,
        )

    clf = cl
    opf = op
    keys, fields = timeit(
        "compact-sort + emission tables + expand",
        jax.jit(emit), m2, cn, clf, opf, dep, rank,
    )

    R = 6 + D
    pos_iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    operands = (keys, pos_iota) + tuple(fields[i] for i in range(R))

    # --- the big sort ---
    s = timeit(
        "BIG SORT (11 ops, 2 keys, P)",
        jax.jit(lambda *xs: jax.lax.sort(xs, num_keys=2, is_stable=False)),
        *operands,
    )

    keys_s, flat_s = s[0], s[1]
    srows = list(s[2:])
    srows += [jnp.zeros_like(srows[0])] * (rz._round_up(R, 8) - R)
    sorted_rows = jnp.stack(srows)

    def spans(keys_s):
        bounds = jnp.searchsorted(
            keys_s, jnp.arange(T + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        starts = bounds[:-1]
        counts = bounds[1:] - starts
        base = starts // DEFAULT_CHUNK
        heads = starts - base * DEFAULT_CHUNK
        return bounds, starts, counts, base, heads

    bounds, starts, counts, base, heads = timeit(
        "searchsorted spans", jax.jit(spans), keys_s
    )
    sorted_pad = jnp.pad(sorted_rows, ((0, 0), (0, 2 * DEFAULT_CHUNK)))

    fwd_out = timeit(
        "FWD kernel",
        jax.jit(
            lambda sp, b, h, c: _fwd_call(
                sp, b, h, c, n_channels=D, tiles_w=tw,
                tiles_per_image=tw * th, width=W, height=H, n_tiles=T,
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
            )
        ),
        sorted_pad, base, heads, counts, v_pix, v_tf, pix_out, t_final,
    )
    (v_slot,) = bwd_out

    P = flat_s.shape[0]
    live_total = bounds[-1:]

    def reduce_grads(v_slot, flat_s, live_total):
        pos = jnp.arange(P, dtype=jnp.int32)
        in_live = pos < live_total[0]
        ids = jnp.where(in_live, flat_s, rz.ID_SENTINEL)
        n_rows_grad = 6 + D
        grads = jnp.where(in_live[None, :], v_slot[:, :P], 0.0)
        operands = (ids,) + tuple(grads[i] for i in range(n_rows_grad))
        srt = jax.lax.sort(operands, num_keys=1, is_stable=False)
        return srt

    srt = timeit(
        "BWD ID-SORT (10 ops, 1 key, P)",
        jax.jit(reduce_grads), v_slot, flat_s, live_total,
    )

    def reduce_rest(srt):
        v_rows = jnp.stack(srt[1:], axis=1)
        Wc = v_rows.shape[1]
        cs = jnp.concatenate(
            [jnp.zeros((1, Wc), v_rows.dtype), jnp.cumsum(v_rows, axis=0)],
            axis=0,
        )
        cum0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), plan.rr_cum_in])
        gb = cum0[plan.gh_bounds]
        gcnt = gb[1:] - gb[:-1]
        n_slots = plan.n_slots[0]
        gvrc = jnp.where(
            dummy_i == 1, 0,
            jnp.clip(jnp.minimum(gb[:-1] + gcnt, n_slots) - gb[:-1], 0, gcnt),
        )
        ends = jnp.cumsum(gvrc).astype(jnp.int32)
        positions = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends])
        csg = cs[positions]
        v_gauss = csg[1:] - csg[:-1]
        uns = jax.lax.sort(
            (perm,) + tuple(v_gauss[:, i] for i in range(v_gauss.shape[1])),
            num_keys=1, is_stable=False,
        )
        return jnp.stack(uns[1:], axis=1)

    timeit("cumsum+boundary reduce + unsort", jax.jit(reduce_rest), srt)

    # --- lax.sort scaling microbench ---
    print("\n--- lax.sort scaling at P =", P, "---", flush=True)
    key1 = keys
    key2 = pos_iota.astype(jnp.float32)
    pay = [fields[i] for i in range(R)]
    for n_ops, n_keys in [(2, 1), (2, 2), (4, 2), (8, 2), (12, 2), (12, 1)]:
        ops = ([key1, key2] + pay)[:n_ops]
        if n_keys == 1:
            ops = [key1] + ops[1:]
        f = jax.jit(
            lambda *xs: jax.lax.sort(xs, num_keys=n_keys, is_stable=False)
        )
        timeit(f"sort ops={n_ops} keys={n_keys}", f, *ops)

    # int32 vs f32 second key
    ops = [key1, key2.view(jnp.int32) if hasattr(key2, "view") else key2]


if __name__ == "__main__":
    main()
