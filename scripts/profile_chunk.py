"""Chunk-width knee for the fwd/bwd rasterize kernels at bench scale.

Builds the real garden-4k sorted worklist once (same pipeline as
profile_stages.py), then times _fwd_call/_bwd_call at chunk widths
128/256/512 to pick RASTER_CHUNK (ops/rasterize.py).
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
from gsplat_tpu.ops.gather_pallas import CH, W_A, _hi_lo
from gsplat_tpu.ops.rasterize_pallas import TILE, _bwd_call, _fwd_call
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.utils.data import load_test_data


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
    I, D = 1, 3
    cap_total = rz._round_up(8 * 1024 * 1024 + 256 * 1024, CH)
    row_cap = rz._round_up(2 * 1024 * 1024 + 384 * 1024, CH)
    tw, th = -(-W // TILE), -(-H // TILE)
    T = I * tw * th
    K = cap_total // CH

    @jax.jit
    def upstream(means, quats, scales, opac, colors):
        radii, means2d, depths, conics, _ = fully_fused_projection(
            means, None, quats, scales, viewmats, Ks, W, H,
            near_plane=0.01, far_plane=100.0, radius_clip=3.0,
            opacities=opac,
        )
        E = I * N
        m2 = means2d.reshape(E, 2)
        cn = conics.reshape(E, 3)
        op = jnp.broadcast_to(opac, (I, N)).reshape(E)
        cl = jnp.broadcast_to(colors, (I, N, D)).reshape(E, D)
        rad = radii.reshape(E, 2)
        dep = depths.reshape(E)
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
        m2_c = jnp.stack([comp[3], comp[4]], axis=1)
        rad_c = jnp.stack([comp[5], comp[6]], axis=1).astype(jnp.int32)
        cn_c = jnp.stack([comp[7], comp[8], comp[9]], axis=1)
        op_c = comp[10]
        im_c = comp[11].astype(jnp.int32)
        plan = rz.make_tight_plan(
            m2_c, rad_c, cn_c, op_c, im_c, n_live, I, TILE, tw, th,
            cap_total, row_cap,
        )
        rr_geo = jnp.stack([plan.rr_x0, plan.rr_ty, plan.rr_im, plan.rr_gid])
        dummy_i = plan.dummy.astype(jnp.int32)

        from gsplat_tpu.ops.gather_pallas import expand_emission2

        ops_c = jax.lax.sort(
            (rank, m2[:, 0], m2[:, 1], cn[:, 0], cn[:, 1], cn[:, 2], op)
            + tuple(cl[:, i] for i in range(D)),
            num_keys=1, is_stable=False,
        )
        g_rows = list(ops_c[1:])
        ok = dummy_i == 0
        g_rows = [jnp.where(ok, r, 0.0) for r in g_rows]
        g_rows += [jnp.zeros_like(dep)] * (
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
        keys, fields = expand_emission2(
            table_rr, table_g, plan.win1, plan.win2, plan.n_slots,
            n_render=R, r_pad=r_pad, tile_w=tw,
            tiles_per_im=tw * th, sentinel=T, k=K,
        )
        pos_iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
        operands = (keys, pos_iota) + tuple(fields[i] for i in range(R))
        s = jax.lax.sort(operands, num_keys=2, is_stable=False)
        keys_s = s[0]
        srows = list(s[2:])
        srows += [jnp.zeros_like(srows[0])] * (rz._round_up(R, 8) - R)
        sorted_rows = jnp.stack(srows)
        bounds = jnp.searchsorted(
            keys_s, jnp.arange(T + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        return sorted_rows, bounds

    sorted_rows, bounds = upstream(means, quats, scales, opac, colors)
    _sync(bounds)
    print("upstream built; live slots:", int(bounds[-1]), flush=True)

    starts = bounds[:-1]
    counts = bounds[1:] - starts
    rng = np.random.default_rng(0)
    v_pix = jnp.asarray(rng.standard_normal((T, D, 256)).astype(np.float32))
    v_tf = jnp.asarray(rng.standard_normal((T, 1, 256)).astype(np.float32))

    for chunk in (128, 256, 512):
        base = starts // chunk
        heads = starts - base * chunk
        sorted_pad = jnp.pad(sorted_rows, ((0, 0), (0, 2 * chunk)))
        fwd = jax.jit(
            lambda sp, b, h, c, chunk=chunk: _fwd_call(
                sp, b, h, c, n_channels=D, tiles_w=tw,
                tiles_per_image=tw * th, width=W, height=H, n_tiles=T,
                chunk=chunk,
            )
        )
        out = timeit(f"FWD kernel chunk={chunk}", fwd, sorted_pad, base,
                     heads, counts)
        pix_out, t_final = out
        bwd = jax.jit(
            lambda sp, b, h, c, vp, vt, po, tf, chunk=chunk: _bwd_call(
                sp, b, h, c, vp, vt, po, tf, n_channels=D, tiles_w=tw,
                tiles_per_image=tw * th, width=W, height=H, n_tiles=T,
                chunk=chunk,
            )
        )
        timeit(f"BWD kernel chunk={chunk}", bwd, sorted_pad, base, heads,
               counts, v_pix, v_tf, pix_out, t_final)


if __name__ == "__main__":
    main()
