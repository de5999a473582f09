"""Dynamic (deformable) scene trainer — the G-SHARP surgical recipe.

Analog of the reference's examples/dynamic_surgical_trainer.py: gaussians
carry a dynamic mask; before rasterization the dynamic subset is routed
through HexPlaneField -> DeformNetwork to get time-dependent deltas on
(means, quats, opacities); HexPlane/DeformNet trainables live in their own
optimizer (they are not per-gaussian, so strategy topology ops must not
touch them). Self-contained synthetic data (an oscillating blob over a
static background) replaces the EndoNeRF loaders, mirroring the
reference's monkeypatched trainer tests.

Usage:
    python examples/dynamic_surgical_trainer.py --max-steps 300
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from dataclasses import dataclass

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.contrib.dynamic import (
    deform_network_apply,
    deform_network_init,
    hexplane_apply,
    hexplane_init,
    hexplane_regularization,
)
from gsplat_tpu.losses import l1_loss, ssim_loss
from gsplat_tpu.optimizers.adam import adam_init, adam_update, selective_adam_update
from gsplat_tpu.rendering import rasterization


@dataclass
class Config:
    max_steps: int = 300
    cap: int = 2048
    W: int = 80
    H: int = 60
    n_times: int = 6
    seed: int = 0
    ssim_lambda: float = 0.2
    lambda_hexplane_reg: float = 1e-4
    lr_splats_means: float = 2e-3
    lr_splats: float = 5e-3
    lr_hexplane: float = 5e-3
    lr_deform: float = 1.6e-3


def synthetic_dynamic_scene(cfg: Config):
    """Static ground + an oscillating cluster; cameras fixed, time varies."""
    rng = np.random.default_rng(cfg.seed)
    n_static, n_dyn = 400, 120
    static = np.c_[
        rng.uniform(-2, 2, n_static), rng.uniform(-1.5, 1.5, n_static),
        rng.uniform(3.5, 5.0, n_static),
    ].astype(np.float32)
    dyn0 = np.c_[
        rng.normal(0, 0.25, n_dyn), rng.normal(0, 0.25, n_dyn),
        rng.normal(4.0, 0.15, n_dyn),
    ].astype(np.float32)
    pts = np.concatenate([static, dyn0])
    rgb = rng.uniform(0.1, 0.9, (len(pts), 3)).astype(np.float32)
    dyn_mask = np.zeros(len(pts), bool)
    dyn_mask[n_static:] = True
    viewmats = np.eye(4, dtype=np.float32)[None]
    Ks = np.array(
        [[[60.0, 0, cfg.W / 2], [0, 60.0, cfg.H / 2], [0, 0, 1]]], np.float32
    )
    times = np.linspace(0, 1, cfg.n_times).astype(np.float32)

    def displaced(t):
        out = pts.copy()
        out[n_static:, 0] += 0.35 * np.sin(2 * np.pi * t)
        out[n_static:, 1] += 0.2 * np.cos(2 * np.pi * t)
        return out

    return dict(
        points=pts, rgb=rgb, dyn_mask=dyn_mask, viewmats=viewmats, Ks=Ks,
        times=times, displaced=displaced,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steps", type=int, default=300)
    args = ap.parse_args()
    cfg = Config(max_steps=args.max_steps)
    scene = synthetic_dynamic_scene(cfg)
    cap = cfg.cap
    n0 = len(scene["points"])
    rng = np.random.default_rng(cfg.seed)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[: x.shape[0]] = x
        return jnp.asarray(out)

    params = dict(
        means=pad(scene["points"]),
        scales=pad(np.full((n0, 3), np.log(0.06), np.float32)),
        quats=pad(np.tile([1.0, 0, 0, 0], (n0, 1))),
        opacities=pad(np.full(n0, 1.5, np.float32), fill=-10.0),
        colors=pad(np.log(scene["rgb"] / (1 - scene["rgb"] + 1e-6))),
    )
    alive = jnp.arange(cap) < n0
    dyn_mask = jnp.asarray(np.pad(scene["dyn_mask"], (0, cap - n0)))

    k = jax.random.PRNGKey(cfg.seed)
    k1, k2, k3 = jax.random.split(k, 3)
    hex_params = hexplane_init(
        k1, bounds=6.0,
        planes_config=dict(
            grid_dimensions=2, input_coordinate_dim=4,
            output_coordinate_dim=16, resolution=[24, 24, 24, 12],
        ),
        multires=(1,),
    )
    deform_params = deform_network_init(
        k2, feature_dim=hex_params["feat_dim"], hidden_dim=48, num_layers=2
    )
    # only the plane grids train in hex_params (aabb/config are static)
    hex_train = {"grids": hex_params["grids"]}
    opt_splats = adam_init(params)
    opt_hex = adam_init(hex_train)
    opt_deform = adam_init(deform_params)

    viewmats = jnp.asarray(scene["viewmats"])
    Ks = jnp.asarray(scene["Ks"])
    W, H = cfg.W, cfg.H

    def render(p, t, hex_tr, def_p):
        # deformation routing: HexPlane features at (xyz, t) -> deltas,
        # applied only where dyn_mask (static gaussians bypass the net)
        hp = dict(hex_params)
        hp.update(hex_tr)
        xyzt = jnp.concatenate(
            [p["means"], jnp.full((cap, 1), t, jnp.float32)], axis=1
        )
        feats = hexplane_apply(hp, xyzt)
        m2, q2, o2 = deform_network_apply(
            def_p, p["means"], p["quats"], p["opacities"][:, None], None, feats
        )
        sel = dyn_mask[:, None]
        means = jnp.where(sel, m2, p["means"])
        quats = jnp.where(sel, q2, p["quats"])
        opac = jnp.where(dyn_mask, o2[:, 0], p["opacities"])
        op = jnp.where(alive, jax.nn.sigmoid(opac), 0.0)
        return rasterization(
            means, quats, jnp.exp(p["scales"]), op,
            jax.nn.sigmoid(p["colors"]), viewmats, Ks, W, H,
            isect_capacity=1 << 18,
        )

    # ground-truth frames: render the TRUE displaced scenes (demo regime)
    gt = []
    for t in scene["times"]:
        p_true = dict(params)
        p_true["means"] = pad(scene["displaced"](float(t)))
        img, _, _ = rasterization(
            p_true["means"], params["quats"], jnp.exp(params["scales"]),
            jnp.where(alive, jax.nn.sigmoid(params["opacities"]), 0.0),
            jax.nn.sigmoid(params["colors"]), viewmats, Ks, W, H,
            isect_capacity=1 << 18,
        )
        gt.append(jax.device_get(img))
    gt = jnp.asarray(np.stack(gt))  # [T, 1, H, W, 3]

    lrs_splats = dict(
        means=cfg.lr_splats_means, scales=cfg.lr_splats,
        quats=cfg.lr_splats, opacities=cfg.lr_splats, colors=cfg.lr_splats,
    )

    @jax.jit
    def train_step(params, hex_tr, def_p, os_, oh, od, t, gt_img):
        def loss_fn(p, h, d):
            img, _, meta = render(p, t, h, d)
            img = jnp.clip(img, 0, 1)
            loss = l1_loss(img, gt_img) * (1 - cfg.ssim_lambda)
            loss += ssim_loss(img, gt_img) * cfg.ssim_lambda
            hp = dict(hex_params)
            hp.update(h)
            loss += cfg.lambda_hexplane_reg * hexplane_regularization(hp)
            return loss, meta["radii"]

        (loss, radii), (gp, gh, gd) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(params, hex_tr, def_p)
        vis = (radii > 0).all(-1).any(0) & alive
        params, os_ = selective_adam_update(
            params, gp, os_, lrs_splats, visibility=vis
        )
        hex_tr, oh = adam_update(hex_tr, gh, oh, cfg.lr_hexplane)
        def_p, od = adam_update(def_p, gd, od, cfg.lr_deform)
        return params, hex_tr, def_p, os_, oh, od, loss

    t0 = time.time()
    losses = []
    for step in range(cfg.max_steps):
        ti = step % cfg.n_times
        params, hex_train, deform_params, opt_splats, opt_hex, opt_deform, loss = (
            train_step(
                params, hex_train, deform_params, opt_splats, opt_hex,
                opt_deform, float(scene["times"][ti]), gt[ti],
            )
        )
        if step % 50 == 0 or step == cfg.max_steps - 1:
            l = float(loss)
            losses.append(l)
            print(f"step {step:5d} t={ti} loss {l:.5f}", flush=True)
    print(f"trained {cfg.max_steps} steps in {time.time()-t0:.1f}s")
    assert losses[-1] < losses[0], "loss did not decrease"


if __name__ == "__main__":
    main()
