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


def endonerf_scene(cfg: Config, data_dir: str, factor: int = 4,
                   max_frames: int = 6):
    """Real surgical data: EndoNeRF frames + depth-unprojected init.

    The G-SHARP data recipe (reference dynamic_surgical_trainer consuming
    endo_loader): gaussians init by unprojecting frame-0 depth through K
    at tissue pixels; every gaussian is dynamic; per-frame tissue masks
    gate the photometric loss (tool pixels excluded).
    """
    from PIL import Image

    from datasets.endonerf import EndoNeRFDataset, EndoNeRFParser

    parser = EndoNeRFParser(data_dir)
    ds = EndoNeRFDataset(parser, split="video")
    n_t = min(len(ds), max_frames)
    W, H = parser.width // factor, parser.height // factor
    K = parser.K.copy()
    K[:2] /= factor

    imgs, masks, viewmats, times = [], [], [], []
    depth0 = None
    for i in range(n_t):
        it = ds[i]
        img = np.asarray(
            Image.fromarray(
                (it["image"] * 255).astype(np.uint8)
            ).resize((W, H), Image.BILINEAR),
            np.float32,
        ) / 255.0
        m = np.asarray(
            Image.fromarray((it["mask"] * 255).astype(np.uint8)).resize(
                (W, H), Image.NEAREST
            ),
            np.float32,
        ) / 255.0
        imgs.append(img)
        masks.append(m)
        times.append(float(it["time"]))
        c2w = it["camtoworld"].astype(np.float64)
        w2c = np.eye(4)
        w2c[:3, :3] = c2w[:3, :3].T
        w2c[:3, 3] = -c2w[:3, :3].T @ c2w[:3, 3]
        viewmats.append(w2c.astype(np.float32))
        if i == 0:
            depth0 = np.asarray(
                Image.fromarray(it["depth"]).resize((W, H), Image.NEAREST),
                np.float32,
            )

    # init points: unproject frame-0 depth at valid tissue pixels
    yy, xx = np.mgrid[0:H, 0:W]
    valid = (depth0 > 0) & (masks[0] > 0.5)
    z = depth0[valid]
    x = (xx[valid] + 0.5 - K[0, 2]) / K[0, 0] * z
    y = (yy[valid] + 0.5 - K[1, 2]) / K[1, 1] * z
    cam_pts = np.stack([x, y, z], -1)
    c2w0 = ds[0]["camtoworld"].astype(np.float64)
    pts = cam_pts @ c2w0[:3, :3].T + c2w0[:3, 3]
    rgb = imgs[0][valid]
    keep = np.random.default_rng(cfg.seed).choice(
        len(pts), min(len(pts), cfg.cap * 3 // 4), replace=False
    )
    cfg.W, cfg.H, cfg.n_times = W, H, n_t
    return dict(
        points=pts[keep].astype(np.float32),
        # ~2-pixel screen footprint at the observed depth
        scale0=np.maximum(2.0 * z[keep] / K[0, 0], 1e-4).astype(np.float32),
        rgb=np.clip(rgb[keep].astype(np.float32), 1e-3, 1 - 1e-3),
        dyn_mask=np.ones(len(keep), bool),  # the whole tissue deforms
        viewmats=np.stack(viewmats)[:, None],  # [T, 1, 4, 4]
        Ks=np.tile(K[None], (1, 1, 1)),
        times=np.asarray(times, np.float32),
        gt=np.stack(imgs)[:, None],  # [T, 1, H, W, 3]
        masks=np.stack(masks)[:, None, :, :, None],  # [T, 1, H, W, 1]
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steps", type=int, default=300)
    ap.add_argument("--data", default="synthetic",
                    help="synthetic | endonerf")
    ap.add_argument("--data_dir", default="")
    ap.add_argument("--factor", type=int, default=4)
    args = ap.parse_args()
    cfg = Config(max_steps=args.max_steps)
    if args.data == "endonerf":
        if not args.data_dir:
            raise SystemExit("--data endonerf requires --data_dir")
        scene = endonerf_scene(cfg, args.data_dir, factor=args.factor)
    else:
        scene = synthetic_dynamic_scene(cfg)
    losses = run_training(cfg, scene)
    if args.data == "synthetic":
        # the demo regime must recover the known displaced scene
        assert losses[-1] < losses[0], "loss did not decrease"


def run_training(cfg: Config, scene):
    cap = cfg.cap
    n0 = len(scene["points"])
    rng = np.random.default_rng(cfg.seed)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[: x.shape[0]] = x
        return jnp.asarray(out)

    params = dict(
        means=pad(scene["points"]),
        scales=pad(
            np.log(
                np.broadcast_to(
                    np.asarray(
                        scene.get("scale0", 0.06), np.float32
                    ).reshape(-1, 1),
                    (n0, 3),
                )
            ).astype(np.float32)
        ),
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

    Ks = jnp.asarray(scene["Ks"])
    W, H = cfg.W, cfg.H
    # [T, C, 4, 4] per-time camera set (synthetic: same cams every t)
    vm = np.asarray(scene["viewmats"])
    if vm.ndim == 3:
        vm = np.tile(vm[None], (cfg.n_times, 1, 1, 1))
    viewmats_t = jnp.asarray(vm)

    def render(p, t, viewmats, hex_tr, def_p):
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

    from gsplat_tpu.losses import masked_l1, masked_ssim

    if scene.get("gt") is not None:
        # real data: camera frames are the targets
        gt = jnp.asarray(scene["gt"])  # [T, C, H, W, 3]
        loss_masks = (
            jnp.asarray(scene["masks"])
            if scene.get("masks") is not None
            else None
        )
    else:
        # demo regime: render the TRUE displaced scenes as targets
        outs = []
        for ti, t in enumerate(scene["times"]):
            p_true = dict(params)
            p_true["means"] = pad(scene["displaced"](float(t)))
            img, _, _ = rasterization(
                p_true["means"], params["quats"], jnp.exp(params["scales"]),
                jnp.where(alive, jax.nn.sigmoid(params["opacities"]), 0.0),
                jax.nn.sigmoid(params["colors"]), viewmats_t[ti], Ks, W, H,
                isect_capacity=1 << 18,
            )
            outs.append(jax.device_get(img))
        gt = jnp.asarray(np.stack(outs))  # [T, 1, H, W, 3]
        loss_masks = None

    lrs_splats = dict(
        means=cfg.lr_splats_means, scales=cfg.lr_splats,
        quats=cfg.lr_splats, opacities=cfg.lr_splats, colors=cfg.lr_splats,
    )

    @jax.jit
    def train_step(params, hex_tr, def_p, os_, oh, od, t, vm_t, gt_img,
                   mask_img):
        def loss_fn(p, h, d):
            img, _, meta = render(p, t, vm_t, h, d)
            img = jnp.clip(img, 0, 1)
            if loss_masks is not None:
                # tissue-include mask: tool pixels excluded from the loss
                # (G-SHARP masked_l1/masked_ssim, reference losses)
                loss = masked_l1(img, gt_img, mask_img) * (
                    1 - cfg.ssim_lambda
                )
                loss += (
                    1.0 - masked_ssim(img, gt_img, mask_img)
                ) * cfg.ssim_lambda
            else:
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
                opt_deform, float(scene["times"][ti]), viewmats_t[ti],
                gt[ti],
                loss_masks[ti] if loss_masks is not None else gt[ti][..., :1],
            )
        )
        if step % 50 == 0 or step == cfg.max_steps - 1:
            l = float(loss)
            losses.append(l)
            print(f"step {step:5d} t={ti} loss {l:.5f}", flush=True)
    print(f"trained {cfg.max_steps} steps in {time.time()-t0:.1f}s")
    return losses


if __name__ == "__main__":
    main()
