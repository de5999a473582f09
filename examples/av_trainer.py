"""AV trainer: joint camera + spinning-lidar supervision.

Analog of the reference's examples/av_trainer.py (multi-camera photometric
training with lidar distance / raydrop / background losses through
`rasterization(camera_model="lidar")`), self-contained: scene data comes
from an .npz (images, viewmats, Ks, lidar range images, lidar poses, lidar
model arrays) or, with --data synthetic, from a built-in generated scene
(the analog of the reference's monkeypatched av_train_env test fixture —
tests/conftest.py:394-420 in the reference).

Usage:
    python examples/av_trainer.py --data synthetic --max-steps 200
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from dataclasses import dataclass

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.losses import (
    l1_loss,
    lidar_background_loss,
    lidar_distance_loss,
    ssim_loss,
)
from gsplat_tpu.optimizers.adam import adam_init, selective_adam_update
from gsplat_tpu.rendering import rasterization
from gsplat_tpu.sensors.lidars import SpinningDirection, make_lidar
from gsplat_tpu.strategy import MCMCStrategy


@dataclass
class Config:
    data: str = "synthetic"
    result_dir: str = "/tmp/av_trainer"
    max_steps: int = 500
    cap_max: int = 8192
    seed: int = 0
    # loss weights (parity: av_trainer.py Config)
    ssim_lambda: float = 0.2
    lidar_distance_lambda: float = 0.1
    lidar_background_lambda: float = 0.01
    # lrs (simple_trainer defaults)
    means_lr: float = 1.6e-4
    scales_lr: float = 5e-3
    opacities_lr: float = 5e-2
    quats_lr: float = 1e-3
    colors_lr: float = 2.5e-3
    near_plane: float = 0.01
    far_plane: float = 200.0
    isect_capacity: int = 1 << 19


def synthetic_scene(seed=0, n_cams=3, W=96, H=64):
    """A wall + ground scene observed by cameras and a frontal lidar."""
    rng = np.random.default_rng(seed)
    n = 600
    pts = np.concatenate(
        [
            np.c_[np.full(n // 2, 6.0) + rng.normal(0, 0.05, n // 2),
                  rng.uniform(-4, 4, n // 2), rng.uniform(-1, 2, n // 2)],
            np.c_[rng.uniform(1, 6, n // 2), rng.uniform(-4, 4, n // 2),
                  np.full(n // 2, -1.0) + rng.normal(0, 0.05, n // 2)],
        ]
    ).astype(np.float32)
    rgb = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)

    # cameras look along +x (sensor frame z-forward => rotate axes)
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (n_cams, 1, 1))
    for c in range(n_cams):
        viewmats[c, :3, :3] = R
        viewmats[c, :3, 3] = R @ -np.array([0.0, -1.5 + 1.5 * c, 0.3], np.float32)
    Ks = np.tile(
        np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], np.float32),
        (n_cams, 1, 1),
    )

    lidar = make_lidar(
        np.linspace(0.3, -0.45, 24).astype(np.float32),
        np.linspace(math.radians(55), math.radians(-55), 128).astype(np.float32),
        np.zeros(24, np.float32),
        SpinningDirection.CLOCKWISE,
    )
    lidar_viewmats = np.eye(4, dtype=np.float32)[None]
    return dict(
        points=pts, rgb=rgb, viewmats=viewmats, Ks=Ks, W=W, H=H,
        lidar=lidar, lidar_viewmats=lidar_viewmats,
    )


def ncore_scene(
    source,
    camera_ids=None,
    factor: float = 1.0,
    max_frames: int = 8,
    max_points: int = 100_000,
):
    """Build the AV training scene from an NCore v4 sequence.

    `source` is a meta-json path (opens via the ncore SDK) or an
    in-memory SequenceSource (examples/datasets/ncore.py).  Gaussians
    init from the lidar cloud; targets are the real camera frames.
    Reference analog: av_trainer.py consuming NCoreParser/NCoreDataset.
    """
    from datasets.ncore import NCoreDataset, NCoreParser

    parser = NCoreParser(
        source,
        factor=factor,
        camera_ids=camera_ids,
        max_lidar_points=max_points,
        normalize_world_space=False,
    )
    ds = NCoreDataset(parser, split="train")
    n = min(len(ds), max_frames)
    items = [ds[i] for i in range(n)]
    # w2c from c2w (rigid inverse)
    viewmats = []
    for it in items:
        c2w = it["camtoworld"].astype(np.float64)
        w2c = np.eye(4)
        w2c[:3, :3] = c2w[:3, :3].T
        w2c[:3, 3] = -c2w[:3, :3].T @ c2w[:3, 3]
        viewmats.append(w2c.astype(np.float32))
    cid0 = parser.camera_ids[0]
    W, H = parser.imsize_dict[cid0]
    pts = parser.points
    rgb = (
        parser.points_rgb.astype(np.float32) / 255.0
        if len(parser.points_rgb)
        else np.full((len(pts), 3), 0.5, np.float32)
    )
    return dict(
        points=pts.astype(np.float32),
        rgb=np.clip(rgb, 1e-3, 1 - 1e-3),
        viewmats=np.stack(viewmats),
        Ks=np.stack([it["K"] for it in items]),
        W=W, H=H,
        images=np.stack([it["image"] for it in items]),
        masks=(
            np.stack([it["mask"] for it in items])
            if "mask" in items[0]
            else None
        ),
        lidar=None,  # photometric-only: range images not in the protocol
        lidar_viewmats=None,
        parser=parser,
    )


class AVRunner:
    def __init__(self, cfg: Config, scene):
        self.cfg = cfg
        self.scene = scene
        os.makedirs(cfg.result_dir, exist_ok=True)
        cap = cfg.cap_max
        pts = scene["points"]
        n0 = pts.shape[0]
        rng = np.random.default_rng(cfg.seed)

        def pad(x, fill=0.0):
            out = np.full((cap,) + x.shape[1:], fill, np.float32)
            out[: x.shape[0]] = x
            return jnp.asarray(out)

        d = np.linalg.norm(
            pts - pts[rng.integers(0, n0, n0)], axis=-1, keepdims=True
        ) + 1e-2
        self.params = dict(
            means=pad(pts),
            scales=pad(np.log(np.repeat(d * 0.3, 3, axis=1))),
            quats=pad(np.tile([1.0, 0, 0, 0], (n0, 1))),
            opacities=pad(np.full(n0, 0.5), fill=-10.0),
            colors=pad(np.log(scene["rgb"] / (1 - scene["rgb"] + 1e-6))),
        )
        self.alive = jnp.arange(cap) < n0
        self.opt_state = adam_init(self.params)
        self.strategy = MCMCStrategy(cap_max=cap)
        self.strategy_state = self.strategy.initialize_state()
        self.key = jax.random.PRNGKey(cfg.seed)
        self.lrs = {
            "means": cfg.means_lr * 8.0,
            "scales": cfg.scales_lr,
            "opacities": cfg.opacities_lr,
            "quats": cfg.quats_lr,
            "colors": cfg.colors_lr,
        }

    def render_cams(self, p, alive, viewmats, Ks):
        op = jnp.where(alive, jax.nn.sigmoid(p["opacities"]), 0.0)
        return rasterization(
            p["means"], p["quats"], jnp.exp(p["scales"]), op,
            jax.nn.sigmoid(p["colors"]),
            viewmats, Ks, self.scene["W"], self.scene["H"],
            near_plane=self.cfg.near_plane, far_plane=self.cfg.far_plane,
            isect_capacity=self.cfg.isect_capacity,
        )

    def render_lidar(self, p, alive, viewmats):
        op = jnp.where(alive, jax.nn.sigmoid(p["opacities"]), 0.0)
        return rasterization(
            p["means"], p["quats"], jnp.exp(p["scales"]), op,
            jax.nn.sigmoid(p["colors"][..., :1]),
            viewmats, jnp.eye(3)[None], 0, 0,
            camera_model="lidar", lidar_coeffs=self.scene["lidar"],
            with_ut=True, with_eval3d=True,
            render_mode="RGB-d", global_z_order=False,
            near_plane=self.cfg.near_plane, far_plane=self.cfg.far_plane,
            isect_capacity=self.cfg.isect_capacity,
        )

    def make_targets(self):
        """Camera + lidar ground truth.

        Real datasets (ncore/npz) supply camera frames directly; the
        synthetic regime renders them from the initial (true) state.
        Lidar targets only exist when the scene carries a lidar model.
        """
        if self.scene.get("images") is not None:
            imgs = np.asarray(self.scene["images"], np.float32)
        else:
            cams = jnp.asarray(self.scene["viewmats"])
            Ks = jnp.asarray(self.scene["Ks"])
            out, _, _ = self.render_cams(self.params, self.alive, cams, Ks)
            imgs = jax.device_get(out)
        if self.scene.get("lidar") is None:
            return imgs, None, None
        lvm = jnp.asarray(self.scene["lidar_viewmats"])
        lr_img, lr_alpha, _ = self.render_lidar(self.params, self.alive, lvm)
        gt_dist = lr_img[..., -1:]
        valid = lr_alpha > 0.5
        return imgs, jax.device_get(gt_dist), jax.device_get(valid)

    def train(self):
        cfg = self.cfg
        cams = jnp.asarray(self.scene["viewmats"])
        Ks = jnp.asarray(self.scene["Ks"])
        has_lidar = self.scene.get("lidar") is not None
        lvm = (
            jnp.asarray(self.scene["lidar_viewmats"]) if has_lidar else None
        )
        gt_imgs, gt_dist, gt_valid = self.make_targets()
        gt_imgs = jnp.asarray(gt_imgs)
        if has_lidar:
            gt_dist = jnp.asarray(gt_dist)
            gt_valid = jnp.asarray(gt_valid)
            bg_mask = ~gt_valid
        pix_mask = (
            jnp.asarray(self.scene["masks"])[..., None].astype(jnp.float32)
            if self.scene.get("masks") is not None
            else None
        )

        if self.scene.get("images") is None:
            # synthetic regime: perturb away from the truth so training
            # has work to do
            k1, self.key = jax.random.split(self.key)
            self.params["means"] = self.params[
                "means"
            ] + 0.05 * jax.random.normal(k1, self.params["means"].shape)

        @jax.jit
        def train_step(params, opt_state, alive):
            def loss_fn(p):
                colors, _, meta = self.render_cams(p, alive, cams, Ks)
                colors = jnp.clip(colors, 0.0, 1.0)
                tgt = gt_imgs
                if pix_mask is not None:
                    colors = colors * pix_mask
                    tgt = tgt * pix_mask
                loss = l1_loss(colors, tgt) * (1 - cfg.ssim_lambda)
                loss += ssim_loss(colors, tgt) * cfg.ssim_lambda
                if has_lidar:
                    li, la, _ = self.render_lidar(p, alive, lvm)
                    loss += cfg.lidar_distance_lambda * lidar_distance_loss(
                        li[..., -1:], gt_dist, gt_valid
                    )
                    loss += (
                        cfg.lidar_background_lambda
                        * lidar_background_loss(la, bg_mask)
                    )
                return loss, meta["radii"]

            (loss, radii), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            visibility = (radii > 0).all(-1).any(0) & alive
            params2, opt_state2 = selective_adam_update(
                params, g, opt_state, self.lrs, visibility=visibility
            )
            return params2, opt_state2, loss

        losses = []
        t0 = time.time()
        for step in range(cfg.max_steps):
            self.params, self.opt_state, loss = train_step(
                self.params, self.opt_state, self.alive
            )
            if step % 50 == 0 or step == cfg.max_steps - 1:
                l = float(loss)
                losses.append(l)
                print(f"step {step:5d} loss {l:.5f}", flush=True)
        print(f"trained {cfg.max_steps} steps in {time.time()-t0:.1f}s")
        return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="synthetic",
                    help="synthetic | ncore")
    ap.add_argument("--ncore-meta", default="",
                    help="NCore v4 sequence meta-json (for --data ncore)")
    ap.add_argument("--cameras", default="",
                    help="comma-separated NCore camera ids")
    ap.add_argument("--factor", type=float, default=1.0)
    ap.add_argument("--max-steps", type=int, default=500)
    ap.add_argument("--result-dir", default="/tmp/av_trainer")
    args = ap.parse_args()
    cfg = Config(
        data=args.data, max_steps=args.max_steps, result_dir=args.result_dir
    )
    if cfg.data == "synthetic":
        scene = synthetic_scene()
    elif cfg.data == "ncore":
        if not args.ncore_meta:
            raise SystemExit("--data ncore requires --ncore-meta <path>")
        scene = ncore_scene(
            args.ncore_meta,
            camera_ids=(
                args.cameras.split(",") if args.cameras else None
            ),
            factor=args.factor,
        )
    else:
        raise SystemExit("unknown --data (synthetic | ncore)")
    runner = AVRunner(cfg, scene)
    losses = runner.train()
    assert losses[-1] <= losses[0], "loss did not decrease"


if __name__ == "__main__":
    main()
