"""3D Gaussian Splatting trainer (default / MCMC strategies).

Analog of the reference's examples/simple_trainer.py (Config :79-261,
Runner :384, train loop :795-1198): COLMAP datasets, knn scale init,
sqrt-batch lr scaling, L1+SSIM loss, Default(ADC)/MCMC densification,
exponential means-lr decay, PSNR/SSIM eval, npz checkpoints and PLY export.

TPU-native differences:
  * parameters live in capacity-padded arrays with an `alive` mask (static
    shapes — one compile for the whole run; see gsplat_tpu/strategy/).
  * screen-space densification gradients come from the `means2d_offset`
    cotangent instead of retain_grad.
  * data modes: `--data_dir <colmap dir>` or `--data npz` (the bundled
    garden test scene: 3 views — trains on 2, evals on 1).

Usage:
    python examples/simple_trainer.py mcmc --data npz --max_steps 2000
    python examples/simple_trainer.py default --data_dir <colmap> --factor 4
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from gsplat_tpu.losses import l1_loss, ssim, ssim_loss
from gsplat_tpu.optimizers import adam_init, adam_update, selective_adam_update
from gsplat_tpu.rendering import rasterization
from gsplat_tpu.strategy import DefaultStrategy, MCMCStrategy
from gsplat_tpu.training import (
    apply_appearance,
    apply_ppisp,
    init_ppisp,
    ppisp_regularization,
    apply_pose_deltas,
    bilateral_slice_image,
    init_appearance,
    exponential_lr,
    init_bilateral_grids,
    init_pose_deltas,
    load_lpips_weights,
    lpips,
    lpips_proxy,
    total_variation_loss,
)


@dataclass
class Config:
    strategy: str = "default"  # "default" | "mcmc"
    data: str = "colmap"  # "colmap" | "npz"
    data_dir: str = ""
    factor: int = 4
    result_dir: str = "results/run"
    max_steps: int = 30_000
    batch_size: int = 1
    init_opacity: float = 0.1
    init_scale: float = 1.0  # multiplier on knn-based scale init
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    ssim_lambda: float = 0.2
    near_plane: float = 0.01
    far_plane: float = 1e10
    isect_capacity: int = 4 * 1024 * 1024
    capacity: int = 0  # gaussian capacity; 0 = auto
    cap_max: int = 1_000_000  # MCMC capacity
    refine_every: int = 100
    # DefaultStrategy densify threshold (pixel-unit mean screen-grad
    # norm).  The reference default 2e-4 is calibrated for real-photo
    # gradients; the synthetic clean-target benchmark produces smaller
    # grads — sweep via CLI (see TRAINING_NOTES.md)
    grow_grad2d: float = 2e-4
    # bf16-pair packed sort payloads / per-slot grads: +13% step rate,
    # quality-gated on the 4k MCMC benchmark (40.29 vs 40.73 dB heldout,
    # inside the ±0.8 dB eval swing — docs/perf-analysis.md).  Set False
    # to train on the oracle-exact f32 payload path.
    pack_payload: bool = True
    pack_grads: bool = True
    eval_every: int = 7000
    save_every: int = 7000
    opacity_reg: float = 0.0
    scale_reg: float = 0.0
    # global-norm gradient clip on the splat params (0 = off).  Stabilizes
    # low-view-count regimes where per-step losses vary wildly (see
    # TRAINING_NOTES.md); the reference trains 100+ views and doesn't clip.
    grad_clip: float = 0.0
    seed: int = 42
    # lrs (reference simple_trainer.py:356-377)
    means_lr: float = 1.6e-4
    scales_lr: float = 5e-3
    opacities_lr: float = 5e-2
    quats_lr: float = 1e-3
    sh0_lr: float = 2.5e-3
    shN_lr: float = 2.5e-3 / 20
    # pose optimization (reference simple_trainer.py:213-217,527-535)
    pose_opt: bool = False
    pose_opt_lr: float = 1e-5
    pose_opt_reg: float = 1e-6
    pose_noise: float = 0.0  # perturb training poses (pose-opt testing)
    # bilateral-grid color correction (reference simple_trainer.py:231-235
    # post_processing="bilateral_grid" + lib_bilagrid.py): per-train-view
    # 3D grids of 3x4 color affines, trained jointly with the splats
    bilateral_grid: bool = False
    bilateral_grid_shape: str = "16,16,8"  # grid X,Y,W
    tv_reg: float = 10.0  # TV-loss weight on the grids (reference :982)
    # fly-through rendering after training (reference simple_trainer.py:1303
    # render_traj; :87 render_traj_path)
    render_traj: bool = False
    render_traj_path: str = "interp"  # raw | interp | ellipse | spiral
    traj_frames: int = 60
    # resume from a checkpoint written by _save (reference Config.ckpt :82)
    ckpt: str = ""
    # live training viewer (reference simple_trainer.py Config.disable_viewer;
    # here defaults to disabled so headless benchmark runs stay serverless)
    disable_viewer: bool = True
    viewer_port: int = 8080
    # stop MCMC noise injection at this step (0 = never inject; -1 = always)
    mcmc_noise_stop: int = -1
    # deterministic batches: step over all train views in order instead of
    # sampling with replacement (stabilizes tiny-view-count benchmarks
    # where a random (0,0) draw doubles one view's gradient)
    fixed_batch: bool = False
    # npz benchmark: train from every-k-th point against targets rendered
    # from the FULL point cloud (a real sparse-to-dense reconstruction
    # task — the environment ships no photographs)
    npz_subsample: int = 1
    # npz benchmark: expand the 3 bundled cameras into this many views along
    # an interpolated path and train on those (0 = use the raw 3 views).
    # Fixes the 2-view pathology: with dense multi-view supervision the
    # benchmark is a real reconstruction, not an ill-posed overfit.
    npz_traj_views: int = 0
    # hold out every n-th trajectory view for eval (reference datasets use
    # test_every=8, e.g. examples/datasets/colmap.py)
    npz_eval_every: int = 8
    # optional LPIPS(VGG) weights npz for eval (see training/metrics.py)
    lpips_weights: str = ""
    # export a .ply of the live splats at every save step (reference
    # simple_trainer.py:1073-1105 save_ply)
    save_ply: bool = False
    # run splat compression after training: "" (off) | "png" (reference
    # simple_trainer.py:1412 run_compression + compression/PngCompression)
    compression: str = ""
    # appearance optimization: per-view embedding + MLP color head on top
    # of the base color (reference simple_trainer.py:222-228 app_opt)
    app_opt: bool = False
    app_embed_dim: int = 16
    app_opt_lr: float = 1e-3
    app_opt_reg: float = 1e-6
    # learned per-camera ISP applied to train renders before the loss
    # (reference simple_trainer.py post_processing="ppisp" :231-241;
    # analog module: gsplat_tpu/training/ppisp.py).  Eval renders skip
    # the ISP (identity), like other per-view modules.
    ppisp: bool = False
    ppisp_lr: float = 1e-3
    ppisp_reg: float = 1e-3
    # TensorBoard logging cadence in steps, 0 = off (reference
    # simple_trainer.py Config.tb_every / tb_save_image + :1018-1037)
    tb_every: int = 100
    tb_save_image: bool = False


def _device_mem_gib() -> float:
    """Device bytes in use, GiB (the jax analog of cuda max_memory)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("bytes_in_use", 0) / 1024**3
    except Exception:
        return 0.0


def knn_mean_dist(points: np.ndarray, k: int = 4) -> np.ndarray:
    """Mean distance to the k-1 nearest neighbors (scale init).

    Parity: simple_trainer.py:320-323 (knn -> mean -> scale).
    """
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=k)
    return d[:, 1:].mean(axis=1)


def _invert_se3(mats: jnp.ndarray) -> jnp.ndarray:
    """Differentiable SE3 inverse: [R|t]^-1 = [R^T | -R^T t]."""
    R = mats[..., :3, :3]
    t = mats[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    return jnp.concatenate(
        [top, jnp.broadcast_to(jnp.asarray([[0.0, 0, 0, 1]]), top.shape[:-2] + (1, 4))],
        axis=-2,
    )


def create_splats(
    points: np.ndarray,  # [N, 3]
    rgbs: np.ndarray,  # [N, 3] in [0, 1]
    capacity: int,
    cfg: Config,
    scene_scale: float,
):
    """Initial gaussian params in capacity-padded arrays + alive mask.

    Parity: simple_trainer.py:create_splats_with_optimizers (:288-380).
    """
    N = points.shape[0]
    assert N <= capacity, (N, capacity)
    rng = np.random.default_rng(cfg.seed)

    dist = knn_mean_dist(points)
    # robust clip: isolated outlier points get knn distances orders of
    # magnitude above the bulk (the subsampled garden cloud has points
    # with dist ~200 units vs median ~0.02), which seeds e^5-scale
    # gaussians.  3DGS gradients shrink them within a few hundred steps;
    # 2DGS never moves the normal axis (zero gradient) and the frozen
    # giant s_z then poisons split sampling.  Cap at 10x median — far
    # above any legitimate local spacing.
    dist = np.minimum(dist, 10.0 * max(float(np.median(dist)), 1e-7))
    scales = np.log(np.clip(dist * cfg.init_scale, 1e-7, None))[:, None].repeat(
        3, axis=1
    )
    K = (cfg.sh_degree + 1) ** 2
    # SH DC from rgb (inverse of the +0.5 shift and C0 basis)
    C0 = 0.28209479177387814
    sh0 = ((rgbs - 0.5) / C0)[:, None, :]
    shN = np.zeros((N, K - 1, 3), np.float32)
    quats = rng.random((N, 4), dtype=np.float32)
    opac = np.full(N, math.log(cfg.init_opacity / (1 - cfg.init_opacity)), np.float32)

    def pad(x, fill=0.0):
        tail = np.full((capacity - N,) + x.shape[1:], fill, x.dtype)
        return np.concatenate([x, tail])

    # padding slots get identity quats (zero quats have NaN-jacobian
    # normalization; grads are masked anyway but finite is nicer)
    quats_pad = np.concatenate(
        [quats, np.tile(np.array([1, 0, 0, 0], np.float32), (capacity - N, 1))]
    )
    params = {
        "means": jnp.asarray(pad(points.astype(np.float32))),
        "quats": jnp.asarray(quats_pad),
        "scales": jnp.asarray(pad(scales.astype(np.float32))),
        "opacities": jnp.asarray(pad(opac)),
        "sh0": jnp.asarray(pad(sh0.astype(np.float32))),
        "shN": jnp.asarray(pad(shN)),
        # per-gaussian appearance features (reference simple_trainer.py:344
        # splats["features"] = torch.rand(N, feature_dim) when app_opt);
        # densification duplicates them like any other leaf
        **({"features": jnp.asarray(pad(
            rng.random((N, 32), dtype=np.float32)))} if cfg.app_opt else {}),
    }
    alive = jnp.asarray(np.arange(capacity) < N)
    return params, alive


class Runner:
    # local-frame scale axes the strategy considers for scale tests and
    # split sampling; the surfel (2DGS) runner overrides with (0, 1) — its
    # normal-axis scale has no render gradient (see strategy/default.py)
    strategy_scale_axes: tuple = (0, 1, 2)

    def __init__(self, cfg: Config):
        self.cfg = cfg
        os.makedirs(cfg.result_dir, exist_ok=True)
        self.stats_dir = os.path.join(cfg.result_dir, "stats")
        os.makedirs(self.stats_dir, exist_ok=True)
        self.writer = None
        if cfg.tb_every > 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(
                    log_dir=os.path.join(cfg.result_dir, "tb")
                )
            except ImportError:
                print("tensorboard unavailable; scalar logs go to "
                      "stats.jsonl only", flush=True)

        if cfg.data == "npz":
            from gsplat_tpu.utils.data import load_test_data

            data = np.load(
                os.environ.get(
                    "GSPLAT_TPU_TEST_DATA",
                    "/root/reference/assets/test_garden.npz",
                )
            )
            self.height, self.width = int(data["height"]), int(data["width"])
            viewmats = data["viewmats"].astype(np.float32)
            Ks = data["Ks"].astype(np.float32)
            self._full_points = data["means3d"].astype(np.float32)
            self._full_rgbs = (data["colors"] / 255.0).astype(np.float32)
            points = self._full_points[:: max(cfg.npz_subsample, 1)]
            rgbs = self._full_rgbs[:: max(cfg.npz_subsample, 1)]
            if cfg.npz_traj_views > 0:
                # multi-view benchmark: densify the camera set along an
                # interpolated path through the bundled views, then hold
                # out every npz_eval_every-th for eval.  Views are
                # reordered [train..., eval...] so the target slicing in
                # train() stays positional.
                from datasets.traj import generate_interpolated_path

                c2w = np.linalg.inv(viewmats)[:, :3, :]
                per_seg = max(
                    cfg.npz_traj_views // max(len(c2w) - 1, 1), 1
                )
                path = generate_interpolated_path(c2w, per_seg)
                bottom = np.broadcast_to(
                    np.array([0, 0, 0, 1], np.float32), (len(path), 1, 4)
                )
                c2w4 = np.concatenate(
                    [path.astype(np.float32), bottom], axis=1
                )
                vm = np.linalg.inv(c2w4).astype(np.float32)
                Ks = np.broadcast_to(Ks[:1], (len(vm), 3, 3)).copy()
                idx = np.arange(len(vm))
                held = idx % max(cfg.npz_eval_every, 2) == 1
                order = np.concatenate([idx[~held], idx[held]])
                viewmats, Ks = vm[order], Ks[order]
                n_tr = int((~held).sum())
                self.train_views = list(range(n_tr))
                self.eval_views = list(range(n_tr, len(vm)))
            else:
                # overfit demo: no gt images exist, so render targets are
                # held out later; train views 0..C-2, eval view C-1
                self.train_views = list(range(len(viewmats) - 1))
                self.eval_views = [len(viewmats) - 1]
            self.viewmats, self.Ks = viewmats, Ks
            self.images = None  # targets rendered from init state (demo)
            centers = np.linalg.inv(viewmats)[:, :3, 3]
            self.scene_scale = float(
                np.linalg.norm(centers - centers.mean(0), axis=1).max()
            ) * 1.1
        else:
            from datasets.colmap import Dataset, Parser

            parser = Parser(
                cfg.data_dir, factor=cfg.factor, normalize=True, test_every=8
            )
            self.parser = parser
            self.trainset = Dataset(parser, "train")
            self.valset = Dataset(parser, "val")
            self.scene_scale = parser.scene_scale * 1.1
            points = parser.points
            rgbs = parser.points_rgb.astype(np.float32) / 255.0
            self.width = parser.widths[0]
            self.height = parser.heights[0]
            assert all(w == self.width for w in parser.widths), (
                "uniform image sizes required (crop/resize upstream)"
            )
            w2c = np.linalg.inv(parser.camtoworlds)
            self.viewmats = w2c[self.trainset.indices].astype(np.float32)
            self.Ks = parser.Ks[self.trainset.indices].astype(np.float32)

        self._points_np = np.asarray(points)  # for traj spiral bounds
        N0 = points.shape[0]
        if cfg.strategy == "mcmc":
            capacity = cfg.cap_max
            self.strategy = MCMCStrategy(
                cap_max=cfg.cap_max, refine_every=cfg.refine_every,
                noise_injection_stop_iter=cfg.mcmc_noise_stop,
            )
            self.strategy_state = self.strategy.initialize_state()
        else:
            capacity = cfg.capacity or int(N0 * 6)
            self.strategy = DefaultStrategy(
                refine_every=cfg.refine_every,
                grow_grad2d=cfg.grow_grad2d,
                scale_axes=self.strategy_scale_axes,
            )
            self.strategy_state = self.strategy.initialize_state(
                capacity, scene_scale=self.scene_scale
            )
        self.capacity = capacity
        self.params, self.alive = create_splats(
            points, rgbs, capacity, cfg, self.scene_scale
        )
        self.opt_state = adam_init(self.params)
        self.key = jax.random.PRNGKey(cfg.seed)
        self.start_step = 0

        n_train = (
            len(self.train_views) if cfg.data == "npz"
            else len(self.trainset.indices)
        )
        self.pose_deltas = init_pose_deltas(n_train)
        self.pose_opt_state = adam_init({"pose": self.pose_deltas})
        if cfg.pose_noise > 0:
            # perturb training poses so pose-opt has an error to recover
            rngp = np.random.default_rng(cfg.seed + 1)
            noise = rngp.normal(0, cfg.pose_noise, (n_train, 9)).astype(
                np.float32
            )
            self.pose_perturb = jnp.asarray(noise)
        else:
            self.pose_perturb = None
        if cfg.bilateral_grid:
            gx, gy, gw = (int(v) for v in cfg.bilateral_grid_shape.split(","))
            self.bil_grids = init_bilateral_grids(n_train, gx, gy, gw)
            self.bil_opt_state = adam_init({"bil": self.bil_grids})
            # reference lr: 2e-3 * sqrt(batch), Adam eps 1e-15 (:594-597)
            self.bil_lr = 2e-3 * math.sqrt(cfg.batch_size)
        else:
            self.bil_grids = None
        if cfg.ppisp:
            self.ppisp_params = init_ppisp(
                num_cameras=1, num_frames=n_train
            )
            self.ppisp_opt_state = adam_init({"pp": self.ppisp_params})
        else:
            self.ppisp_params = None
        if cfg.app_opt:
            # per-view embedding + MLP color head (reference
            # simple_trainer.py:222-228; module: training/pose.py)
            self.key, ka = jax.random.split(self.key)
            self.app_params = init_appearance(
                ka, n_train, feature_dim=32,
                embed_dim=cfg.app_embed_dim, sh_degree=cfg.sh_degree,
            )
            self.app_opt_state = adam_init({"app": self.app_params})
        else:
            self.app_params = None
        self.lpips_w = (
            load_lpips_weights(cfg.lpips_weights)
            if cfg.lpips_weights and os.path.exists(cfg.lpips_weights)
            else None
        )

        if cfg.ckpt:
            self._load(cfg.ckpt)

        bs_scale = math.sqrt(cfg.batch_size)
        self.lrs = {
            "means": cfg.means_lr * self.scene_scale * bs_scale,
            "scales": cfg.scales_lr * bs_scale,
            "opacities": cfg.opacities_lr * bs_scale,
            "quats": cfg.quats_lr * bs_scale,
            "sh0": cfg.sh0_lr * bs_scale,
            "shN": cfg.shN_lr * bs_scale,
        }
        if cfg.app_opt:
            # reference simple_trainer.py:346 (features lr = 2.5e-3)
            self.lrs["features"] = cfg.sh0_lr * bs_scale

    def render(self, params, alive, viewmats, Ks, sh_degree, offset=None,
               absgrad=False, app=None, cam_ids=None):
        op = jnp.where(alive, jax.nn.sigmoid(params["opacities"]), 0.0)
        if app is not None:
            # appearance head: per-view MLP color on top of the base color
            # (reference simple_trainer.py:755-765: app_module(features,
            # embed_ids, dirs) + splats["colors"] -> sigmoid).  Here the
            # pre-sigmoid base rides in sh0's DC row.
            cam_pos = _invert_se3(viewmats)[:, :3, 3]  # [C, 3]
            dirs = params["means"][None, :, :] - cam_pos[:, None, :]
            adj = apply_appearance(
                app, params["features"], cam_ids, dirs, sh_degree
            )  # [C, N, 3]
            colors = jax.nn.sigmoid(adj + params["sh0"][None, :, 0, :])
            sh_degree = None
        else:
            colors = jnp.concatenate([params["sh0"], params["shN"]], axis=1)
        return rasterization(
            params["means"],
            params["quats"],
            jnp.exp(params["scales"]),
            op,
            colors,
            viewmats,
            Ks,
            self.width,
            self.height,
            sh_degree=sh_degree,
            near_plane=self.cfg.near_plane,
            far_plane=self.cfg.far_plane,
            isect_capacity=self.cfg.isect_capacity,
            means2d_offset=offset,
            absgrad=absgrad,
            pack_payload=self.cfg.pack_payload,
            pack_grads=self.cfg.pack_grads,
        )

    def make_train_step(self, sh_degree: int):
        cfg = self.cfg
        C = cfg.batch_size
        absgrad = (
            getattr(self.strategy, "absgrad", False)
            if cfg.strategy == "default"
            else False
        )

        @jax.jit
        def train_step(params, opt_state, alive, viewmats, Ks, pixels,
                       pose_deltas, cam_ids, bil_grids, app_params,
                       ppisp_params):
            offset0 = jnp.zeros((C, self.capacity, 2), jnp.float32)

            def loss_fn(p, offset, pose, bil, app, pp):
                vm = viewmats
                if cfg.pose_opt:
                    # adjust camtoworlds by the per-camera deltas, then
                    # invert back to viewmats (differentiable SE3 inverse)
                    c2w = _invert_se3(vm)
                    c2w = apply_pose_deltas(c2w, pose[cam_ids])
                    vm = _invert_se3(c2w)
                colors, alphas, meta = self.render(
                    p, alive, vm, Ks, sh_degree, offset=offset,
                    absgrad=absgrad,
                    app=app if cfg.app_opt else None, cam_ids=cam_ids,
                )
                if cfg.bilateral_grid:
                    # per-view color affines on the raw renders (reference
                    # simple_trainer.py:766-776)
                    colors = jax.vmap(
                        lambda g, im: bilateral_slice_image(g, im)[0]
                    )(bil[cam_ids], colors)
                if cfg.ppisp:
                    # learned capture chain on the raw renders (PPISP
                    # analog; reference simple_trainer.py:578-590)
                    colors = apply_ppisp(
                        pp, colors, jnp.zeros_like(cam_ids), cam_ids
                    )
                colors = jnp.clip(colors, 0.0, 1.0)
                loss = l1_loss(colors, pixels) * (1.0 - cfg.ssim_lambda)
                loss += ssim_loss(colors, pixels) * cfg.ssim_lambda
                if cfg.bilateral_grid and cfg.tv_reg > 0:
                    loss += cfg.tv_reg * total_variation_loss(bil)
                if cfg.opacity_reg > 0:
                    loss += cfg.opacity_reg * jnp.mean(
                        jnp.where(alive, jax.nn.sigmoid(p["opacities"]), 0.0)
                    )
                if cfg.scale_reg > 0:
                    loss += cfg.scale_reg * jnp.mean(
                        jnp.where(alive[:, None], jnp.exp(p["scales"]), 0.0)
                    )
                if cfg.pose_opt and cfg.pose_opt_reg > 0:
                    loss += cfg.pose_opt_reg * jnp.sum(pose ** 2)
                if cfg.app_opt and cfg.app_opt_reg > 0:
                    # embeds weight decay (reference :609 weight_decay)
                    loss += cfg.app_opt_reg * jnp.sum(app["embeds"] ** 2)
                if cfg.ppisp and cfg.ppisp_reg > 0:
                    loss += cfg.ppisp_reg * ppisp_regularization(pp)
                return loss, (meta["radii"], meta["isect_overflow"])

            (loss, (radii, overflow)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
            )(params, offset0, pose_deltas, bil_grids, app_params,
              ppisp_params)
            g_params, g_screen, g_pose, g_bil, g_app, g_pp = grads
            visibility = (radii > 0).all(axis=-1).any(axis=0) & alive
            return (loss, g_params, g_screen, g_pose, g_bil, g_app, g_pp,
                    radii, visibility, overflow)

        return train_step

    def make_update_step(self):
        lrs = dict(self.lrs)
        clip = float(self.cfg.grad_clip)

        @jax.jit
        def update(params, opt_state, g_params, visibility, lr_scale_means):
            if clip > 0.0:
                gnorm = jnp.sqrt(
                    sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(
                        g_params))
                )
                scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
                g_params = jax.tree_util.tree_map(
                    lambda g: g * scale, g_params
                )
            lrs_t = dict(lrs)
            lrs_t["means"] = lrs["means"] * lr_scale_means
            return selective_adam_update(
                params, g_params, opt_state, lrs_t, visibility=visibility
            )

        return update

    def train(self):
        cfg = self.cfg
        C = cfg.batch_size

        # training targets
        if cfg.data == "npz":
            # sparse-to-dense benchmark: targets are clean renders of the
            # FULL point cloud at every camera; train on the first C-1
            # views, hold out the last for eval (no photos ship here)
            targets_all = self._make_npz_targets()
            targets = targets_all[: len(self.train_views)]
            self._heldout = (
                targets_all[len(self.train_views):],
                jnp.asarray(self.viewmats[self.eval_views]),
                jnp.asarray(self.Ks[self.eval_views]),
            )
            viewmats_all = jnp.asarray(self.viewmats[self.train_views])
            Ks_all = jnp.asarray(self.Ks[self.train_views])
        else:
            targets = jnp.asarray(
                np.stack([
                    self.trainset[i]["image"] for i in range(len(self.trainset))
                ])
            )
            viewmats_all = jnp.asarray(self.viewmats)
            Ks_all = jnp.asarray(self.Ks)
        n_train = viewmats_all.shape[0]

        rng = np.random.default_rng(cfg.seed)
        sh_sched = lambda step: min(step // cfg.sh_degree_interval, cfg.sh_degree)
        train_steps = {}
        update = self.make_update_step()

        params, opt_state, alive = self.params, self.opt_state, self.alive
        state = self.strategy_state
        pose_deltas = self.pose_deltas
        bil_grids = (
            self.bil_grids if cfg.bilateral_grid
            else jnp.zeros((1,), jnp.float32)  # unused placeholder
        )
        app_params = (
            self.app_params if cfg.app_opt
            else jnp.zeros((1,), jnp.float32)  # unused placeholder
        )
        ppisp_params = (
            self.ppisp_params if cfg.ppisp
            else jnp.zeros((1,), jnp.float32)  # unused placeholder
        )
        overflow_steps = 0
        if self.pose_perturb is not None:
            # corrupt the training poses (ground truth stays in eval)
            c2w = _invert_se3(jnp.asarray(viewmats_all))
            c2w = apply_pose_deltas(c2w, self.pose_perturb)
            viewmats_all = _invert_se3(c2w)

        # live training viewer (reference nerfview contract: the browser's
        # pause button blocks the loop inside viewer.update)
        viewer = None
        if not cfg.disable_viewer:
            from gsplat_tpu.viewer import GsplatViewer, RenderTabState
            from gsplat_tpu.viewer.render import make_render_fn

            snapshot = {"params": params, "alive": alive}

            def get_scene():
                p, al = snapshot["params"], snapshot["alive"]
                return {
                    "means": p["means"],
                    "quats": p["quats"],
                    "scales": jnp.exp(p["scales"]),
                    "opacities": jnp.where(
                        al, jax.nn.sigmoid(p["opacities"]), 0.0
                    ),
                    "colors": jnp.concatenate([p["sh0"], p["shN"]], axis=1),
                    "sh_degree": cfg.sh_degree,
                    "n_rendered": int(jnp.sum(al)),
                }

            viewer = GsplatViewer(
                make_render_fn(get_scene, isect_capacity=cfg.isect_capacity),
                output_dir=cfg.result_dir,
                mode="training",
                port=cfg.viewer_port,
                state=RenderTabState(
                    total_gs_count=int(params["means"].shape[0]),
                    max_sh_degree=cfg.sh_degree,
                ),
            )
        self.viewer = viewer
        t0 = time.time()
        self._train_t0 = t0  # eval stats report ellipse_time against this
        for step in range(self.start_step, cfg.max_steps):
            sh_degree = sh_sched(step)
            if sh_degree not in train_steps:
                train_steps[sh_degree] = self.make_train_step(sh_degree)
            if cfg.fixed_batch:
                idx = (np.arange(C, dtype=np.int64) + step * C) % n_train
            else:
                idx = rng.integers(0, n_train, C)
            vm, ks = viewmats_all[idx], Ks_all[idx]
            px = targets[idx]
            cam_ids = jnp.asarray(idx, jnp.int32)

            (loss, g_params, g_screen, g_pose, g_bil, g_app, g_pp, radii,
             visibility, overflow) = train_steps[sh_degree](
                params, opt_state, alive, vm, ks, px, pose_deltas, cam_ids,
                bil_grids, app_params, ppisp_params,
            )

            lr_scale = 0.01 ** (step / cfg.max_steps)
            params, opt_state = update(
                params, opt_state, g_params, visibility, lr_scale
            )
            if cfg.pose_opt:
                pd, self.pose_opt_state = adam_update(
                    {"pose": pose_deltas}, {"pose": g_pose},
                    self.pose_opt_state, {"pose": cfg.pose_opt_lr},
                )
                pose_deltas = pd["pose"]
            if cfg.bilateral_grid:
                bg, self.bil_opt_state = adam_update(
                    {"bil": bil_grids}, {"bil": g_bil},
                    self.bil_opt_state, {"bil": self.bil_lr},
                )
                bil_grids = bg["bil"]
            if cfg.app_opt:
                ap, self.app_opt_state = adam_update(
                    {"app": app_params}, {"app": g_app},
                    self.app_opt_state, {"app": cfg.app_opt_lr},
                )
                app_params = ap["app"]
            if cfg.ppisp:
                pu, self.ppisp_opt_state = adam_update(
                    {"pp": ppisp_params}, {"pp": g_pp},
                    self.ppisp_opt_state, {"pp": cfg.ppisp_lr},
                )
                ppisp_params = pu["pp"]
            if step % 100 == 0 and bool(overflow):
                overflow_steps += 1
                print(
                    f"WARNING step {step}: intersection capacity overflow "
                    f"— splats truncated; raise --isect_capacity "
                    f"(current {cfg.isect_capacity})",
                    flush=True,
                )

            # densification
            if cfg.strategy == "default":
                state = self.strategy.update_state(
                    state, g_screen, radii, self.width, self.height, C
                )
                if self.strategy.should_refine(step):
                    if os.environ.get("GSPLAT_TPU_GRAD2D_DEBUG"):
                        # calibration aid: where does grow_grad2d sit in the
                        # accumulated pixel-unit grad distribution?
                        gg = np.asarray(
                            state["grad2d"]
                            / np.maximum(np.asarray(state["count"]), 1.0)
                        )[np.asarray(alive)]
                        qs = np.percentile(gg, [50, 90, 95, 99])
                        print(
                            f"refine step {step}: grad2d p50/p90/p95/p99 = "
                            + "/".join(f"{q:.2e}" for q in qs)
                            + f" (threshold {self.strategy.grow_grad2d:.1e})",
                            flush=True,
                        )
                    self.key, k = jax.random.split(self.key)
                    params, moments, alive, state = self.strategy.refine(
                        params, (opt_state.mu, opt_state.nu), alive, state,
                        step, k,
                    )
                    opt_state = opt_state._replace(mu=moments[0], nu=moments[1])
                if self.strategy.should_reset_opa(step):
                    params, moments = self.strategy.reset_opa(
                        params, (opt_state.mu, opt_state.nu)
                    )
                    opt_state = opt_state._replace(mu=moments[0], nu=moments[1])
            else:
                if self.strategy.should_refine(step):
                    self.key, k = jax.random.split(self.key)
                    params, moments, alive = self.strategy.refine(
                        params, (opt_state.mu, opt_state.nu), alive, state, k
                    )
                    opt_state = opt_state._replace(mu=moments[0], nu=moments[1])
                if self.strategy.should_inject_noise(step):
                    self.key, k = jax.random.split(self.key)
                    params = self.strategy.inject_noise(
                        params, alive, k,
                        lr_means=self.lrs["means"] * lr_scale,
                    )

            if viewer is not None:
                if step % 10 == 0:
                    snapshot["params"], snapshot["alive"] = params, alive
                viewer.update(step, C * self.width * self.height)

            if step % 100 == 0:
                n_alive = int(jnp.sum(alive))
                print(
                    f"step {step}: loss {float(loss):.4f} "
                    f"n_gs {n_alive} ({time.time()-t0:.0f}s)",
                    flush=True,
                )
            if self.writer is not None and step % cfg.tb_every == 0:
                self.writer.add_scalar("train/loss", float(loss), step)
                self.writer.add_scalar(
                    "train/num_GS", int(jnp.sum(alive)), step
                )
                self.writer.add_scalar("train/mem", _device_mem_gib(), step)
                self.writer.add_scalar(
                    "train/steps_per_sec",
                    (step - self.start_step + 1) / max(time.time() - t0, 1e-9),
                    step,
                )
                if cfg.tb_save_image:
                    # side-by-side target | render of the first batch view
                    colors, _, _ = self.render(
                        params, alive, vm[:1], ks[:1], sh_degree,
                        app=app_params, cam_ids=None,
                    )
                    canvas = np.concatenate(
                        [np.asarray(px[0]), np.asarray(colors[0])], axis=1
                    )
                    self.writer.add_image(
                        "train/render", np.clip(canvas, 0, 1), step,
                        dataformats="HWC",
                    )
                self.writer.flush()
            if (step + 1) % cfg.eval_every == 0 or step == cfg.max_steps - 1:
                self.params, self.alive = params, alive
                if cfg.bilateral_grid:
                    self.bil_grids = bil_grids
                if cfg.app_opt:
                    self.app_params = app_params
                if cfg.ppisp:
                    self.ppisp_params = ppisp_params
                if cfg.data == "npz":
                    # train-view PSNR is the benchmark metric (with only
                    # 2 training cameras, held-out generalization
                    # collapses by construction — reported separately)
                    self.eval(step, targets, viewmats_all, Ks_all,
                              tag="train",
                              grids=self.bil_grids if cfg.bilateral_grid
                              else None)
                    self.eval(step, *self._heldout, tag="heldout")
                else:
                    self.eval(step, targets, viewmats_all, Ks_all,
                              grids=self.bil_grids if cfg.bilateral_grid
                              else None)
            if (step + 1) % cfg.save_every == 0 or step == cfg.max_steps - 1:
                self.pose_deltas = pose_deltas
                # sync loop-local aux modules so the checkpoint carries the
                # CURRENT values (they otherwise only sync at eval steps)
                if cfg.bilateral_grid:
                    self.bil_grids = bil_grids
                if cfg.app_opt:
                    self.app_params = app_params
                if cfg.ppisp:
                    self.ppisp_params = ppisp_params
                self._save(step, params, alive, opt_state, state)
                # mem/time snapshot (reference simple_trainer.py:1038-1052)
                snap = {
                    "mem": _device_mem_gib(),
                    "ellipse_time": time.time() - t0,
                    "num_GS": int(jnp.sum(alive)),
                }
                with open(
                    os.path.join(
                        self.stats_dir, f"train_step{step:04d}_rank0.json"
                    ),
                    "w",
                ) as f:
                    json.dump(snap, f)

        self.params, self.opt_state, self.alive = params, opt_state, alive
        self.pose_deltas = pose_deltas
        if cfg.bilateral_grid:
            self.bil_grids = bil_grids
        if cfg.app_opt:
            self.app_params = app_params
        if cfg.ppisp:
            self.ppisp_params = ppisp_params
        if overflow_steps:
            print(f"NOTE: {overflow_steps} steps hit isect-capacity overflow",
                  flush=True)
        if viewer is not None:
            snapshot["params"], snapshot["alive"] = params, alive
            viewer.complete()  # switch to rendering mode; server stays up
        if cfg.render_traj:
            self.render_traj(step=cfg.max_steps - 1)
        if cfg.compression:
            if cfg.compression != "png":
                raise ValueError(f"unknown compression: {cfg.compression}")
            self.params, self.alive = params, alive
            self.run_compression(cfg.max_steps - 1)
        return params, alive

    def _make_npz_targets(self):
        """Benchmark targets: a clean render of the FULL point cloud.

        Scales from knn distances, flat 0.9 opacity, point colors — a
        plausible scene, not the randomized test fixture.  Training starts
        from an every-k-th subsample (Config.npz_subsample), so it must
        move/grow splats to recover the dense appearance.
        """
        pts = self._full_points
        dist = knn_mean_dist(pts)
        scales = np.clip(dist, 1e-4, None)[:, None].repeat(3, 1)
        n = len(pts)
        quats = np.zeros((n, 4), np.float32)
        quats[:, 0] = 1.0
        # render in small camera batches so the intersection capacity set
        # for training (batch_size cameras) also bounds target generation
        outs = []
        chunk = max(self.cfg.batch_size, 1)
        for i in range(0, len(self.viewmats), chunk):
            c, _, meta = rasterization(
                jnp.asarray(pts), jnp.asarray(quats),
                jnp.asarray(scales.astype(np.float32)),
                jnp.full((n,), 0.9, jnp.float32),
                jnp.asarray(self._full_rgbs),
                jnp.asarray(self.viewmats[i : i + chunk]),
                jnp.asarray(self.Ks[i : i + chunk]),
                self.width, self.height,
                isect_capacity=self.cfg.isect_capacity,
            )
            if bool(meta["isect_overflow"]):
                # truncated targets would silently corrupt the benchmark
                raise RuntimeError(
                    f"target render overflowed isect_capacity="
                    f"{self.cfg.isect_capacity} at views [{i}, {i+chunk})"
                )
            outs.append(jnp.clip(c, 0.0, 1.0))
        return jnp.concatenate(outs, axis=0)

    def eval(self, step, targets, viewmats, Ks, tag="eval", grids=None):
        sh_degree = min(step // self.cfg.sh_degree_interval, self.cfg.sh_degree)
        # render in training-batch-size view chunks: isect_capacity is sized
        # for batch_size cameras, and a single all-views render silently
        # truncates splats once the scene grows (observed as a fake train-
        # PSNR collapse while held-out eval kept improving)
        chunk = max(self.cfg.batch_size, 1)
        outs = []
        for i in range(0, len(viewmats), chunk):
            c, _, meta = self.render(
                self.params, self.alive,
                viewmats[i : i + chunk], Ks[i : i + chunk], sh_degree,
                # appearance eval uses the zero embedding (reference
                # simple_trainer.py eval: embed_ids=None)
                app=self.app_params, cam_ids=None,
            )
            if bool(meta["isect_overflow"]):
                print(f"WARNING eval[{tag}] @{step}: isect overflow in "
                      f"views [{i},{i+chunk}) — metrics underestimate",
                      flush=True)
            outs.append(c)
        colors = jnp.concatenate(outs, axis=0)
        if grids is not None:
            # per-view trained color correction (train views only — held-out
            # views have no grid; the reference evals those via color_correct)
            colors = jax.vmap(
                lambda g, im: bilateral_slice_image(g, im)[0]
            )(grids, colors)
        colors = jnp.clip(colors, 0.0, 1.0)
        mse = jnp.mean((colors - targets) ** 2)
        psnr = float(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))
        s = float(ssim(colors, targets))
        lp = None
        if self.lpips_w is not None:
            lp = float(jnp.mean(lpips(colors, targets, self.lpips_w)))
        # self-contained fixed-random-feature perceptual distance — always
        # available (no pretrained weights in this environment); NOT
        # comparable to published LPIPS numbers, hence its own column
        lp_proxy = float(jnp.mean(lpips_proxy(colors, targets)))
        print(f"eval[{tag}] @{step}: PSNR {psnr:.2f} SSIM {s:.4f}"
              + (f" LPIPS {lp:.4f}" if lp is not None else "")
              + f" LPIPSproxy {lp_proxy:.4f}", flush=True)
        stats = {"step": step, "tag": tag, "psnr": psnr, "ssim": s,
                 "lpips": lp, "lpips_proxy": lp_proxy,
                 "n_gs": int(jnp.sum(self.alive)),
                 # resource columns the reference's benchmark scripts
                 # scrape (simple_trainer.py:1041-1052): device memory and
                 # wall time since training start
                 "mem": _device_mem_gib(),
                 "ellipse_time": (
                     time.time() - self._train_t0
                     if hasattr(self, "_train_t0") else None
                 )}
        with open(os.path.join(self.cfg.result_dir, "stats.jsonl"), "a") as f:
            f.write(json.dumps(stats) + "\n")
        # per-eval JSON + TB scalars (reference simple_trainer.py:1285-1300)
        with open(
            os.path.join(self.stats_dir, f"{tag}_step{step:04d}.json"), "w"
        ) as f:
            json.dump(stats, f)
        if self.writer is not None:
            self.writer.add_scalar(f"{tag}/psnr", psnr, step)
            self.writer.add_scalar(f"{tag}/ssim", s, step)
            self.writer.add_scalar(f"{tag}/lpips_proxy", lp_proxy, step)
            if lp is not None:
                self.writer.add_scalar(f"{tag}/lpips", lp, step)
            self.writer.flush()
        return psnr, s

    def render_traj(self, step=None):
        """Render a fly-through of the trained scene to PNGs + mp4.

        Parity: reference simple_trainer.py:1303-1350 (render_traj with
        raw/interp/ellipse/spiral paths).  Spiral bounds come from point-
        to-camera distance percentiles (the reference reads COLMAP's
        per-image bounds; the npz fixture has none).
        """
        cfg = self.cfg
        from datasets.traj import (
            generate_ellipse_path_z,
            generate_interpolated_path,
            generate_spiral_path,
        )

        c2w = np.asarray(_invert_se3(jnp.asarray(self.viewmats)))[:, :3, :]
        kind = cfg.render_traj_path
        if kind == "raw":
            path = c2w
        elif kind == "interp":
            per_seg = max(cfg.traj_frames // max(len(c2w) - 1, 1), 1)
            path = generate_interpolated_path(c2w, per_seg)
        elif kind == "ellipse":
            height = float(c2w[:, 2, 3].mean())
            path = generate_ellipse_path_z(
                c2w, n_frames=cfg.traj_frames, height=height
            )
        elif kind == "spiral":
            cams = c2w[:, :3, 3]
            d = np.linalg.norm(
                self._points_np[None, :, :] - cams[:, None, :], axis=-1
            )
            bounds = np.array([np.percentile(d, 0.5), np.percentile(d, 99.5)])
            path = generate_spiral_path(
                c2w, bounds=bounds, n_frames=cfg.traj_frames
            )
        else:
            raise ValueError(f"unknown render_traj_path: {kind}")

        bottom = np.tile(
            np.array([[[0.0, 0, 0, 1.0]]], np.float32), (len(path), 1, 1)
        )
        c2w44 = np.concatenate([path.astype(np.float32), bottom], axis=1)
        vm = _invert_se3(jnp.asarray(c2w44))
        Ks = jnp.asarray(np.tile(self.Ks[:1], (len(path), 1, 1)))
        sh_degree = (
            min(step // cfg.sh_degree_interval, cfg.sh_degree)
            if step is not None else cfg.sh_degree
        )
        outdir = os.path.join(cfg.result_dir, "traj")
        os.makedirs(outdir, exist_ok=True)
        frames = []
        for i in range(len(path)):
            colors, _, _ = self.render(
                self.params, self.alive, vm[i : i + 1], Ks[i : i + 1],
                sh_degree,
                # with app_opt, sh0 holds pre-sigmoid logits — rendering
                # without the appearance head would misread them as SH DC
                # (reference applies app_module in every render path)
                app=self.app_params, cam_ids=None,
            )
            img = np.asarray(
                jnp.clip(colors[0], 0.0, 1.0) * 255.0
            ).astype(np.uint8)
            frames.append(img)
        import imageio

        for i, img in enumerate(frames):
            imageio.imwrite(os.path.join(outdir, f"{i:04d}.png"), img)
        try:
            imageio.mimwrite(
                os.path.join(cfg.result_dir, "traj.mp4"), frames, fps=30
            )
        except Exception as e:  # no ffmpeg backend: PNGs still exist
            print(f"traj video skipped ({e})", flush=True)
        print(f"wrote {len(frames)} traj frames to {outdir}", flush=True)

    def _save(self, step, params, alive, opt_state=None, state=None):
        """Full-state checkpoint: params + optimizer + strategy + pose.

        Parity: simple_trainer.py:1040-1072 (ckpt dict incl. step, splats,
        pose_adjust); here the optimizer moments and strategy state ride
        along too, so --ckpt resumes training exactly.
        """
        opt_state = opt_state if opt_state is not None else self.opt_state
        state = state if state is not None else self.strategy_state
        out = os.path.join(self.cfg.result_dir, f"ckpt_{step}.npz")
        flat = {
            "step": np.asarray(step),
            "alive": np.asarray(alive),
            "key": np.asarray(self.key),
            "pose_deltas": np.asarray(self.pose_deltas),
            "opt_count": np.asarray(opt_state.count),
        }
        if self.bil_grids is not None:
            flat["bil_grids"] = np.asarray(self.bil_grids)
        if self.app_params is not None:
            # appearance MLP + embeds with their Adam moments (reference
            # saves app_module.state_dict(), simple_trainer.py:1063-1067)
            flat["app_opt_count"] = np.asarray(self.app_opt_state.count)
            for k, v in self.app_params.items():
                flat[f"app_{k}"] = np.asarray(v)
                flat[f"amu_{k}"] = np.asarray(self.app_opt_state.mu["app"][k])
                flat[f"anu_{k}"] = np.asarray(self.app_opt_state.nu["app"][k])
        if self.ppisp_params is not None:
            flat["ppisp_opt_count"] = np.asarray(self.ppisp_opt_state.count)
            for k, v in self.ppisp_params.items():
                flat[f"isp_{k}"] = np.asarray(v)
                flat[f"imu_{k}"] = np.asarray(self.ppisp_opt_state.mu["pp"][k])
                flat[f"inu_{k}"] = np.asarray(self.ppisp_opt_state.nu["pp"][k])
        for k, v in params.items():
            flat[f"p_{k}"] = np.asarray(v)
            flat[f"mu_{k}"] = np.asarray(opt_state.mu[k])
            flat[f"nu_{k}"] = np.asarray(opt_state.nu[k])
        for k, v in state.items():
            flat[f"ss_{k}"] = np.asarray(v)
        np.savez(out, **flat)
        print(f"saved {out}", flush=True)

        if self.cfg.save_ply:
            # live-splat PLY alongside the checkpoint (reference
            # simple_trainer.py:1073-1105)
            from gsplat_tpu.exporter import export_splats

            keep = np.asarray(alive)
            ply_dir = os.path.join(self.cfg.result_dir, "ply")
            os.makedirs(ply_dir, exist_ok=True)
            export_splats(
                means=np.asarray(params["means"])[keep],
                scales=np.asarray(params["scales"])[keep],
                quats=np.asarray(params["quats"])[keep],
                opacities=np.asarray(params["opacities"])[keep].reshape(-1),
                sh0=np.asarray(params["sh0"])[keep],
                shN=np.asarray(params["shN"])[keep],
                format="ply",
                save_to=os.path.join(ply_dir, f"point_cloud_{step}.ply"),
            )
            print(f"saved {ply_dir}/point_cloud_{step}.ply", flush=True)

    def run_compression(self, step):
        """Compress the live splats and report reconstruction quality.

        Parity: reference simple_trainer.py:1412-1436 (run_compression:
        compress -> decompress -> eval on the held-out views).
        """
        from gsplat_tpu.compression import PngCompression

        keep = np.asarray(self.alive)
        splats = {
            "means": np.asarray(self.params["means"])[keep],
            "scales": np.asarray(self.params["scales"])[keep],
            "quats": np.asarray(self.params["quats"])[keep],
            "opacities": np.asarray(self.params["opacities"])[keep].reshape(
                -1
            ),
            "sh0": np.asarray(self.params["sh0"])[keep],
            "shN": np.asarray(self.params["shN"])[keep],
        }
        cdir = os.path.join(self.cfg.result_dir, "compression")
        comp = PngCompression()
        comp.compress(cdir, splats)
        total = sum(
            os.path.getsize(os.path.join(cdir, f)) for f in os.listdir(cdir)
        )
        print(f"compressed splats -> {cdir} ({total/1e6:.2f} MB)", flush=True)

    def _load(self, path):
        """Resume from a _save checkpoint (inverse of _save)."""
        d = np.load(path)
        params = {
            k[2:]: jnp.asarray(d[k]) for k in d.files if k.startswith("p_")
        }
        mu = {k[3:]: jnp.asarray(d[k]) for k in d.files if k.startswith("mu_")}
        nu = {k[3:]: jnp.asarray(d[k]) for k in d.files if k.startswith("nu_")}
        self.params = params
        self.alive = jnp.asarray(d["alive"])
        self.opt_state = self.opt_state._replace(
            mu=mu, nu=nu, count=jnp.asarray(d["opt_count"])
        )
        self.key = jnp.asarray(d["key"])
        self.pose_deltas = jnp.asarray(d["pose_deltas"])
        self.pose_opt_state = adam_init({"pose": self.pose_deltas})
        if "bil_grids" in d.files:
            self.bil_grids = jnp.asarray(d["bil_grids"])
            self.bil_opt_state = adam_init({"bil": self.bil_grids})
        if any(k.startswith("app_") for k in d.files):
            self.app_params = {
                k[4:]: jnp.asarray(d[k])
                for k in d.files
                if k.startswith("app_") and k != "app_opt_count"
            }
            amu = {k[4:]: jnp.asarray(d[k]) for k in d.files
                   if k.startswith("amu_")}
            anu = {k[4:]: jnp.asarray(d[k]) for k in d.files
                   if k.startswith("anu_")}
            self.app_opt_state = adam_init({"app": self.app_params})._replace(
                mu={"app": amu}, nu={"app": anu},
                count=jnp.asarray(d["app_opt_count"]),
            )
        if any(k.startswith("isp_") for k in d.files):
            self.ppisp_params = {
                k[4:]: jnp.asarray(d[k])
                for k in d.files if k.startswith("isp_")
            }
            imu = {k[4:]: jnp.asarray(d[k]) for k in d.files
                   if k.startswith("imu_")}
            inu = {k[4:]: jnp.asarray(d[k]) for k in d.files
                   if k.startswith("inu_")}
            self.ppisp_opt_state = adam_init(
                {"pp": self.ppisp_params}
            )._replace(
                mu={"pp": imu}, nu={"pp": inu},
                count=jnp.asarray(d["ppisp_opt_count"]),
            )
        for k in list(self.strategy_state):
            if f"ss_{k}" in d.files:
                v = d[f"ss_{k}"]
                self.strategy_state[k] = (
                    float(v) if v.ndim == 0 and k == "scene_scale"
                    else jnp.asarray(v)
                )
        self.start_step = int(d["step"]) + 1
        print(f"resumed from {path} at step {self.start_step}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("strategy", choices=["default", "mcmc"], nargs="?",
                   default="default")
    for f_ in Config.__dataclass_fields__.values():
        if f_.name == "strategy":
            continue
        t = f_.type if isinstance(f_.type, type) else type(f_.default)
        if t is bool:
            # bool("False") is True — parse 0/1/true/false explicitly
            t = lambda v: str(v).lower() in ("1", "true", "yes", "on")
        p.add_argument(f"--{f_.name}", type=t, default=f_.default)
    args = p.parse_args()
    cfg = Config(**vars(args))
    if cfg.strategy == "mcmc":
        # MCMC needs the regularizers (reference simple_trainer.py:1585-1589
        # mcmc subcommand defaults); without scale_reg splats inflate
        # unboundedly (MCMC never prunes by size)
        if cfg.opacity_reg == 0.0:
            cfg.opacity_reg = 0.01
        if cfg.scale_reg == 0.0:
            cfg.scale_reg = 0.01
    runner = Runner(cfg)
    runner.train()


if __name__ == "__main__":
    main()
