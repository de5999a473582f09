"""2DGS (surfel) trainer: L1+SSIM plus normal-consistency and distortion
regularizers.

Analog of the reference's examples/simple_trainer_2dgs.py (1,078 LoC):
same loss recipe — photometric lerp(l1, ssim, 0.2), normal loss
(1 - cos(normals, normals_from_depth)) from `normal_start_iter`, distortion
loss from `dist_start_iter` (:659-688) — on the TPU training stack
(capacity-padded params + DefaultStrategy with the gradient_2dgs key).

Usage:
    python examples/simple_trainer_2dgs.py --data npz --max_steps 2000
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from gsplat_tpu.losses import l1_loss, normal_cosine_loss, ssim_loss
from gsplat_tpu.optimizers import selective_adam_update
from gsplat_tpu.rendering import rasterization_2dgs
from simple_trainer import Config as BaseConfig
from simple_trainer import Runner as BaseRunner


@dataclass
class Config(BaseConfig):
    normal_lambda: float = 0.05
    dist_lambda: float = 0.01
    normal_start_iter: int = 7000
    dist_start_iter: int = 3000


class Runner2DGS(BaseRunner):
    """3DGS Runner with the render/loss swapped for the surfel model."""

    # the surfel rasterizer only uses the two tangent scales; the normal
    # axis gets no gradient and must not drive densification decisions or
    # split sampling (round-4 oscillation root cause — see
    # strategy/default.py:scale_axes)
    strategy_scale_axes = (0, 1)

    def render(self, params, alive, viewmats, Ks, sh_degree, offset=None,
               absgrad=False, app=None, cam_ids=None):
        # app/cam_ids accepted for base-Runner eval compatibility; the
        # surfel trainer has no appearance head
        op = jnp.where(alive, jax.nn.sigmoid(params["opacities"]), 0.0)
        out = rasterization_2dgs(
            params["means"],
            params["quats"],
            jnp.exp(params["scales"]),
            op,
            jnp.concatenate([params["sh0"], params["shN"]], axis=1),
            viewmats,
            Ks,
            self.width,
            self.height,
            sh_degree=sh_degree,
            near_plane=self.cfg.near_plane,
            far_plane=self.cfg.far_plane,
            render_mode="RGB+ED",
            isect_capacity=self.cfg.isect_capacity,
            densify=offset,
        )
        (render, alphas, normals, nfd, distort, median, meta) = out
        meta["_2dgs"] = (normals, nfd, distort)
        return render[..., :3], alphas, meta

    def make_train_step(self, sh_degree: int):
        cfg = self.cfg
        C = cfg.batch_size

        def build(step_flags):
            use_normal, use_dist = step_flags

            @jax.jit
            def train_step(params, opt_state, alive, viewmats, Ks, pixels,
                           pose_deltas, cam_ids, bil_grids, app_params,
                           ppisp_params):
                offset0 = jnp.zeros((C, self.capacity, 2), jnp.float32)

                def loss_fn(p, offset):
                    colors, alphas, meta = self.render(
                        p, alive, viewmats, Ks, sh_degree, offset=offset
                    )
                    colors = jnp.clip(colors, 0.0, 1.0)
                    loss = l1_loss(colors, pixels) * (1.0 - cfg.ssim_lambda)
                    loss += ssim_loss(colors, pixels) * cfg.ssim_lambda
                    normals, nfd, distort = meta["_2dgs"]
                    if use_normal:
                        loss += cfg.normal_lambda * normal_cosine_loss(
                            normals, jax.lax.stop_gradient(nfd)
                        )
                    if use_dist:
                        loss += cfg.dist_lambda * jnp.mean(distort)
                    return loss, (meta["radii"], meta["isect_overflow"])

                (loss, (radii, overflow)), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(params, offset0)
                g_params, g_screen = grads
                g_pose = jnp.zeros_like(pose_deltas)
                z = jnp.zeros((1,), jnp.float32)  # unused aux-module grads
                visibility = (radii > 0).all(axis=-1).any(axis=0) & alive
                return (loss, g_params, g_screen, g_pose, z, z, z, radii,
                        visibility, overflow)

            return train_step

        # cache per (normal, dist) flag combination; the trainer picks by step
        cache = {}

        def dispatch(params, opt_state, alive, vm, ks, px,
                     pose_deltas, cam_ids, bil_grids=None, app_params=None,
                     ppisp_params=None, step=[0]):
            flags = (
                step[0] >= cfg.normal_start_iter,
                step[0] >= cfg.dist_start_iter,
            )
            if flags not in cache:
                cache[flags] = build(flags)
            step[0] += 1
            return cache[flags](params, opt_state, alive, vm, ks, px,
                                pose_deltas, cam_ids, bil_grids, app_params,
                                ppisp_params)

        return dispatch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("strategy", choices=["default", "mcmc"], nargs="?",
                   default="default")
    for f_ in Config.__dataclass_fields__.values():
        if f_.name == "strategy":
            continue
        t = f_.type if isinstance(f_.type, type) else type(f_.default)
        p.add_argument(f"--{f_.name}", type=t, default=f_.default)
    args = p.parse_args()
    cfg = Config(**vars(args))
    runner = Runner2DGS(cfg)
    runner.train()


if __name__ == "__main__":
    main()
