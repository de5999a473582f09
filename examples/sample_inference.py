"""Render a trained scene from sampled viewpoints (Stage + scenes).

Analog of the reference's examples/sample_inference.py (:319): load a
checkpoint, register it on a Stage, and render an orbit of views to PNGs
through the inference path. Dispatches on the checkpoint format:

  * trainer .npz checkpoint (examples/simple_trainer.py `_save`)
  * standard 3DGS .ply (exporter.load_ply_to_splats)

Usage:
    python examples/sample_inference.py \
        --ckpt results/garden_traj32_mcmc/ckpt_3999.npz \
        --output-dir /tmp/sample_inference --n-views 8
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.exporter import load_ply_to_splats
from gsplat_tpu.scene import (
    GaussianInferenceScene,
    GaussianScene,
    Stage,
    render_scene,
)


def load_checkpoint(path: str) -> GaussianScene:
    """Load a trainer .npz or 3DGS .ply into a GaussianScene."""
    if path.endswith(".ply"):
        s = load_ply_to_splats(path)
        splats = {
            "means": s["means"],
            "quats": s["quats"],
            "scales": np.exp(s["scales"]),
            "opacities": 1.0 / (1.0 + np.exp(-s["opacities"])),
            "sh0": s["sh0"],
            "shN": s["shN"],
        }
        return GaussianScene(os.path.basename(path), splats, alive=None)
    d = np.load(path)
    splats = {
        k[2:]: np.asarray(d[k]) for k in d.files if k.startswith("p_")
    }
    # trainer params are pre-activation: activate for inference
    splats["scales"] = np.exp(splats["scales"])
    splats["opacities"] = 1.0 / (1.0 + np.exp(-splats["opacities"]))
    alive = np.asarray(d["alive"]) if "alive" in d.files else None
    return GaussianScene(os.path.basename(path), splats, alive=alive)


def orbit_cameras(center, radius, height, n_views, fov_deg, W, H):
    """Simple orbit: n_views viewmats looking at `center`."""
    f = 0.5 * W / math.tan(math.radians(fov_deg) / 2)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    viewmats = []
    for i in range(n_views):
        a = 2 * math.pi * i / n_views
        eye = center + np.array(
            [radius * math.cos(a), radius * math.sin(a), height]
        )
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, -1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])  # world->cam rows
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = -R @ eye
        viewmats.append(w2c)
    return np.stack(viewmats), K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help=".npz trainer ckpt | .ply")
    ap.add_argument("--output-dir", default="/tmp/sample_inference")
    ap.add_argument("--n-views", type=int, default=8)
    ap.add_argument("--width", type=int, default=648)
    ap.add_argument("--height", type=int, default=420)
    ap.add_argument("--fov", type=float, default=60.0)
    ap.add_argument("--isect-capacity", type=int, default=4 * 1024 * 1024)
    args = ap.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    gscene = load_checkpoint(args.ckpt)
    print(f"loaded {gscene.id}: {gscene.num_gaussians} gaussians")

    # pack for inference (bf16 scene + fast rasterizer) and register
    sp = gscene.splats
    alive = gscene.alive
    keep = (
        np.nonzero(np.asarray(alive))[0]
        if alive is not None
        else np.arange(len(sp["means"]))
    )
    sh = np.concatenate([sp["sh0"], sp["shN"]], axis=1)[keep]
    K_sh = sh.shape[1]
    sh_degree = int(math.isqrt(K_sh)) - 1
    quats = sp["quats"][keep]
    quats = quats / np.linalg.norm(quats, axis=-1, keepdims=True)
    inf_scene = GaussianInferenceScene.from_gaussian_tensors(
        jnp.asarray(sp["means"][keep]),
        jnp.asarray(quats),
        jnp.asarray(sp["scales"][keep]),
        jnp.asarray(sp["opacities"][keep]),
        jnp.asarray(sh),
        sh_degree=sh_degree,
        id=gscene.id,
    )
    stage = Stage()
    stage.add_scene(
        gscene,
        lambda splats, alive=None, **kw: render_scene(inf_scene, **kw),
    )

    means = np.asarray(sp["means"][keep])
    center = np.median(means, axis=0)
    radius = 1.5 * float(
        np.percentile(np.linalg.norm(means - center, axis=1), 70)
    )
    viewmats, K = orbit_cameras(
        center, radius, -0.3 * radius, args.n_views, args.fov,
        args.width, args.height,
    )

    from PIL import Image

    for i, vm in enumerate(viewmats):
        img, _, meta = stage.render(
            gscene.id,
            viewmat=jnp.asarray(vm), K=jnp.asarray(K),
            width=args.width, height=args.height,
            isect_capacity=args.isect_capacity,
        )
        arr = (np.clip(np.asarray(img)[0], 0, 1) * 255).astype(np.uint8)
        out = os.path.join(args.output_dir, f"view_{i:03d}.png")
        Image.fromarray(arr).save(out)
        print(f"{out}  (path={meta['render_path']})", flush=True)


if __name__ == "__main__":
    main()
