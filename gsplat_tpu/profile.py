"""Capture/replay profiling harness.

Analog of gsplat/profile.py: `capture_inputs(envvar=...)` snapshots real op
inputs during training (:986-1030) and `ProfileWorkload` replays a captured
call with input overrides and timing (:168-935). TPU adaptations: arrays are
saved as an .npz payload + a pickled pytree spec; timing uses
block_until_ready; kernel-family assertions become compiled-HLO substring
checks (the XLA analog of the reference's expected-kernel-family lists).
"""

from __future__ import annotations

import functools
import os
import pickle
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


def capture_inputs(envvar: str, path: Optional[str] = None) -> Callable:
    """Decorator: when `envvar` is set, snapshot the first call's inputs.

    The snapshot goes to $<envvar> (a directory), one file per decorated
    function. Parity: gsplat/profile.py:capture_inputs (:986).
    """

    def deco(fn: Callable) -> Callable:
        done = {"saved": False}

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            target = os.environ.get(envvar, path)
            if target and not done["saved"]:
                os.makedirs(target, exist_ok=True)
                save_inputs(
                    os.path.join(target, f"{fn.__name__}.capture"),
                    args, kwargs,
                )
                done["saved"] = True
            return fn(*args, **kwargs)

        return wrapper

    return deco


def save_inputs(path: str, args: tuple, kwargs: dict) -> None:
    leaves, treedef = jax.tree.flatten((args, kwargs))
    arrays = {}
    spec = []
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "shape"):
            arrays[f"a{i}"] = np.asarray(leaf)
            spec.append(("arr", f"a{i}"))
        else:
            spec.append(("obj", leaf))
    np.savez_compressed(path + ".npz", **arrays)
    with open(path + ".spec", "wb") as f:
        pickle.dump({"spec": spec, "treedef": treedef}, f)


def load_inputs(path: str):
    data = np.load(path + ".npz", allow_pickle=True)
    with open(path + ".spec", "rb") as f:
        meta = pickle.load(f)
    leaves = [
        data[key] if kind == "arr" else key
        for kind, key in meta["spec"]
    ]
    return jax.tree.unflatten(meta["treedef"], leaves)


@dataclass
class ProfileWorkload:
    """Replay a captured op with overrides; report timing.

    Parity: gsplat/profile.py:ProfileWorkload (:168) — load capture, apply
    input overrides, run fwd (and optionally a grad step), time with warmup.
    """

    fn: Callable
    capture_path: str
    overrides: Dict[str, Any] = field(default_factory=dict)
    warmup: int = 3
    repeats: int = 10

    def load(self):
        args, kwargs = load_inputs(self.capture_path)
        kwargs = {**kwargs, **self.overrides}
        return args, kwargs

    def run(self, grad_argnums=None) -> Dict[str, float]:
        args, kwargs = self.load()
        f = self.fn
        if grad_argnums is not None:
            base = self.fn

            def f(*a, **k):
                def loss(*diff_args):
                    full = list(a)
                    for i, idx in enumerate(grad_argnums):
                        full[idx] = diff_args[i]
                    out = base(*full, **k)
                    leaf = jax.tree.leaves(out)[0]
                    return leaf.sum()

                return jax.grad(loss, argnums=tuple(range(len(grad_argnums))))(
                    *[a[i] for i in grad_argnums]
                )

        for _ in range(self.warmup):
            out = f(*args, **kwargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(self.repeats):
            out = f(*args, **kwargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / self.repeats
        return {"time_s": dt, "fps": 1.0 / dt if dt > 0 else float("inf")}


def compiled_hlo_contains(fn: Callable, substrings, *args, **kwargs) -> bool:
    """Check the compiled HLO for expected op families (fusion sanity).

    The XLA analog of the reference's expected-kernel-family assertions
    (profile.py:784-859).
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    text = lowered.compile().as_text()
    return all(s in text for s in substrings)


# ---------------------------------------------------------------------------
# Workload presets + CLI
# ---------------------------------------------------------------------------
#
# Analog of the reference's named workloads (gsplat/profile.py:270-366:
# "3dgs" / "3dgut" / "2dgs" presets with canonical shapes) and `main()`
# (:1180).  Each preset builds the garden scene at a chosen scale and runs
# forward / forward+backward through the matching rasterization path, with
# loss presets mirroring profile.py:572-637.


def _garden_args(scene_grid: int, res_factor: int):
    import jax.numpy as jnp

    from .utils.data import load_test_data

    means, quats, scales, opac, colors, viewmats, Ks, width, height = (
        load_test_data(scene_grid=scene_grid)
    )
    Ks = Ks[:1].copy()
    W, H = width // res_factor, height // res_factor
    Ks[:, :2, :] /= res_factor
    return (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors),
        jnp.asarray(viewmats[:1]), jnp.asarray(Ks), W, H,
    )


_LOSSES = {
    "none": None,
    "sum": lambda img: img.sum(),
    "l1": None,  # filled below (needs jnp at call time)
}


def run_workload(
    name: str = "3dgs",
    scene_grid: int = 1,
    res_factor: int = 1,
    backward: bool = True,
    loss: str = "sum",
    isect_capacity: int = 2_000_000,
    repeats: int = 10,
) -> Dict[str, float]:
    """Run a named rasterization workload and report fwd / step timing."""
    import jax.numpy as jnp

    from .losses import l1_loss, ssim_loss

    args = _garden_args(scene_grid, res_factor)
    means, quats, scales, opac, colors, viewmats, Ks, W, H = args

    if name == "3dgs":
        from .rendering import rasterization as raster

        def render(m, q, s, o, c):
            out, alphas, _ = raster(
                m, q, s, o, c, viewmats, Ks, W, H,
                isect_capacity=isect_capacity,
            )
            return out
    elif name == "2dgs":
        from .rendering import rasterization_2dgs

        def render(m, q, s, o, c):
            out = rasterization_2dgs(
                m, q, s, o, c, viewmats, Ks, W, H,
                isect_capacity=isect_capacity,
            )
            return out[0]
    elif name == "3dgut":
        from .rendering import rasterization as raster

        def render(m, q, s, o, c):
            out, alphas, _ = raster(
                m, q, s, o, c, viewmats, Ks, W, H,
                isect_capacity=isect_capacity, with_ut=True, with_eval3d=True,
            )
            return out
    else:
        raise ValueError(f"unknown workload {name!r} (3dgs|2dgs|3dgut)")

    tgt = jnp.zeros((1, H, W, 3)) + 0.4

    def loss_of(img):
        img = jnp.clip(img[..., :3], 0.0, 1.0)
        if loss == "sum":
            return img.sum()
        if loss == "l1":
            return l1_loss(img, tgt)
        if loss == "l1+ssim":
            return 0.8 * l1_loss(img, tgt) + 0.2 * ssim_loss(img, tgt)
        raise ValueError(f"unknown loss {loss!r}")

    fwd = jax.jit(lambda *a: loss_of(render(*a)))
    rargs = (means, quats, scales, opac, colors)
    out: Dict[str, float] = {}
    float(fwd(*rargs))
    t0 = time.perf_counter()
    for _ in range(repeats):
        float(fwd(*rargs))
    out["fwd_ms"] = (time.perf_counter() - t0) / repeats * 1e3

    if backward:
        step = jax.jit(
            lambda *a: jax.grad(lambda *b: loss_of(render(*b)),
                                argnums=(0, 1, 2, 3, 4))(*a)[0].sum()
        )
        float(step(*rargs))
        t0 = time.perf_counter()
        for _ in range(repeats):
            float(step(*rargs))
        out["step_ms"] = (time.perf_counter() - t0) / repeats * 1e3
    return out


def main(argv=None):
    """CLI: python -m gsplat_tpu.profile --workload 3dgs --scene-grid 5."""
    import argparse
    import json

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workload", default="3dgs",
                   choices=["3dgs", "2dgs", "3dgut"])
    p.add_argument("--scene-grid", type=int, default=1)
    p.add_argument("--res-factor", type=int, default=1)
    p.add_argument("--loss", default="sum", choices=["sum", "l1", "l1+ssim"])
    p.add_argument("--no-backward", action="store_true")
    p.add_argument("--isect-capacity", type=int, default=2_000_000)
    p.add_argument("--repeats", type=int, default=10)
    a = p.parse_args(argv)
    res = run_workload(
        a.workload, a.scene_grid, a.res_factor, not a.no_backward, a.loss,
        a.isect_capacity, a.repeats,
    )
    print(json.dumps({"workload": a.workload, **res}))


if __name__ == "__main__":
    main()
