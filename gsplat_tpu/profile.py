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
