"""Bridge from viewer camera/state to `rasterization()` renders.

Shared by examples/simple_viewer.py (static scene) and the trainer's
live training view (examples/simple_trainer.py --disable_viewer=False).
Parity: the render closure the reference passes to nerfview
(examples/simple_viewer.py:214-305).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..rendering import rasterization
from .core import CameraState, RenderTabState


def make_render_fn(
    get_scene: Callable[[], Dict],
    isect_capacity: int = 4_000_000,
    sh_degree: Optional[int] = None,
) -> Callable:
    """Build a viewer render_fn over a (possibly live) splat scene.

    ``get_scene()`` returns a dict with activated arrays: means [N,3],
    quats [N,4], scales [N,3], opacities [N], colors ([N,D] or [N,K,3]
    SH), and optionally "sh_degree".  It is called on every frame, so a
    training loop can swap in fresh parameters between steps.
    """
    _cache: Dict = {}

    def get_jitted(w: int, h: int, sh_deg, mode: str):
        key = (w, h, sh_deg, mode)
        if key not in _cache:
            def fn(means, quats, scales, opac, colors, viewmat, K,
                   near, far, radius_clip, eps2d, bg):
                c, a, _ = rasterization(
                    means, quats, scales, opac, colors,
                    viewmat[None], K[None], w, h,
                    near_plane=near, far_plane=far,
                    radius_clip=radius_clip, eps2d=eps2d,
                    sh_degree=sh_deg, render_mode=mode,
                    backgrounds=bg[None],
                    isect_capacity=isect_capacity,
                )
                return c[0], a[0]

            _cache[key] = jax.jit(fn)
        return _cache[key]

    def render_fn(cam: CameraState, st: RenderTabState, img_wh: Tuple[int, int]):
        w, h = img_wh
        w, h = max(16, w - w % 16), max(16, h - h % 16)
        scene = get_scene()
        colors = scene["colors"]
        scene_sh = scene.get("sh_degree", sh_degree)
        sh_deg = (
            min(st.max_sh_degree, scene_sh) if scene_sh is not None else None
        )
        viewmat = jnp.asarray(
            np.linalg.inv(np.asarray(cam.c2w, np.float32))
        )
        K = jnp.asarray(cam.get_K((w, h)))
        mode = {
            "rgb": "RGB",
            "depth(accumulated)": "RGB+D",
            "depth(expected)": "RGB+ED",
            "alpha": "RGB",
        }[st.render_mode]
        fn = get_jitted(w, h, sh_deg, mode)
        c, a = fn(
            scene["means"], scene["quats"], scene["scales"],
            scene["opacities"], colors, viewmat, K,
            st.near_plane, st.far_plane, st.radius_clip, st.eps2d,
            jnp.asarray(st.backgrounds, jnp.float32),
        )
        c, a = np.asarray(c), np.asarray(a)
        st.rendered_gs_count = int(scene.get("n_rendered", 0))
        if st.render_mode == "rgb":
            return c[..., :3]
        if st.render_mode == "alpha":
            return {"alpha": a}
        return {"rgb": c[..., :3], "depth": c[..., -1:], "alpha": a}

    return render_fn
