"""Interactive web viewer for gsplat_tpu scenes.

The TPU analog of the reference's viser/nerfview viewer stack
(examples/gsplat_viewer.py:1-274, examples/simple_viewer.py:1-366): the
environment has no viser, so this is a self-contained HTTP viewer — a
stdlib ``ThreadingHTTPServer`` serving a single-page orbit-controls client
that POSTs camera poses; frames are rendered server-side on the TPU
through the caller-supplied ``render_fn`` and streamed back as JPEG.

The control surface mirrors ``GsplatRenderTabState``
(gsplat_viewer.py:27-49): max SH degree, near/far planes, radius_clip,
eps2d, background color, render mode (rgb / depth(accumulated) /
depth(expected) / alpha), near/far normalization, inverse-depth,
colormap, camera model.  Training mode adds the nerfview pause/resume
contract: the trainer shares ``viewer.lock`` and calls
``viewer.update(step)``, while the browser's Pause button flips
``viewer.state.paused`` which the trainer polls between steps.
"""

from __future__ import annotations

import io
import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Tuple

import numpy as np

RENDER_MODES = ("rgb", "depth(accumulated)", "depth(expected)", "alpha")
COLORMAPS = ("turbo", "viridis", "magma", "inferno", "cividis", "gray")


@dataclass
class CameraState:
    """Camera for a single viewer render request (nerfview CameraState)."""

    c2w: np.ndarray  # [4, 4] OpenCV camera-to-world
    fov: float  # vertical field of view, radians
    aspect: float  # width / height

    def get_K(self, img_wh: Tuple[int, int]) -> np.ndarray:
        w, h = img_wh
        fy = 0.5 * h / np.tan(0.5 * self.fov)
        fx = fy
        return np.array(
            [[fx, 0.0, w / 2.0], [0.0, fy, h / 2.0], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )


@dataclass
class RenderTabState:
    """Viewer-controllable render parameters.

    Parity: GsplatRenderTabState (examples/gsplat_viewer.py:27-49).
    """

    # non-controllable (display only)
    total_gs_count: int = 0
    rendered_gs_count: int = 0
    # controllable
    max_sh_degree: int = 3
    near_plane: float = 1e-2
    far_plane: float = 1e2
    radius_clip: float = 0.0
    eps2d: float = 0.3
    backgrounds: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    render_mode: str = "rgb"
    normalize_nearfar: bool = False
    inverse: bool = False
    colormap: str = "turbo"
    rasterize_mode: str = "classic"
    camera_model: str = "pinhole"
    # viewer plumbing
    viewer_res: int = 1080  # max render height
    paused: bool = False  # training-mode pause toggle

    def to_dict(self) -> dict:
        return {
            "total_gs_count": self.total_gs_count,
            "rendered_gs_count": self.rendered_gs_count,
            "max_sh_degree": self.max_sh_degree,
            "near_plane": self.near_plane,
            "far_plane": self.far_plane,
            "radius_clip": self.radius_clip,
            "eps2d": self.eps2d,
            "backgrounds": list(self.backgrounds),
            "render_mode": self.render_mode,
            "normalize_nearfar": self.normalize_nearfar,
            "inverse": self.inverse,
            "colormap": self.colormap,
            "rasterize_mode": self.rasterize_mode,
            "camera_model": self.camera_model,
            "viewer_res": self.viewer_res,
            "paused": self.paused,
        }

    def apply(self, upd: dict) -> None:
        for k, v in upd.items():
            if k in ("total_gs_count", "rendered_gs_count"):
                continue
            if hasattr(self, k):
                cur = getattr(self, k)
                if isinstance(cur, tuple):
                    v = tuple(float(x) for x in v)
                elif isinstance(cur, bool):
                    v = bool(v)
                elif isinstance(cur, int):
                    v = int(v)
                elif isinstance(cur, float):
                    v = float(v)
                setattr(self, k, v)


# 17-anchor LUTs sampled from the standard colormaps (matplotlib data);
# linear interpolation between anchors is visually indistinguishable at
# 8 bits.  Kept inline so the viewer has zero hard dependencies.
def _mpl_lut(name: str, n: int = 17) -> np.ndarray:
    try:  # pragma: no cover - exercised when matplotlib is present
        import matplotlib

        cm = matplotlib.colormaps[name]
        return np.asarray(
            [cm(i / (n - 1))[:3] for i in range(n)], dtype=np.float32
        )
    except Exception:  # pragma: no cover
        g = np.linspace(0.0, 1.0, n, dtype=np.float32)
        return np.stack([g, g, g], axis=-1)


_LUTS = {}


def apply_colormap(x: np.ndarray, name: str = "turbo") -> np.ndarray:
    """Map [H, W] floats in [0, 1] to [H, W, 3] via a named colormap."""
    if name == "gray":
        return np.repeat(np.clip(x, 0.0, 1.0)[..., None], 3, axis=-1)
    if name not in _LUTS:
        _LUTS[name] = _mpl_lut(name)
    lut = _LUTS[name]
    n = lut.shape[0]
    t = np.clip(x, 0.0, 1.0) * (n - 1)
    i0 = np.floor(t).astype(np.int32)
    i1 = np.minimum(i0 + 1, n - 1)
    f = (t - i0)[..., None]
    return lut[i0] * (1.0 - f) + lut[i1] * f


def postprocess_depth(
    depth: np.ndarray, alpha: np.ndarray, state: RenderTabState
) -> np.ndarray:
    """Depth channel -> display RGB per the viewer state.

    Mirrors the reference viewer's depth display path
    (simple_viewer.py render loop): optional near/far normalization,
    optional inversion, then colormap.
    """
    d = depth.astype(np.float32)
    if state.normalize_nearfar:
        lo, hi = state.near_plane, state.far_plane
    else:
        valid = alpha > 0.5
        lo = float(d[valid].min()) if valid.any() else 0.0
        hi = float(d[valid].max()) if valid.any() else 1.0
    d = (d - lo) / max(hi - lo, 1e-10)
    if state.inverse:
        d = 1.0 - d
    return apply_colormap(d, state.colormap)


def _encode_jpeg(img_u8: np.ndarray, quality: int = 88) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


class GsplatViewer:
    """HTTP viewer server.

    ``render_fn(camera_state, render_tab_state, img_wh) -> np.ndarray``
    returns either [H, W, 3] float RGB in [0, 1] (already postprocessed)
    or a dict with keys among {"rgb", "depth", "alpha"} for viewer-side
    postprocessing per ``render_mode``.

    Parity: GsplatViewer (examples/gsplat_viewer.py:51-273) +
    nerfview.Viewer's training-mode contract.
    """

    def __init__(
        self,
        render_fn: Callable,
        output_dir: str = ".",
        mode: str = "rendering",
        port: int = 8080,
        host: str = "0.0.0.0",
        state: Optional[RenderTabState] = None,
    ):
        assert mode in ("rendering", "training")
        self.render_fn = render_fn
        self.output_dir = output_dir
        self.mode = mode
        self.state = state or RenderTabState()
        self.lock = threading.Lock()
        self.step = 0
        self._steps_per_sec = 0.0
        self._last_update = time.perf_counter()
        self._last_step = 0

        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def _send(self, code, body, ctype):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    from .page import HTML_PAGE

                    self._send(200, HTML_PAGE.encode(), "text/html")
                elif self.path == "/info":
                    info = viewer.state.to_dict()
                    info.update(
                        mode=viewer.mode,
                        step=viewer.step,
                        steps_per_sec=round(viewer._steps_per_sec, 2),
                        render_modes=list(RENDER_MODES),
                        colormaps=list(COLORMAPS),
                    )
                    self._send(200, json.dumps(info).encode(), "application/json")
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/render":
                    try:
                        body = viewer._handle_render(req)
                        self._send(200, body, "image/jpeg")
                    except Exception as e:  # surface errors to the client
                        self._send(500, str(e).encode(), "text/plain")
                elif self.path == "/state":
                    viewer.state.apply(req)
                    self._send(200, b"{}", "application/json")
                else:
                    self._send(404, b"not found", "text/plain")

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self._thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self._thread.start()
        print(
            f"gsplat_tpu viewer: http://localhost:{self.port} (mode={mode})",
            flush=True,
        )

    # -- trainer-facing API (nerfview contract) ---------------------------

    def update(self, step: int, num_train_rays_per_step: int = 0) -> None:
        """Called by the trainer each step; tracks rate and honors pause."""
        self.step = step
        now = time.perf_counter()
        if now - self._last_update > 2.0:
            self._steps_per_sec = (step - self._last_step) / (
                now - self._last_update
            )
            self._last_update = now
            self._last_step = step
        while self.state.paused:
            time.sleep(0.05)

    def complete(self) -> None:
        self.mode = "rendering"

    def close(self) -> None:
        self.server.shutdown()
        self.server.server_close()

    # -- internals --------------------------------------------------------

    def _handle_render(self, req: dict) -> bytes:
        c2w = np.asarray(req["c2w"], dtype=np.float32).reshape(4, 4)
        fov = float(req.get("fov", 50.0 * np.pi / 180.0))
        w = int(req.get("width", 960))
        h = int(req.get("height", 540))
        max_h = max(int(self.state.viewer_res), 64)
        if h > max_h:
            w = int(round(w * max_h / h))
            h = max_h
        w, h = max(w, 16), max(h, 16)
        if req.get("state"):
            self.state.apply(req["state"])
        cam = CameraState(c2w=c2w, fov=fov, aspect=w / h)
        with self.lock:
            out = self.render_fn(cam, self.state, (w, h))
        if isinstance(out, dict):
            out = self._postprocess(out)
        img = np.asarray(out)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        return _encode_jpeg(img)

    def _postprocess(self, out: dict) -> np.ndarray:
        st = self.state
        mode = st.render_mode
        if mode == "rgb":
            return out["rgb"]
        if mode == "alpha":
            return apply_colormap(
                np.asarray(out["alpha"])[..., 0], st.colormap
            )
        depth = np.asarray(out["depth"])[..., 0]
        alpha = np.asarray(out["alpha"])[..., 0]
        return postprocess_depth(depth, alpha, st)
