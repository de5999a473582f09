"""Viewer server tests (no TPU: dummy render_fn + HTTP round-trips).

Covers the control-surface parity with the reference viewer
(examples/gsplat_viewer.py:27-49) and the nerfview training contract.
"""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from gsplat_tpu.viewer import (
    COLORMAPS,
    CameraState,
    GsplatViewer,
    RenderTabState,
    apply_colormap,
    postprocess_depth,
)


def _dummy_render(cam, state, img_wh):
    w, h = img_wh
    assert isinstance(cam, CameraState)
    assert cam.c2w.shape == (4, 4)
    g = np.linspace(0, 1, w, dtype=np.float32)[None, :, None]
    img = np.broadcast_to(g, (h, w, 3)).copy()
    if state.render_mode != "rgb":
        return {
            "rgb": img,
            "depth": np.full((h, w, 1), 2.0, np.float32),
            "alpha": np.ones((h, w, 1), np.float32),
        }
    return img


@pytest.fixture()
def viewer():
    v = GsplatViewer(_dummy_render, mode="rendering", port=0)
    yield v
    v.close()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=10)


def test_info_endpoint(viewer):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{viewer.port}/info", timeout=10
    ) as r:
        info = json.loads(r.read())
    # control-surface parity with GsplatRenderTabState
    for key in (
        "max_sh_degree", "near_plane", "far_plane", "radius_clip", "eps2d",
        "backgrounds", "render_mode", "normalize_nearfar", "inverse",
        "colormap", "rasterize_mode", "camera_model",
    ):
        assert key in info, key
    assert info["render_modes"] == [
        "rgb", "depth(accumulated)", "depth(expected)", "alpha"
    ]


def test_index_page(viewer):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{viewer.port}/", timeout=10
    ) as r:
        page = r.read().decode()
    assert "gsplat_tpu viewer" in page and "/render" in page


def test_render_returns_jpeg(viewer):
    c2w = np.eye(4).ravel().tolist()
    with _post(viewer.port, "/render", {"c2w": c2w, "width": 64, "height": 48}) as r:
        assert r.headers["Content-Type"] == "image/jpeg"
        data = r.read()
    assert data[:2] == b"\xff\xd8"  # JPEG SOI
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    assert img.size == (64, 48)


def test_state_update_roundtrip(viewer):
    _post(viewer.port, "/state", {"render_mode": "depth(expected)",
                                  "colormap": "viridis",
                                  "near_plane": 0.5}).read()
    assert viewer.state.render_mode == "depth(expected)"
    assert viewer.state.colormap == "viridis"
    assert viewer.state.near_plane == 0.5
    # depth render path goes through postprocessing
    c2w = np.eye(4).ravel().tolist()
    with _post(viewer.port, "/render", {"c2w": c2w, "width": 32, "height": 32}) as r:
        assert r.read()[:2] == b"\xff\xd8"


def test_viewer_res_caps_render(viewer):
    viewer.state.viewer_res = 64
    c2w = np.eye(4).ravel().tolist()
    with _post(viewer.port, "/render",
               {"c2w": c2w, "width": 1920, "height": 1080}) as r:
        from PIL import Image

        img = Image.open(io.BytesIO(r.read()))
    assert img.size[1] <= 64


def test_training_pause_contract():
    v = GsplatViewer(_dummy_render, mode="training", port=0)
    try:
        steps = []

        def trainer():
            for i in range(200):
                with v.lock:
                    steps.append(i)
                v.update(i)

        t = threading.Thread(target=trainer)
        v.state.paused = True
        t.start()
        time.sleep(0.3)
        n_paused = len(steps)
        assert n_paused <= 2  # paused almost immediately
        v.state.paused = False
        t.join(timeout=5)
        assert not t.is_alive() and len(steps) == 200
    finally:
        v.close()


def test_colormaps():
    x = np.linspace(0, 1, 11).reshape(1, 11)
    for name in COLORMAPS:
        rgb = apply_colormap(x, name)
        assert rgb.shape == (1, 11, 3)
        assert np.all(rgb >= 0) and np.all(rgb <= 1)
    # turbo is not monotone gray
    t = apply_colormap(x, "turbo")
    assert np.abs(t[..., 0] - t[..., 2]).max() > 0.3


def test_postprocess_depth_modes():
    depth = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    alpha = np.ones((2, 2), np.float32)
    st = RenderTabState(normalize_nearfar=True, near_plane=1.0, far_plane=4.0,
                        colormap="gray")
    out = postprocess_depth(depth, alpha, st)
    assert out[0, 0, 0] == 0.0 and out[1, 1, 0] == 1.0
    st.inverse = True
    out2 = postprocess_depth(depth, alpha, st)
    assert out2[0, 0, 0] == 1.0
    # auto-normalization from valid-alpha range
    st2 = RenderTabState(colormap="gray")
    out3 = postprocess_depth(depth, alpha, st2)
    assert out3[0, 0, 0] == 0.0 and out3[1, 1, 0] == 1.0
