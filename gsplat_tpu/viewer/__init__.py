"""Interactive web viewer (reference: examples/gsplat_viewer.py + nerfview).

See core.py for the server; examples/simple_viewer.py for the CLI.
"""

from .core import (
    COLORMAPS,
    RENDER_MODES,
    CameraState,
    GsplatViewer,
    RenderTabState,
    apply_colormap,
    postprocess_depth,
)
from .render import make_render_fn

__all__ = [
    "make_render_fn",
    "COLORMAPS",
    "RENDER_MODES",
    "CameraState",
    "GsplatViewer",
    "RenderTabState",
    "apply_colormap",
    "postprocess_depth",
]
