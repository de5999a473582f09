from .components import GaussianScene, Scene, Stage
from .inference import GaussianInferenceScene, render_scene

__all__ = [
    "GaussianInferenceScene",
    "GaussianScene",
    "Scene",
    "Stage",
    "render_scene",
]
