from .components import GaussianScene, Scene, Stage

__all__ = ["GaussianScene", "Scene", "Stage"]
