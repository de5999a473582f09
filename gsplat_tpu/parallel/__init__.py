from .render import rasterization_sharded

__all__ = ["rasterization_sharded"]
