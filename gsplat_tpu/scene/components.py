"""Scene abstraction: parameter containers with topology hooks.

Parity: gsplat/scene/design.md + scene/components/{base,gaussian_scene}.py —
a minimal ABC (`id`, put/get, topology hooks called by strategy ops) and a
GaussianScene holding the splat parameter pytree.

JAX adaptation: parameters are immutable arrays, so the scene stores the
CURRENT pytree (replaced wholesale by training steps) plus the `alive`
capacity mask used by the static-shape strategies (strategy/ops.py). The
topology hooks receive the same information as the reference's (selection
masks/indices) for components that track per-gaussian sidecar data.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Callable, Dict, Optional


class Scene(ABC):
    """Abstract scene contract. Parity: scene/components/base.py."""

    id: str

    @abstractmethod
    def put(self, name: str, component: Any) -> None: ...

    @abstractmethod
    def get(self, name: str) -> Any: ...

    # topology hooks (no-op defaults) — called by strategy ops
    def on_duplicate(self, sel) -> None: ...

    def on_split(self, sel, rest) -> None: ...

    def on_remove(self, remove_mask) -> None: ...

    def on_relocate(self, dead_indices, sampled_indices) -> None: ...

    def on_sample_add(self, sampled_indices) -> None: ...

    def on_permute(self, order) -> None: ...


class GaussianScene(Scene):
    """Gaussian parameter container. Parity: scene/components/gaussian_scene.py.

    `splats` is the parameter dict {means, quats, scales, opacities, sh0,
    shN} (capacity-padded); `alive` is the active-slot mask.
    """

    def __init__(
        self,
        scene_id: str,
        splats: Dict[str, Any],
        alive: Optional[Any] = None,
    ):
        self.id = scene_id
        self.splats = splats
        self.alive = alive
        self._components: Dict[str, Any] = {}

    def put(self, name: str, component: Any) -> None:
        self._components[name] = component

    def get(self, name: str) -> Any:
        return self._components[name]

    def names(self):
        return list(self._components)

    @property
    def num_gaussians(self) -> int:
        import numpy as np

        if self.alive is not None:
            return int(np.asarray(self.alive).sum())
        return int(next(iter(self.splats.values())).shape[0])


class Stage:
    """scene_id -> (scene, render_fn) registry. Parity: stage/components/stage.py.

    `render(scene_id, **kwargs)` forwards `splats=scene.splats` (and
    `alive=scene.alive` when set) to the registered render function.
    """

    def __init__(self) -> None:
        self._scenes: Dict[str, tuple] = {}

    def add_scene(self, scene: GaussianScene, render_fn: Callable) -> None:
        if scene.id in self._scenes:
            raise ValueError(f"Scene {scene.id!r} already registered")
        self._scenes[scene.id] = (scene, render_fn)

    def remove_scene(self, scene_id: str) -> None:
        del self._scenes[scene_id]

    def get_scene(self, scene_id: str) -> GaussianScene:
        return self._scenes[scene_id][0]

    def scene_ids(self):
        return list(self._scenes)

    def render(self, scene_id: str, **kwargs):
        scene, fn = self._scenes[scene_id]
        if scene.alive is not None:
            return fn(splats=scene.splats, alive=scene.alive, **kwargs)
        return fn(splats=scene.splats, **kwargs)
