"""EndoNeRF surgical dataset loader.

Parity: `/root/reference/examples/datasets/endonerf.py` (304 LoC) —
EndoNeRF/LLFF directory layout with per-frame metric depth and binary
tool masks, feeding `examples/dynamic_surgical_trainer.py`.

Layout::

    <data_dir>/
      poses_bounds.npy            # (N, 17): 15 = [R|t|(H,W,focal)], 2 = near/far
      images/  000000.png ...
      depth/   000000.png ...     # metric depth, 0 = no measurement
      masks/   000000.png ...     # binary {0,255}; on-disk 255 = TOOL

Conventions (matched against the reference loader):

- LLFF pose columns are [down, right, back]; converted here to the
  [right, up, back] convention the rest of the framework uses
  (reference endonerf.py:188-196).
- masks are inverted on load (``1 - mask/255``) so the returned array is
  a tissue-INCLUDE mask: 1 = keep pixel in loss, 0 = tool/drop
  (reference endonerf.py:252-257).
- ``time = idx / n_frames``; frame ``i`` is a test frame iff
  ``(i - 1) % test_every == 0`` (reference endonerf.py:154-157).

Items are plain numpy (this framework's dataset convention — see
`examples/datasets/colmap.py:Dataset`); trainers move them to device.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np


class EndoNeRFParser:
    """Parse an EndoNeRF directory into in-memory arrays.

    Attributes after init: ``height``, ``width``, ``focal``, ``K`` (3,3),
    ``bounds`` (N,2), ``camtoworlds`` (N,4,4), ``times`` (N,),
    ``image_paths``/``depth_paths``/``mask_paths``,
    ``train_idxs``/``test_idxs``/``video_idxs``.
    """

    def __init__(
        self,
        data_dir: str,
        dataset_type: str = "endonerf",
        test_every: int = 8,
    ):
        if not os.path.isdir(data_dir):
            raise FileNotFoundError(f"data_dir not found: {data_dir}")
        if dataset_type == "scared":
            raise NotImplementedError(
                "dataset_type='scared' is recognised but its on-disk layout "
                "(per-frame JSON calibrations) is not ported; use 'endonerf'."
            )
        if dataset_type != "endonerf":
            raise ValueError(f"unknown dataset_type {dataset_type!r}")
        self.data_dir = data_dir
        self.test_every = int(test_every)

        pb_path = os.path.join(data_dir, "poses_bounds.npy")
        if not os.path.exists(pb_path):
            raise FileNotFoundError(f"missing poses_bounds.npy at {pb_path}")
        poses_arr = np.load(pb_path)
        n = poses_arr.shape[0]
        poses = poses_arr[:, :15].reshape(n, 3, 5)
        self.bounds = poses_arr[:, 15:].astype(np.float32)

        h, w, focal = poses[0, :, -1]
        self.height, self.width = int(h), int(w)
        self.focal = float(focal)
        self.K = np.array(
            [
                [self.focal, 0.0, self.width // 2],
                [0.0, self.focal, self.height // 2],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float32,
        )

        # LLFF [down, right, back] -> [right, up, back]
        c2w = poses[..., :4]
        c2w = c2w[:, :, [1, 0, 2, 3]] * np.array(
            [1.0, -1.0, 1.0, 1.0], dtype=np.float32
        )
        bottom = np.broadcast_to(
            np.array([[0.0, 0.0, 0.0, 1.0]], np.float32), (n, 1, 4)
        )
        self.camtoworlds = np.concatenate([c2w, bottom], axis=1).astype(
            np.float32
        )
        self.times = np.arange(n, dtype=np.float32) / n

        def _pngs(sub: str) -> List[str]:
            d = os.path.join(data_dir, sub)
            return sorted(
                os.path.join(d, f)
                for f in (os.listdir(d) if os.path.isdir(d) else [])
                if f.lower().endswith(".png")
            )

        self.image_paths = _pngs("images")
        self.depth_paths = _pngs("depth")
        self.mask_paths = _pngs("masks")
        for name, paths in (
            ("images", self.image_paths),
            ("depth", self.depth_paths),
            ("masks", self.mask_paths),
        ):
            if len(paths) != n:
                raise ValueError(
                    f"{name}/ has {len(paths)} files but poses_bounds.npy "
                    f"has {n} frames"
                )

        _validate_mask_binary(self.mask_paths[0])

        self.train_idxs = [i for i in range(n) if (i - 1) % test_every != 0]
        self.test_idxs = [i for i in range(n) if (i - 1) % test_every == 0]
        self.video_idxs = list(range(n))


class EndoNeRFDataset:
    """Random-access split view; items are numpy dicts.

    Keys: ``image`` (H,W,3 f32 in [0,1]), ``depth`` (H,W f32, 0 = no
    measurement), ``mask`` (H,W f32 tissue-include), ``camtoworld`` (4,4),
    ``K`` (3,3), ``time`` (f32 scalar).
    """

    def __init__(self, parser: EndoNeRFParser, split: str = "train"):
        self.parser = parser
        self.split = split
        splits: Dict[str, Sequence[int]] = {
            "train": parser.train_idxs,
            "test": parser.test_idxs,
            "video": parser.video_idxs,
        }
        if split not in splits:
            raise ValueError(
                f"unknown split {split!r}; expected train/test/video"
            )
        self.indices = list(splits[split])

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int) -> dict:
        from PIL import Image

        idx = self.indices[i]
        p = self.parser
        image = (
            np.asarray(Image.open(p.image_paths[idx]).convert("RGB"), np.float32)
            / 255.0
        )
        depth = np.asarray(Image.open(p.depth_paths[idx]), np.float32)
        mask_raw = np.asarray(Image.open(p.mask_paths[idx]))
        if mask_raw.ndim == 3:
            mask_raw = mask_raw[..., 0]
        mask = 1.0 - mask_raw.astype(np.float32) / 255.0  # 1=tissue, 0=tool
        return {
            "image": image,
            "depth": depth,
            "mask": mask,
            "camtoworld": p.camtoworlds[idx],
            "K": p.K,
            "time": np.float32(p.times[idx]),
            "image_id": idx,
        }


def _validate_mask_binary(mask_path: str) -> None:
    """Raise unless the mask PNG is binary {0, 255} (tool-mask contract)."""
    from PIL import Image

    arr = np.asarray(Image.open(mask_path))
    if arr.ndim == 3:
        arr = arr[..., 0]
    vals = set(np.unique(arr).tolist())
    if not vals.issubset({0, 255}):
        raise ValueError(
            f"mask {mask_path} is non-binary (values {sorted(vals)[:8]}); "
            "masks must be {0,255} PNGs (255 = tool)"
        )
