"""Render the bundled garden test scene through the public API.

Usage:
    python examples/render_garden.py --out /tmp/garden.png [--factor 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from gsplat_tpu import rasterization
from gsplat_tpu.utils.data import load_test_data


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/garden.png")
    p.add_argument("--factor", type=int, default=4)
    p.add_argument("--view", type=int, default=0)
    p.add_argument("--capacity", type=int, default=2_000_000)
    args = p.parse_args()

    means, quats, scales, opac, colors, viewmats, Ks, W, H = load_test_data()
    f = args.factor
    Ks = Ks.copy()
    Ks[:, :2, :] /= f
    W, H = W // f, H // f

    t0 = time.time()
    c, a, meta = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors),
        jnp.asarray(viewmats[args.view : args.view + 1]),
        jnp.asarray(Ks[args.view : args.view + 1]),
        W, H, isect_capacity=args.capacity,
    )
    print(
        f"rendered {W}x{H} in {time.time()-t0:.1f}s (incl. compile); "
        f"n_isects={int(meta['n_isects'])} overflow={bool(meta['isect_overflow'])}"
    )
    img = (np.clip(np.asarray(c)[0], 0, 1) * 255).astype(np.uint8)
    from PIL import Image

    Image.fromarray(img).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
