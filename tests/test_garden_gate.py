"""BASELINE correctness gate: garden scene through the full Pallas path.

BASELINE.json's first gate is "fwd image + pixel grads allclose vs the
reference on assets/test_garden.npz".  This test renders the real garden
fixture (subsampled, 1/8 resolution — the verify-skill config) through
`rasterization()` — the production Pallas pipeline with tight intersection
— and asserts forward + pixel-gradient parity against the compositional
jnp oracle (ops/rasterize_ref.py mirrors cuda/_torch_impl.py semantics).

Runs on CPU (Pallas interpret mode) in CI; identical assertions run on the
real chip with GSPLAT_TPU_TEST_PLATFORM=tpu.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.isect import isect_offset_encode, isect_tiles
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref
from gsplat_tpu.rendering import rasterization


@pytest.fixture(scope="module")
def garden(garden_small):
    g = {}
    for k, v in garden_small.items():
        if isinstance(v, int):
            g[k] = v
        elif k in ("viewmats", "Ks"):
            g[k] = jnp.asarray(v)
        else:
            # halve the gaussian count so the deepest tile stays under the
            # oracle's max_range (the oracle is O(pixels * max_range))
            g[k] = jnp.asarray(v[::2])
    return g


def _pallas_render(g, means, colors, opacities):
    colors_full = jnp.broadcast_to(
        colors[None], (1, colors.shape[0], colors.shape[1])
    )
    out, alphas, meta = rasterization(
        means, g["quats"], g["scales"], opacities, colors_full,
        g["viewmats"][:1], g["Ks"][:1], g["width"], g["height"],
        near_plane=0.01, isect_capacity=600_000,
    )
    return out, alphas, meta


def _oracle_render(g, means, colors, opacities):
    W, H = g["width"], g["height"]
    ts = 16
    tw, th = -(-W // ts), -(-H // ts)
    radii, m2, depths, conics, _ = fully_fused_projection(
        means, None, g["quats"], g["scales"],
        g["viewmats"][:1], g["Ks"][:1], W, H,
        near_plane=0.01, opacities=opacities,
    )
    isect = isect_tiles(m2, radii, depths, ts, tw, th, capacity=600_000)
    offsets = isect_offset_encode(isect.tile_keys, 1, tw, th)
    cols = jnp.broadcast_to(colors[None], (1,) + colors.shape)
    out, alphas = rasterize_to_pixels_ref(
        m2, conics, cols, opacities[None], W, H, ts, offsets,
        isect.flatten_ids, isect.n_isects, max_range=4096,
    )
    return out, alphas


def test_garden_forward_parity(garden):
    g = garden
    out_p, a_p, meta = _pallas_render(
        g, g["means"], g["colors"], g["opacities"]
    )
    out_o, a_o = _oracle_render(g, g["means"], g["colors"], g["opacities"])
    assert not bool(meta["isect_overflow"])
    assert int(meta["n_isects"]) > 10_000  # a real scene, not a degenerate one
    # deep tiles (~2k gaussians) accumulate f32 compositing error in
    # different association orders (chunked scan vs running product), and
    # slots at the T=1e-4 saturation cutoff can flip `contribute`:
    # boundary-band tolerance like the reference's _helper.py:105-342 —
    # everything within 1e-3, except a <0.1% band allowed up to 1e-2.
    def band_close(a, b, name):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        frac = float((diff > 1e-3).mean())
        assert frac < 1e-3, (name, frac)
        assert float(diff.max()) < 1e-2, (name, float(diff.max()))

    band_close(out_p, out_o, "colors")
    band_close(a_p[..., 0], a_o[..., 0], "alphas")


def test_garden_pixel_grad_parity(garden):
    g = garden
    key = jax.random.PRNGKey(0)
    v_pix = jax.random.normal(
        key, (1, g["height"], g["width"], 3), jnp.float32
    )

    def loss_p(means, colors, opacities):
        out, alphas, _ = _pallas_render(g, means, colors, opacities)
        return jnp.sum(out * v_pix) + 0.1 * jnp.sum(alphas)

    def loss_o(means, colors, opacities):
        out, alphas = _oracle_render(g, means, colors, opacities)
        return jnp.sum(out * v_pix) + 0.1 * jnp.sum(alphas)

    args = (g["means"], g["colors"], g["opacities"])
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(*args)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(gp, go, ("means", "colors", "opacities")):
        a = np.asarray(a)
        b = np.asarray(b)
        # boundary-band style tolerance (reference _helper.py:105-342):
        # slots whose transmittance sits at the 1e-4 saturation cutoff can
        # flip `contribute` between the chunked-scan kernel and the oracle
        # (f32 association order), carrying ~1e-4-scale weights; measure
        # disagreement against the gradient scale and allow a small band.
        scale = max(float(np.abs(b).max()), 1e-6)
        diff = np.abs(a - b)
        frac_bad = float((diff > 1e-3 * scale).mean())
        assert frac_bad < 5e-3, (name, frac_bad)
        assert float(diff.max()) < 2e-2 * scale, (name, float(diff.max()))
