"""Pallas rasterizer vs the jnp oracle: forward + gradient parity.

Runs in Pallas interpret mode on CPU (the kernels detect the backend); the
same assertions pass on real TPU hardware (run with
GSPLAT_TPU_TEST_PLATFORM=tpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.isect import isect_offset_encode, isect_tiles
from gsplat_tpu.ops.rasterize import rasterize_to_pixels, tile_image, untile_image
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    I, N, D = 2, 150, 3
    W, H, ts = 40, 35, 16  # deliberately not multiples of 16
    tw, th = -(-W // ts), -(-H // ts)
    means2d = rng.uniform(-5, 45, (I, N, 2)).astype(np.float32)
    L = rng.standard_normal((I, N, 2, 2)).astype(np.float32) * 0.4
    cov = L @ L.transpose(0, 1, 3, 2) + 0.1 * np.eye(2, dtype=np.float32)
    inv = np.linalg.inv(cov)
    conics = np.stack(
        [inv[..., 0, 0], inv[..., 0, 1], inv[..., 1, 1]], -1
    ).astype(np.float32)
    colors = rng.random((I, N, D)).astype(np.float32)
    opacities = np.clip(rng.random((I, N)) * 1.2, 0, 1).astype(np.float32)
    radii = np.full((I, N, 2), 5, np.int32)
    radii[:, ::7] = 0
    depths = (rng.random((I, N)) * 5 + 0.1).astype(np.float32)
    isect = isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        ts, tw, th, capacity=2048,
    )
    offsets = isect_offset_encode(isect.tile_keys, I, tw, th)
    return dict(
        args=(
            jnp.asarray(means2d), jnp.asarray(conics),
            jnp.asarray(colors), jnp.asarray(opacities),
        ),
        radii=jnp.asarray(radii), depths=jnp.asarray(depths),
        W=W, H=H, ts=ts, tw=tw, th=th, isect=isect, offsets=offsets, rng=rng,
    )


def _ref(s, *args, bg=None):
    return rasterize_to_pixels_ref(
        *args, s["W"], s["H"], s["ts"], s["offsets"],
        s["isect"].flatten_ids, s["isect"].n_isects, max_range=512,
        backgrounds=bg,
    )


def _pal(s, *args, bg=None, masks=None):
    c, a, _aux = rasterize_to_pixels(
        *args, s["W"], s["H"], s["radii"], s["depths"], 2048,
        backgrounds=bg, masks=masks,
    )
    return c, a


def _band_close(a, b, name, strict=3e-5, frac=0.05, hard=2e-4):
    """Boundary-band assert (reference _helper.py:105-342 style).

    The kernel computes the transmittance scan as exp(cumsum(log(1-a)))
    on the MXU (exact-3x bf16 components, ops/mxu.py) with a linear
    inter-chunk carry; vs the oracle's sequential running product this
    carries ~1e-4-class absolute noise (TPU transcendental ulps + a
    different f32 association order), measured max ~7e-5 on this scene.
    Most pixels stay within the strict f32-noise bound; a small fraction
    may sit in the tail, all bounded by `hard`.
    """
    diff = np.abs(np.asarray(a) - np.asarray(b))
    bad = float((diff > strict).mean())
    assert bad < frac, (name, bad)
    assert float(diff.max()) < hard, (name, float(diff.max()))


def test_forward_matches_oracle(scene):
    ref_c, ref_a = _ref(scene, *scene["args"])
    pal_c, pal_a = _pal(scene, *scene["args"])
    _band_close(pal_c, ref_c, "colors")
    _band_close(pal_a, ref_a, "alphas")


def test_forward_background(scene):
    bg = jnp.asarray(np.random.default_rng(1).random((2, 3)).astype(np.float32))
    ref_c, _ = _ref(scene, *scene["args"], bg=bg)
    pal_c, _ = _pal(scene, *scene["args"], bg=bg)
    _band_close(pal_c, ref_c, "colors_bg")


def test_tile_masks(scene):
    I, th, tw = 2, scene["th"], scene["tw"]
    masks = np.ones((I, th, tw), bool)
    masks[0, 0, 0] = False
    bg = jnp.asarray(np.random.default_rng(1).random((2, 3)).astype(np.float32))
    pal_c, pal_a = _pal(scene, *scene["args"], bg=bg, masks=jnp.asarray(masks))
    c = np.asarray(pal_c)
    a = np.asarray(pal_a)
    # masked tile shows pure background with zero alpha
    np.testing.assert_allclose(
        c[0, :16, :16], np.broadcast_to(np.asarray(bg)[0], (16, 16, 3)), atol=1e-6
    )
    assert (a[0, :16, :16] == 0).all()
    # unmasked tiles unaffected
    ref_c, _ = _ref(scene, *scene["args"], bg=bg)
    _band_close(c[1], np.asarray(ref_c)[1], "unmasked_tiles")


def test_gradients_match_oracle_autodiff(scene):
    tgt = jnp.asarray(
        np.random.default_rng(2).random((2, scene["H"], scene["W"], 3)).astype(np.float32)
    )

    def loss_ref(*args):
        c, a = _ref(scene, *args)
        return jnp.sum((c - tgt) ** 2) + 0.3 * jnp.sum(a)

    def loss_pal(*args):
        c, a = _pal(scene, *args)
        return jnp.sum((c - tgt) ** 2) + 0.3 * jnp.sum(a)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*scene["args"])
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*scene["args"])
    for gr, gp in zip(g_ref, g_pal):
        scale = max(float(jnp.abs(gr).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=3e-4 * scale
        )


def test_empty_input(scene):
    s = scene
    m2 = jnp.zeros((1, 8, 2))
    cn = jnp.tile(jnp.asarray([1.0, 0.0, 1.0]), (1, 8, 1))
    cl = jnp.zeros((1, 8, 3))
    op = jnp.zeros((1, 8))
    radii = jnp.zeros((1, 8, 2), jnp.int32)
    dep = jnp.ones((1, 8))
    c, a, aux = rasterize_to_pixels(
        m2, cn, cl, op, s["W"], s["H"], radii, dep, 128
    )
    assert int(aux["n_isects"]) == 0
    assert (np.asarray(c) == 0).all()
    assert (np.asarray(a) == 0).all()


def test_tile_untile_roundtrip():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 35, 40, 5)).astype(np.float32))
    tiled = tile_image(img)
    assert tiled.shape == (2 * 3 * 3, 5, 256)
    back = untile_image(tiled, 2, 3, 3, 35, 40)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_packed_entry_matches_dense(scene):
    """rasterize_to_pixels_packed on a hand-packed (image, gaussian) list
    must match the dense path (reference packed=True semantics,
    rendering.py:348-362)."""
    from gsplat_tpu.ops.rasterize import rasterize_to_pixels_packed

    s = scene
    m2, cn, cl, op = s["args"]
    I, N, D = cl.shape
    radii, depths = s["radii"], s["depths"]
    W, H = s["W"], s["H"]

    dense_c, dense_a, _ = rasterize_to_pixels(
        m2, cn, cl, op, W, H, radii, depths, isect_capacity=4096
    )

    # pack visible rows first (numpy compaction)
    alive = np.asarray((radii > 0).all(-1)).reshape(-1)
    order = np.argsort(~alive, kind="stable")
    n_live = int(alive.sum())
    E = I * N
    im_ids = (np.arange(E) // N)[order].astype(np.int32)
    pk = lambda x, d: jnp.asarray(np.asarray(x).reshape(E, d)[order])

    def render_packed(m2p, cnp, clp, opp):
        c, a, _ = rasterize_to_pixels_packed(
            m2p, cnp, clp, opp,
            pk(radii, 2).astype(jnp.int32), pk(depths, 1)[:, 0],
            jnp.asarray(im_ids), jnp.asarray(n_live, jnp.int32),
            I, W, H, isect_capacity=4096,
        )
        return c, a

    args_p = (pk(m2, 2), pk(cn, 3), pk(cl, D), pk(op, 1)[:, 0])
    pc, pa = render_packed(*args_p)
    np.testing.assert_allclose(
        np.asarray(pc), np.asarray(dense_c), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pa), np.asarray(dense_a), atol=1e-5, rtol=1e-5
    )

    # gradients return in the packed layout and match the dense path's
    # (re-packed) gradients
    v = jnp.asarray(
        np.random.default_rng(1).standard_normal(dense_c.shape).astype(
            np.float32
        )
    )

    def loss_packed(*a):
        c, _ = render_packed(*a)
        return jnp.sum(c * v)

    def loss_dense(m2d, cnd, cld, opd):
        c, _, _ = rasterize_to_pixels(
            m2d, cnd, cld, opd, W, H, radii, depths, isect_capacity=4096
        )
        return jnp.sum(c * v)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(*args_p)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(m2, cn, cl, op)
    for a, b, d in zip(gp, gd, (2, 3, D, 1)):
        b_packed = np.asarray(b).reshape(E, d)[order]
        if d == 1:
            b_packed = b_packed[:, 0]
        np.testing.assert_allclose(
            np.asarray(a), b_packed, atol=1e-5, rtol=1e-4
        )


def test_pack_payload_forward_matches_fast_path(scene):
    """pack_payload=True training forward must equal the no-grad fast path
    bit-for-bit: both route the identical bf16-pair packed worklist through
    the same packed kernel (ops/rasterize.py PACK_SORT)."""
    from gsplat_tpu.ops.rasterize import rasterize_to_pixels_fast

    s = scene
    m2, cn, cl, op = s["args"]
    c_pk, a_pk, _ = rasterize_to_pixels(
        m2, cn, cl, op, s["W"], s["H"], s["radii"], s["depths"], 2048,
        pack_payload=True,
    )
    c_fast, a_fast, _ = rasterize_to_pixels_fast(
        m2, cn, cl, op, s["W"], s["H"], s["radii"], s["depths"], 2048
    )
    np.testing.assert_array_equal(np.asarray(c_pk), np.asarray(c_fast))
    np.testing.assert_array_equal(np.asarray(a_pk), np.asarray(a_fast))


def test_pack_payload_gradients_approximate_exact(scene):
    """Gradients of the packed-payload forward are the exact autodiff of a
    bf16-quantized forward: they must track the exact path's gradients to
    bf16-grade (~2**-9 relative) accuracy at gradient scale."""
    tgt = jnp.asarray(
        np.random.default_rng(3)
        .random((2, scene["H"], scene["W"], 3))
        .astype(np.float32)
    )

    def loss(pack, pgr, *args):
        c, a, _ = rasterize_to_pixels(
            *args, scene["W"], scene["H"], scene["radii"], scene["depths"],
            2048, pack_payload=pack, pack_grads=pgr,
        )
        return jnp.sum((c - tgt) ** 2) + 0.3 * jnp.sum(a)

    g_exact = jax.grad(lambda *a: loss(False, False, *a), argnums=(0, 1, 2, 3))(
        *scene["args"]
    )
    g_pack = jax.grad(lambda *a: loss(True, False, *a), argnums=(0, 1, 2, 3))(
        *scene["args"]
    )
    g_both = jax.grad(lambda *a: loss(True, True, *a), argnums=(0, 1, 2, 3))(
        *scene["args"]
    )
    for ge, gp, gb in zip(g_exact, g_pack, g_both):
        scale = max(float(jnp.abs(ge).max()), 1e-3)
        # packed payload: the quantized forward is a slightly DIFFERENT
        # function — its exact gradient deviates most for sharp gaussians
        # (conic * bf16 position error).  Band check: the bulk tracks to
        # ~2% of gradient scale, the worst tail stays bounded.
        diff = np.abs(np.asarray(gp) - np.asarray(ge))
        assert float((diff > 2e-2 * scale).mean()) < 0.03, diff.max() / scale
        assert float(diff.max()) < 0.3 * scale
        # pack_grads adds ~2**-9 per-slot rounding on top of the packed
        # payload's grads (sums of per-slot bf16 pairs)
        diff2 = np.abs(np.asarray(gb) - np.asarray(gp))
        assert float((diff2 > 5e-3 * scale).mean()) < 0.03, (
            diff2.max() / scale
        )
        assert float(diff2.max()) < 0.1 * scale


def test_pack_grads_only_matches_exact_forward(scene):
    """pack_grads without pack_payload keeps the exact forward (values
    bit-identical to the default path); only the per-slot grad transport
    is bf16-pair rounded."""
    s = scene
    m2, cn, cl, op = s["args"]
    c0, a0, _ = rasterize_to_pixels(
        m2, cn, cl, op, s["W"], s["H"], s["radii"], s["depths"], 2048
    )
    c1, a1, _ = rasterize_to_pixels(
        m2, cn, cl, op, s["W"], s["H"], s["radii"], s["depths"], 2048,
        pack_grads=True,
    )
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


@pytest.mark.parametrize("ts", [8, 32])
def test_tile_size_variants_match_oracle(scene, ts):
    """tile_size 8/32 pipelines must produce the same image as the oracle
    (the reference runtime-dispatches tile size, Rendering.cpp:261-274;
    here it reshapes the whole plan/sort/kernel pipeline)."""
    s = scene
    m2, cn, cl, op = s["args"]
    ref_c, ref_a = _ref(s, m2, cn, cl, op)
    c, a, aux = rasterize_to_pixels(
        m2, cn, cl, op, s["W"], s["H"], s["radii"], s["depths"], 4096,
        tile_size=ts,
    )
    # larger tiles mean ~(ts/16)^2 x longer per-tile spans, so the
    # transmittance scan accumulates proportionally more inter-chunk
    # carry noise: scale the hard band by the span growth (measured
    # max 4.5e-4 at ts=32 on this scene, 42/8400 px over the 1e-4 line,
    # all at mid-alpha pixels with deep compositing chains)
    hard = 2e-4 * max(1.0, (ts / 16.0) ** 2)
    _band_close(c, ref_c, f"colors ts={ts}", hard=hard)
    _band_close(a, ref_a, f"alphas ts={ts}", hard=hard)

    # gradients flow and match the oracle's (same bounds as the ts=16 test)
    tgt = jnp.asarray(
        np.random.default_rng(7)
        .random((2, s["H"], s["W"], 3))
        .astype(np.float32)
    )

    def loss_pal(*args):
        c, a, _ = rasterize_to_pixels(
            *args, s["W"], s["H"], s["radii"], s["depths"], 4096,
            tile_size=ts,
        )
        return jnp.sum((c - tgt) ** 2) + 0.3 * jnp.sum(a)

    def loss_ref(*args):
        c, a = _ref(s, *args)
        return jnp.sum((c - tgt) ** 2) + 0.3 * jnp.sum(a)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*s["args"])
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*s["args"])
    for gr, gp in zip(g_ref, g_pal):
        scale = max(float(jnp.abs(gr).max()), 1.0)
        # replay-noise in the backward grows with span depth like the
        # forward band above (measured: 4/600 means-grad entries at
        # ~7e-4 x scale for ts=32)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr),
            atol=3e-4 * scale * max(1.0, (ts / 16.0) ** 2),
        )
