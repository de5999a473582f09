"""Double-precision gradcheck for the differentiable math layers.

The analog of the reference's `torch.autograd.gradcheck(..., double)`
test class (tests/test_basic.py uses float64 gradcheck on projection/
SH/covar ops): `jax.test_util.check_grads` compares autodiff against
central finite differences under `jax.experimental.enable_x64`.  The
Pallas rasterizer is f32-only by design (its gradients are covered by
the oracle-parity suites); everything upstream of it is plain jnp and
must pass second-order-accurate f64 gradcheck.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import test_util as jtu
from contextlib import contextmanager


@contextmanager
def enable_x64():
    # this jax build lacks jax.experimental.enable_x64; the config toggle
    # participates in the trace context, so scoping it is equivalent
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)

from gsplat_tpu.ops.math import quat_scale_to_covar_preci
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.sh import spherical_harmonics
from gsplat_tpu.losses import ssim


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape))


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def test_quat_scale_to_covar_preci_grads(rng):
    with enable_x64():
        quats = _rand(rng, 12, 4)
        scales = jnp.asarray(rng.uniform(0.1, 1.0, (12, 3)))

        def f(q, s):
            covars, precis = quat_scale_to_covar_preci(q, s)
            return jnp.sum(covars) + jnp.sum(precis * 1e-2)

        jtu.check_grads(f, (quats, scales), order=1, modes=("rev",),
                        atol=1e-6, rtol=1e-6)


def test_projection_grads(rng):
    with enable_x64():
        n = 8
        means = jnp.asarray(rng.uniform(-2, 2, (n, 3)))
        means = means.at[:, 2].add(6.0)
        quats = _rand(rng, n, 4)
        scales = jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)))
        viewmats = jnp.asarray(np.eye(4)[None])
        Ks = jnp.asarray(
            np.array([[[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]])
        )

        def f(m, q, s):
            radii, m2, d, cn, _ = fully_fused_projection(
                m, None, q, s, viewmats, Ks, 64, 48
            )
            keep = (radii > 0).all(-1)
            return (
                jnp.sum(jnp.where(keep[..., None], m2, 0.0))
                + jnp.sum(jnp.where(keep, d, 0.0))
                + jnp.sum(jnp.where(keep[..., None], cn, 0.0))
            )

        jtu.check_grads(f, (means, quats, scales), order=1, modes=("rev",),
                        atol=1e-5, rtol=1e-5)


def test_sh_grads(rng):
    with enable_x64():
        n, K = 6, 16  # degree 3
        coeffs = _rand(rng, n, K, 3) * 0.3
        dirs = _rand(rng, n, 3)

        def f(c, d):
            return jnp.sum(
                spherical_harmonics(3, d, c)
            )

        jtu.check_grads(f, (coeffs, dirs), order=1, modes=("rev",),
                        atol=1e-6, rtol=1e-6)


def test_loss_grads(rng):
    with enable_x64():
        a = jnp.asarray(rng.uniform(0.1, 0.9, (1, 24, 32, 3)))
        b = jnp.asarray(rng.uniform(0.1, 0.9, (1, 24, 32, 3)))
        # l1 is non-smooth (|.| kinks defeat finite differences); its
        # gradient is covered analytically in test_losses. SSIM is smooth.
        jtu.check_grads(lambda x: ssim(x, b), (a,), order=1,
                        modes=("rev",), atol=1e-5, rtol=1e-4)
