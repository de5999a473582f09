import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.math import (
    quat_inverse,
    quat_multiply,
    quat_rotate,
    quat_scale_to_covar_preci,
    quat_slerp,
    quat_to_rotmat,
    rotmat_to_quat,
    triu_to_full,
)


def _rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 4)).astype(np.float32)
    return q


def test_quat_to_rotmat_properties():
    q = _rand_quats(128)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    # orthogonality + det 1
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # identity quat
    Rid = np.asarray(quat_to_rotmat(jnp.array([1.0, 0, 0, 0])))
    np.testing.assert_allclose(Rid, np.eye(3), atol=1e-6)
    # 90 deg about z: w=cos(45), z=sin(45)
    c = np.cos(np.pi / 4)
    R90 = np.asarray(quat_to_rotmat(jnp.array([c, 0, 0, c])))
    np.testing.assert_allclose(R90 @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_quat_rotate_matches_rotmat():
    q = _rand_quats(64)
    v = np.random.default_rng(1).standard_normal((64, 3)).astype(np.float32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    out = np.asarray(quat_rotate(jnp.asarray(qn), jnp.asarray(v)))
    np.testing.assert_allclose(out, np.einsum("nij,nj->ni", R, v), atol=1e-5)


def test_rotmat_quat_roundtrip():
    q = _rand_quats(256, seed=3)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    qn *= np.where(qn[:, :1] < 0, -1.0, 1.0)  # canonical w >= 0
    R = quat_to_rotmat(jnp.asarray(qn))
    q2 = np.asarray(rotmat_to_quat(R))
    np.testing.assert_allclose(q2, qn, atol=1e-4)


def test_quat_multiply_inverse():
    q = _rand_quats(32, seed=5)
    qn = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
    prod = np.asarray(quat_multiply(qn, quat_inverse(qn)))
    expected = np.zeros((32, 4), dtype=np.float32)
    expected[:, 0] = 1.0
    np.testing.assert_allclose(prod, expected, atol=1e-5)


def test_quat_slerp_endpoints_and_midpoint():
    q = _rand_quats(16, seed=7)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    q0, q1 = jnp.asarray(qn[:8]), jnp.asarray(qn[8:])
    s0 = np.asarray(quat_slerp(q0, q1, jnp.asarray(0.0)))
    s1 = np.asarray(quat_slerp(q0, q1, jnp.asarray(1.0)))
    # slerp flips q1's sign to the short arc; compare up to sign
    def close_up_to_sign(a, b):
        return np.minimum(
            np.abs(a - b).max(axis=-1), np.abs(a + b).max(axis=-1)
        )

    assert close_up_to_sign(s0, qn[:8]).max() < 1e-5
    assert close_up_to_sign(s1, qn[8:]).max() < 1e-5
    # midpoint is unit norm and equidistant (in angle) from both ends
    sm = np.asarray(quat_slerp(q0, q1, jnp.asarray(0.5)))
    np.testing.assert_allclose(np.linalg.norm(sm, axis=-1), 1.0, atol=1e-5)
    d0 = np.abs(np.sum(sm * np.asarray(s0), axis=-1))
    d1 = np.abs(np.sum(sm * np.asarray(s1), axis=-1))
    np.testing.assert_allclose(d0, d1, atol=1e-4)


def test_quat_scale_to_covar_preci_brute_force():
    rng = np.random.default_rng(11)
    q = _rand_quats(64, seed=9)
    s = (rng.random((64, 3)) * 0.5 + 0.1).astype(np.float32)
    covar, preci = quat_scale_to_covar_preci(jnp.asarray(q), jnp.asarray(s))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    expected_covar = np.einsum(
        "nij,nj,nkj->nik", R, (s * s).astype(np.float32), R
    )
    np.testing.assert_allclose(np.asarray(covar), expected_covar, rtol=1e-4, atol=1e-6)
    # precision is the inverse of covariance
    prod = np.einsum("nij,njk->nik", np.asarray(covar), np.asarray(preci))
    np.testing.assert_allclose(
        prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-2
    )


def test_triu_roundtrip():
    q = _rand_quats(8)
    s = np.full((8, 3), 0.3, dtype=np.float32)
    covar_full, _ = quat_scale_to_covar_preci(
        jnp.asarray(q), jnp.asarray(s), compute_preci=False
    )
    covar_triu, _ = quat_scale_to_covar_preci(
        jnp.asarray(q), jnp.asarray(s), compute_preci=False, triu=True
    )
    assert covar_triu.shape == (8, 6)
    np.testing.assert_allclose(
        np.asarray(triu_to_full(covar_triu)), np.asarray(covar_full), atol=1e-6
    )


def test_grad_flows():
    q = jnp.asarray(_rand_quats(4))
    s = jnp.full((4, 3), 0.2)

    def f(q, s):
        c, p = quat_scale_to_covar_preci(q, s)
        return jnp.sum(c) + jnp.sum(p)

    gq, gs = jax.grad(f, argnums=(0, 1))(q, s)
    assert np.isfinite(np.asarray(gq)).all()
    assert np.isfinite(np.asarray(gs)).all()
