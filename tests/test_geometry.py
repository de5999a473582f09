"""Geometry functional API vs scipy.spatial.transform (xyzw convention)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

from gsplat_tpu import geometry as G


@pytest.fixture()
def quats():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((32, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_matrix(quats):
    ours = np.asarray(G.quat_to_matrix(jnp.asarray(quats)))
    ref = Rotation.from_quat(quats).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_quat_multiply_rotate(quats):
    q1, q2 = quats[:16], quats[16:]
    ours = np.asarray(G.quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
    ref = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
    # sign ambiguity
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, ref * sign, atol=1e-5)

    v = np.random.default_rng(1).standard_normal((16, 3)).astype(np.float32)
    ours_v = np.asarray(G.quat_rotate_vector(jnp.asarray(q1), jnp.asarray(v)))
    ref_v = Rotation.from_quat(q1).apply(v)
    np.testing.assert_allclose(ours_v, ref_v, atol=1e-5)


def test_quat_slerp_matches_scipy(quats):
    q1, q2 = quats[0], quats[1]
    if np.dot(q1, q2) < 0:
        q2 = -q2
    s = Slerp([0, 1], Rotation.from_quat(np.stack([q1, q2])))
    for t in (0.0, 0.25, 0.7, 1.0):
        ours = np.asarray(G.quat_slerp(jnp.asarray(q1), jnp.asarray(q2), t))
        ref = s(t).as_quat()
        sign = np.sign(np.dot(ours, ref))
        np.testing.assert_allclose(ours, ref * sign, atol=1e-5)


def test_quat_manifold_interp_endpoints(quats):
    q1, q2 = jnp.asarray(quats[:8]), jnp.asarray(quats[8:16])
    r0 = np.asarray(G.quat_manifold_interp(q1, q2, 0.0))
    r1 = np.asarray(G.quat_manifold_interp(q1, q2, 1.0))
    d0 = np.asarray(G.quat_angular_distance(jnp.asarray(r0), q1))
    d1 = np.asarray(G.quat_angular_distance(jnp.asarray(r1), q2))
    assert d0.max() < 1e-3
    assert d1.max() < 1e-3


def test_se3_roundtrip(quats):
    rng = np.random.default_rng(2)
    t = rng.standard_normal((32, 3)).astype(np.float32)
    q = jnp.asarray(quats)
    M = G.se3pose_to_matrix(jnp.asarray(t), q)
    t2, q2 = G.se3pose_from_matrix(M)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-5)
    d = np.asarray(G.quat_angular_distance(q2, q))
    assert d.max() < 1e-3
    # inverse matrix actually inverts
    Minv = G.se3pose_to_inverse_matrix(jnp.asarray(t), q)
    eye = np.asarray(jnp.einsum("nij,njk->nik", M, Minv))
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (32, 1, 1)), atol=1e-5)


def test_se3_transform_points(quats):
    rng = np.random.default_rng(3)
    t = rng.standard_normal((8, 3)).astype(np.float32)
    p = rng.standard_normal((8, 3)).astype(np.float32)
    q = jnp.asarray(quats[:8])
    fwd = G.se3pose_transform_point(jnp.asarray(t), q, jnp.asarray(p))
    back = G.se3pose_inverse_transform_point(jnp.asarray(t), q, fwd)
    np.testing.assert_allclose(np.asarray(back), p, atol=1e-5)


def test_compose(quats):
    rng = np.random.default_rng(4)
    t1 = rng.standard_normal((8, 3)).astype(np.float32)
    t2 = rng.standard_normal((8, 3)).astype(np.float32)
    q1, q2 = jnp.asarray(quats[:8]), jnp.asarray(quats[8:16])
    p = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    tc, qc = G.se3pose_compose(jnp.asarray(t1), q1, jnp.asarray(t2), q2)
    a = G.se3pose_transform_point(tc, qc, p)
    b = G.se3pose_transform_point(
        jnp.asarray(t1), q1, G.se3pose_transform_point(jnp.asarray(t2), q2, p)
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_interpolate_tracks(quats):
    # two tracks with 3 and 2 keyframes
    trans = np.array(
        [[0, 0, 0], [1, 0, 0], [2, 0, 0], [5, 5, 5], [6, 5, 5]], np.float32
    )
    rots = np.asarray(quats[:5])
    times = np.array([0.0, 1.0, 2.0, 0.0, 4.0], np.float32)
    offsets = np.array([0, 3], np.int32)
    counts = np.array([3, 2], np.int32)
    tr, ro = G.se3_interpolate_tracks(
        jnp.asarray(trans), jnp.asarray(rots), jnp.asarray(times),
        jnp.asarray(offsets), jnp.asarray(counts), 1.5,
    )
    tr = np.asarray(tr)
    np.testing.assert_allclose(tr[0], [1.5, 0, 0], atol=1e-5)
    # track 1 at t=1.5 -> 1.5/4 of the way from kf0 to kf1
    np.testing.assert_allclose(tr[1], [5 + 1.5 / 4, 5, 5], atol=1e-5)
    # clamping outside the span
    tr2, _ = G.se3_interpolate_tracks(
        jnp.asarray(trans), jnp.asarray(rots), jnp.asarray(times),
        jnp.asarray(offsets), jnp.asarray(counts), 100.0,
    )
    np.testing.assert_allclose(np.asarray(tr2)[0], [2, 0, 0], atol=1e-5)


def test_trajectory_2poses(quats):
    t0 = np.zeros((4, 3), np.float32)
    t1 = np.ones((4, 3), np.float32)
    q = jnp.asarray(np.tile([0, 0, 0, 1], (4, 1)).astype(np.float32))
    time0 = np.zeros(4, np.float32)
    time1 = np.ones(4, np.float32)
    p = np.zeros((4, 3), np.float32)
    out = G.trajectory_transform_point_2poses(
        jnp.asarray(t0), q, jnp.asarray(time0), jnp.asarray(t1), q,
        jnp.asarray(time1), jnp.asarray(p), jnp.asarray([0.5, 0.0, 1.0, 2.0]),
    )
    np.testing.assert_allclose(
        np.asarray(out["point"])[:, 0], [0.5, 0.0, 1.0, 2.0], atol=1e-6
    )
    assert np.asarray(out["out_of_bounds"]).tolist() == [
        False, False, False, True,
    ]
