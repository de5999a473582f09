"""Projection tests against an independent numpy matrix-algebra oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.math import quat_to_rotmat
from gsplat_tpu.ops.projection import fully_fused_projection, proj


def _np_oracle_project(means, quats, scales, viewmats, Ks, width, height, eps2d=0.3):
    """Independent numpy projection using explicit matrices + np.linalg."""
    N = means.shape[0]
    C = viewmats.shape[0]
    R_q = np.asarray(quat_to_rotmat(jnp.asarray(quats)))
    covars = np.einsum("nij,nj,nkj->nik", R_q, scales**2, R_q)

    means2d = np.zeros((C, N, 2), np.float64)
    depths = np.zeros((C, N), np.float64)
    conics = np.zeros((C, N, 3), np.float64)
    covars2d = np.zeros((C, N, 2, 2), np.float64)
    for c in range(C):
        R = viewmats[c, :3, :3].astype(np.float64)
        t = viewmats[c, :3, 3].astype(np.float64)
        K = Ks[c].astype(np.float64)
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        tan_fovx = 0.5 * width / fx
        tan_fovy = 0.5 * height / fy
        lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
        lim_x_neg = cx / fx + 0.3 * tan_fovx
        lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
        lim_y_neg = cy / fy + 0.3 * tan_fovy
        for n in range(N):
            p = R @ means[n].astype(np.float64) + t
            S = R @ covars[n].astype(np.float64) @ R.T
            tx, ty, tz = p
            depths[c, n] = tz
            means2d[c, n] = [fx * tx / tz + cx, fy * ty / tz + cy]
            txc = tz * np.clip(tx / tz, -lim_x_neg, lim_x_pos)
            tyc = tz * np.clip(ty / tz, -lim_y_neg, lim_y_pos)
            J = np.array(
                [
                    [fx / tz, 0.0, -fx * txc / tz**2],
                    [0.0, fy / tz, -fy * tyc / tz**2],
                ]
            )
            c2d = J @ S @ J.T
            covars2d[c, n] = c2d
            blur = c2d + eps2d * np.eye(2)
            det = max(np.linalg.det(blur), 1e-10)
            inv = np.linalg.inv(blur) if det > 1e-10 else np.zeros((2, 2))
            inv = np.array(
                [[blur[1, 1], -blur[0, 1]], [-blur[0, 1], blur[0, 0]]]
            ) / det
            conics[c, n] = [inv[0, 0], inv[0, 1], inv[1, 1]]
    return means2d, depths, conics, covars2d


@pytest.fixture(scope="module")
def small_scene():
    rng = np.random.default_rng(0)
    N = 200
    means = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    means[:, 2] += 4.0
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.3 + 0.05).astype(np.float32)
    opacities = rng.random(N).astype(np.float32)
    viewmats = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
    viewmats[1, :3, 3] = [0.2, -0.1, 0.5]
    Ks = np.array(
        [[[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]]] * 2, dtype=np.float32
    )
    return means, quats, scales, opacities, viewmats, Ks, 128, 96


def test_projection_matches_numpy_oracle(small_scene):
    means, quats, scales, opacities, viewmats, Ks, width, height = small_scene
    radii, means2d, depths, conics, comp = fully_fused_projection(
        jnp.asarray(means), None, jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
    )
    m2_ref, d_ref, con_ref, _ = _np_oracle_project(
        means, quats, scales, viewmats, Ks, width, height
    )
    np.testing.assert_allclose(np.asarray(means2d), m2_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depths), d_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conics), con_ref, rtol=2e-3, atol=1e-4)
    assert comp is None
    # visible gaussians should have positive radii
    vis = np.asarray(radii) > 0
    assert vis.any()


def test_opacity_aware_radius_shrinks(small_scene):
    means, quats, scales, opacities, viewmats, Ks, width, height = small_scene
    r_plain, *_ = fully_fused_projection(
        jnp.asarray(means), None, jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
    )
    r_op, *_ = fully_fused_projection(
        jnp.asarray(means), None, jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
        opacities=jnp.asarray(opacities),
    )
    # opacity-aware extend is never larger than the 3.33-sigma box
    both_visible = (np.asarray(r_plain) > 0) & (np.asarray(r_op) > 0)
    assert (np.asarray(r_op)[both_visible] <= np.asarray(r_plain)[both_visible]).all()
    # opacity below 1/255 must be culled
    low_op = np.zeros_like(opacities)
    r_lo, *_ = fully_fused_projection(
        jnp.asarray(means), None, jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
        opacities=jnp.asarray(low_op),
    )
    assert (np.asarray(r_lo) == 0).all()


def test_behind_camera_culled(small_scene):
    means, quats, scales, _, viewmats, Ks, width, height = small_scene
    means_behind = means.copy()
    means_behind[:, 2] = -5.0
    radii, *_ = fully_fused_projection(
        jnp.asarray(means_behind), None, jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats[:1]), jnp.asarray(Ks[:1]), width, height,
    )
    assert (np.asarray(radii) == 0).all()


def test_compensations_range(small_scene):
    means, quats, scales, _, viewmats, Ks, width, height = small_scene
    *_, comp = fully_fused_projection(
        jnp.asarray(means), None, jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
        calc_compensations=True,
    )
    c = np.asarray(comp)
    assert (c >= 0.005 - 1e-6).all() and (c <= 1.0 + 1e-5).all()


def test_proj_standalone_matches_oracle(small_scene):
    means, quats, scales, _, viewmats, Ks, width, height = small_scene
    # camera-frame inputs
    R_q = np.asarray(quat_to_rotmat(jnp.asarray(quats)))
    covars = np.einsum("nij,nj,nkj->nik", R_q, scales**2, R_q)
    R = viewmats[0, :3, :3]
    t = viewmats[0, :3, 3]
    means_c = means @ R.T + t
    covars_c = np.einsum("ij,njk,lk->nil", R, covars, R)
    m2, c2 = proj(
        jnp.asarray(means_c)[None], jnp.asarray(covars_c)[None],
        jnp.asarray(Ks[:1]), width, height,
    )
    _, _, _, c2_ref = _np_oracle_project(
        means, quats, scales, viewmats[:1], Ks[:1], width, height
    )
    np.testing.assert_allclose(np.asarray(c2)[0], c2_ref[0], rtol=2e-3, atol=1e-4)


def test_projection_grads_finite(small_scene):
    means, quats, scales, opacities, viewmats, Ks, width, height = small_scene

    def f(means, quats, scales):
        radii, means2d, depths, conics, _ = fully_fused_projection(
            means, None, quats, scales,
            jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
        )
        w = (radii > 0).all(axis=-1)
        return jnp.sum(jnp.where(w[..., None], means2d, 0.0)) + jnp.sum(
            jnp.where(w[..., None], conics, 0.0)
        )

    g = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales)
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


def test_packed_projection_matches_dense():
    """Packed outputs = dense outputs at the visible (camera, gaussian)
    entries, camera-major order (parity: ProjectionEWA3DGSPacked.cu)."""
    import numpy as np
    from gsplat_tpu.ops.projection import fully_fused_projection
    from gsplat_tpu.ops.projection_packed import fully_fused_projection_packed

    rng = np.random.default_rng(21)
    N, C = 200, 3
    means = jnp.asarray(
        np.c_[rng.uniform(-2, 2, (N, 2)), rng.uniform(1, 8, N)].astype(np.float32)
    )
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.01, 0.1, (N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 1, N).astype(np.float32))
    vm = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (C, 1, 1)))
    Ks = jnp.asarray(
        np.tile(np.array([[60, 0, 48], [0, 60, 32], [0, 0, 1]], np.float32), (C, 1, 1))
    )
    W, H = 96, 64

    radii, m2, dep, con, _ = fully_fused_projection(
        means, None, quats, scales, vm, Ks, W, H, opacities=opac
    )
    packed = fully_fused_projection_packed(
        means, None, quats, scales, vm, Ks, W, H, capacity=1024, opacities=opac
    )
    valid = np.asarray((radii > 0).all(-1))
    nnz = int(packed["nnz"])
    assert nnz == valid.sum() and nnz > 50
    assert not bool(packed["overflow"])
    sel = np.asarray(packed["valid"])
    cam = np.asarray(packed["camera_ids"])[sel]
    gs = np.asarray(packed["gaussian_ids"])[sel]
    # camera-major ordering
    assert (np.diff(cam) >= 0).all()
    np.testing.assert_allclose(
        np.asarray(packed["means2d"])[sel], np.asarray(m2)[cam, gs], atol=0
    )
    np.testing.assert_allclose(
        np.asarray(packed["depths"])[sel], np.asarray(dep)[cam, gs], atol=0
    )
    # indptr rows = per-camera counts
    counts = valid.sum(1)
    np.testing.assert_array_equal(
        np.diff(np.asarray(packed["indptr"])), counts
    )
    # overflow flag trips on small capacity
    small = fully_fused_projection_packed(
        means, None, quats, scales, vm, Ks, W, H, capacity=8, opacities=opac
    )
    assert bool(small["overflow"])
