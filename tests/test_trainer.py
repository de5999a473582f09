"""Trainer smoke tests on a tiny synthetic scene (CPU-runnable).

Mirrors the reference's monkeypatched trainer tests (tests/conftest.py
av_train_env fixture): the training loop runs end-to-end on fake data with
no real dataset, exercising render -> loss -> grads -> adam -> strategy.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))


@pytest.fixture(scope="module")
def tiny_npz(tmp_path_factory):
    rng = np.random.default_rng(0)
    n = 200
    # inside load_test_data's crop AABB [-2, 2]^3; cameras pushed back so
    # depths are positive
    means = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    colors = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    viewmats[:, :3, 3] = rng.uniform(-0.2, 0.2, (3, 3)).astype(np.float32)
    viewmats[:, 2, 3] += 4.0
    Ks = np.tile(
        np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32),
        (3, 1, 1),
    )
    path = tmp_path_factory.mktemp("data") / "tiny.npz"
    np.savez(
        path, means3d=means, colors=colors, viewmats=viewmats, Ks=Ks,
        width=np.int64(64), height=np.int64(48),
    )
    return str(path)


@pytest.mark.parametrize("strategy", ["mcmc", "default"])
def test_trainer_smoke(tiny_npz, tmp_path, strategy, monkeypatch):
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    from simple_trainer import Config, Runner

    cfg = Config(
        strategy=strategy,
        data="npz",
        result_dir=str(tmp_path / "out"),
        max_steps=6,
        batch_size=1,
        sh_degree=1,
        sh_degree_interval=2,
        isect_capacity=1 << 14,
        cap_max=512,
        capacity=512,
        refine_every=3,
        eval_every=6,
        save_every=6,
    )
    # make refine hit within the short run
    runner = Runner(cfg)
    if strategy == "mcmc":
        runner.strategy = runner.strategy.__class__(
            cap_max=512, refine_every=3, refine_start_iter=1
        )
    else:
        runner.strategy = runner.strategy.__class__(
            refine_every=3, refine_start_iter=1
        )
    params, alive = runner.train()
    assert int(np.asarray(alive).sum()) >= 200
    assert np.isfinite(np.asarray(params["means"])).all()
    # eval stats + checkpoint written
    assert (tmp_path / "out" / "stats.jsonl").exists()
    assert any(
        p.name.startswith("ckpt_") for p in (tmp_path / "out").iterdir()
    )


def test_trainer_2dgs_smoke(tiny_npz, tmp_path, monkeypatch):
    # unmarked: this is the ONLY coverage of the surfel trainer's runner
    # wiring (its dispatch signature must track the base train loop)
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    from simple_trainer_2dgs import Config as Config2D
    from simple_trainer_2dgs import Runner2DGS

    cfg = Config2D(
        strategy="default",
        data="npz",
        result_dir=str(tmp_path / "out2d"),
        max_steps=4,
        batch_size=1,
        sh_degree=1,
        sh_degree_interval=2,
        isect_capacity=1 << 14,
        capacity=512,
        refine_every=3,
        eval_every=4,
        save_every=4,
        normal_start_iter=2,
        dist_start_iter=2,
    )
    runner = Runner2DGS(cfg)
    runner.strategy = runner.strategy.__class__(
        refine_every=3, refine_start_iter=1
    )
    params, alive = runner.train()
    assert int(np.asarray(alive).sum()) >= 150
    assert np.isfinite(np.asarray(params["means"])[np.asarray(alive)]).all()


def test_av_trainer_smoke():
    """Multi-camera + lidar joint training drops the loss (the analog of
    the reference's av_trainer smoke tests with fake scenes)."""
    import runpy
    import sys

    argv = sys.argv
    sys.argv = ["av_trainer.py", "--max-steps", "10"]
    try:
        import os
        examples = os.path.join(os.path.dirname(__file__), "..", "examples")
        sys.path.insert(0, examples)
        runpy.run_path(
            os.path.join(examples, "av_trainer.py"), run_name="__main__"
        )
    finally:
        sys.argv = argv


def test_dynamic_surgical_trainer_smoke():
    """HexPlane+DeformNet dynamic trainer runs and reduces loss."""
    import os
    import runpy
    import sys

    argv = sys.argv
    sys.argv = ["dynamic_surgical_trainer.py", "--max-steps", "30"]
    try:
        examples = os.path.join(os.path.dirname(__file__), "..", "examples")
        runpy.run_path(
            os.path.join(examples, "dynamic_surgical_trainer.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = argv


def test_trainer_ckpt_resume(tiny_npz, tmp_path, monkeypatch):
    """--ckpt round-trip: resume restores params, optimizer and step.

    Parity: reference Config.ckpt (simple_trainer.py:82) + ckpt dict
    (:1040-1072), extended with optimizer/strategy state.
    """
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    from simple_trainer import Config, Runner

    base = dict(
        strategy="mcmc", data="npz", max_steps=4, batch_size=1,
        sh_degree=1, sh_degree_interval=2, isect_capacity=1 << 14,
        cap_max=512, capacity=512, refine_every=100,
        eval_every=100, save_every=4,
    )
    cfg = Config(result_dir=str(tmp_path / "a"), **base)
    r1 = Runner(cfg)
    r1.train()
    ckpt = str(tmp_path / "a" / "ckpt_3.npz")
    assert os.path.exists(ckpt)

    cfg2 = Config(result_dir=str(tmp_path / "b"), ckpt=ckpt, **base)
    r2 = Runner(cfg2)
    assert r2.start_step == 4
    np.testing.assert_array_equal(
        np.asarray(r2.params["means"]), np.asarray(r1.params["means"])
    )
    np.testing.assert_array_equal(
        np.asarray(r2.opt_state.mu["means"]),
        np.asarray(r1.opt_state.mu["means"]),
    )
    assert int(r2.opt_state.count) == int(r1.opt_state.count)
    # resumed training continues from start_step without error
    cfg2b = Config(result_dir=str(tmp_path / "b"), ckpt=ckpt,
                   **{**base, "max_steps": 6})
    r3 = Runner(cfg2b)
    params, alive = r3.train()
    assert np.isfinite(np.asarray(params["means"])).all()


def test_trainer_pose_opt_recovers(tiny_npz, tmp_path, monkeypatch):
    """Pose optimization reduces the injected pose error.

    Parity: reference pose_opt + pose_noise ablation
    (simple_trainer.py:213-217, 527-535).
    """
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    import jax.numpy as jnp
    from simple_trainer import Config, Runner, _invert_se3
    from gsplat_tpu.training import apply_pose_deltas

    cfg = Config(
        strategy="mcmc", data="npz", result_dir=str(tmp_path / "out"),
        max_steps=40, batch_size=1, sh_degree=0, sh_degree_interval=1000,
        isect_capacity=1 << 14, cap_max=256, capacity=256,
        refine_every=1000, eval_every=1000, save_every=1000,
        pose_opt=True, pose_opt_lr=5e-4, pose_opt_reg=0.0, pose_noise=5e-3,
        means_lr=0.0, scales_lr=0.0, opacities_lr=0.0, quats_lr=0.0,
        sh0_lr=0.0, shN_lr=0.0,  # only the poses move
    )
    runner = Runner(cfg)
    perturb = runner.pose_perturb

    # targets = renders of the trainer's own (frozen) splats at the CLEAN
    # poses, so the loss optimum is exactly the perturbation inverse
    clean_vm = jnp.asarray(runner.viewmats[runner.train_views])
    ks = jnp.asarray(runner.Ks[runner.train_views])
    tgt, _, _ = runner.render(runner.params, runner.alive, clean_vm, ks, 0)
    tgt = jnp.clip(tgt, 0.0, 1.0)
    runner._make_npz_targets = lambda: tgt

    def pose_error(deltas):
        # perturbed-then-corrected c2w vs the clean c2w
        c2w = _invert_se3(jnp.asarray(runner.viewmats[runner.train_views]))
        c2w_p = apply_pose_deltas(c2w, perturb)
        c2w_c = apply_pose_deltas(c2w_p, deltas)
        return float(jnp.abs(c2w_c - c2w).max())

    err0 = pose_error(runner.pose_deltas)
    runner.train()
    err1 = pose_error(runner.pose_deltas)
    assert err1 < err0 * 0.9, (err0, err1)


def test_trainer_bilateral_grid_corrects_tint(tiny_npz, tmp_path, monkeypatch):
    """Bilateral-grid color correction learns a per-view tint.

    Parity: reference post_processing="bilateral_grid"
    (simple_trainer.py:231-235, 571-577, 766-776 + lib_bilagrid.py).
    Splats are frozen; targets are the trainer's own renders with a
    per-view channel tint applied, so only the grids can close the gap.
    """
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    import jax.numpy as jnp
    import numpy as np
    from simple_trainer import Config, Runner
    from gsplat_tpu.training import bilateral_slice_image

    cfg = Config(
        strategy="mcmc", data="npz", result_dir=str(tmp_path / "out"),
        max_steps=30, batch_size=1, sh_degree=0, sh_degree_interval=1000,
        isect_capacity=1 << 14, cap_max=256, capacity=256,
        refine_every=1000, eval_every=1000, save_every=1000,
        bilateral_grid=True, bilateral_grid_shape="4,4,2", tv_reg=0.1,
        means_lr=0.0, scales_lr=0.0, opacities_lr=0.0, quats_lr=0.0,
        sh0_lr=0.0, shN_lr=0.0,  # only the grids move
    )
    runner = Runner(cfg)
    assert runner.bil_grids is not None
    grids0 = np.asarray(runner.bil_grids).copy()

    vm = jnp.asarray(runner.viewmats[runner.train_views])
    ks = jnp.asarray(runner.Ks[runner.train_views])
    base, _, _ = runner.render(runner.params, runner.alive, vm, ks, 0)
    base = jnp.clip(base, 0.0, 1.0)
    tint = jnp.asarray([[0.7, 1.0, 1.2], [1.2, 0.8, 1.0]])[: base.shape[0]]
    tgt = jnp.clip(base * tint[:, None, None, :], 0.0, 1.0)
    runner._make_npz_targets = lambda: tgt

    def err(grids):
        out = jax.vmap(lambda g, im: bilateral_slice_image(g, im)[0])(
            grids, base
        )
        return float(jnp.mean((jnp.clip(out, 0.0, 1.0) - tgt) ** 2))

    import jax

    e0 = err(jnp.asarray(grids0))
    runner.train()
    e1 = err(runner.bil_grids)
    assert e1 < e0 * 0.7, (e0, e1)
    assert not np.allclose(np.asarray(runner.bil_grids), grids0)


def test_trainer_render_traj(tiny_npz, tmp_path, monkeypatch):
    """Fly-through rendering writes frames (reference render_traj :1303)."""
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    from simple_trainer import Config, Runner

    cfg = Config(
        strategy="mcmc", data="npz", result_dir=str(tmp_path / "out"),
        max_steps=2, batch_size=1, sh_degree=0, sh_degree_interval=1000,
        isect_capacity=1 << 14, cap_max=256, capacity=256,
        refine_every=1000, eval_every=1000, save_every=1000,
        render_traj=True, render_traj_path="ellipse", traj_frames=4,
    )
    runner = Runner(cfg)
    runner.train()
    outdir = tmp_path / "out" / "traj"
    pngs = sorted(outdir.glob("*.png"))
    assert len(pngs) == 4
    import imageio

    img = imageio.imread(pngs[0])
    assert img.shape == (48, 64, 3)


@pytest.mark.slow
def test_trainer_with_live_viewer(tiny_npz, tmp_path, monkeypatch):
    """Training with the live viewer enabled: frames render mid-training
    through the HTTP endpoint (reference: nerfview training mode)."""
    import json
    import threading
    import urllib.request

    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    from simple_trainer import Config, Runner

    cfg = Config(
        strategy="mcmc",
        data="npz",
        result_dir=str(tmp_path / "outv"),
        max_steps=4,
        batch_size=1,
        sh_degree=0,
        isect_capacity=1 << 14,
        cap_max=512,
        capacity=512,
        refine_every=100,
        eval_every=4,
        save_every=4,
        disable_viewer=False,
        viewer_port=0,  # ephemeral
    )
    runner = Runner(cfg)
    params, alive = runner.train()
    # after train(), the viewer is in rendering mode and still serving
    v = runner.viewer
    assert v is not None and v.mode == "rendering"
    c2w = np.eye(4)
    c2w[2, 3] = -4.0
    req = urllib.request.Request(
        f"http://127.0.0.1:{v.port}/render",
        data=json.dumps(
            {"c2w": c2w.ravel().tolist(), "width": 64, "height": 48}
        ).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        data = r.read()
    assert data[:2] == b"\xff\xd8"
    with urllib.request.urlopen(
        f"http://127.0.0.1:{v.port}/info", timeout=10
    ) as r:
        info = json.loads(r.read())
    assert info["total_gs_count"] == 512
    v.close()


def test_trainer_app_opt_ply_compression(tiny_npz, tmp_path, monkeypatch):
    """Appearance optimization + PLY save + compression step, end-to-end.

    Parity: reference simple_trainer.py app_opt (:222-228, :755-765),
    save_ply (:1073-1105) and run_compression (:1412-1436).
    """
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    from simple_trainer import Config, Runner

    cfg = Config(
        strategy="default",
        data="npz",
        result_dir=str(tmp_path / "out"),
        max_steps=4,
        batch_size=1,
        sh_degree=1,
        sh_degree_interval=2,
        isect_capacity=1 << 14,
        capacity=512,
        refine_every=100,
        eval_every=4,
        save_every=4,
        app_opt=True,
        save_ply=True,
        compression="png",
    )
    runner = Runner(cfg)
    assert "features" in runner.params
    params, alive = runner.train()
    assert np.isfinite(np.asarray(params["means"])).all()
    # appearance params actually trained (embeds move off zero-init)
    emb = np.asarray(runner.app_params["embeds"])
    assert np.abs(emb).max() > 0
    ply_dir = tmp_path / "out" / "ply"
    plys = list(ply_dir.iterdir())
    assert plys, "save_ply wrote no PLY file"
    from gsplat_tpu.exporter import load_ply_to_splats

    loaded = load_ply_to_splats(str(plys[0]))
    assert loaded["means"].shape[0] == int(np.asarray(alive).sum())
    cdir = tmp_path / "out" / "compression"
    assert (cdir / "meta.json").exists()
    from gsplat_tpu.compression import PngCompression

    rec = PngCompression().decompress(str(cdir))
    assert np.isfinite(rec["means"]).all()


def test_trainer_npz_traj_views(tiny_npz, tmp_path, monkeypatch):
    """Multi-view trajectory benchmark: cameras densified along an
    interpolated path, targets rendered per-view, held-out split evaled."""
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    from simple_trainer import Config, Runner

    cfg = Config(
        strategy="default",
        data="npz",
        result_dir=str(tmp_path / "out"),
        max_steps=3,
        batch_size=2,
        sh_degree=0,
        isect_capacity=1 << 14,
        capacity=512,
        refine_every=100,
        eval_every=3,
        save_every=3,
        npz_traj_views=12,
        npz_eval_every=4,
    )
    runner = Runner(cfg)
    assert len(runner.train_views) + len(runner.eval_views) == 12
    assert len(runner.eval_views) == 3
    params, alive = runner.train()
    assert np.isfinite(np.asarray(params["means"])).all()
    import json

    stats = [
        json.loads(line)
        for line in open(tmp_path / "out" / "stats.jsonl")
    ]
    assert any(s["tag"] == "heldout" for s in stats)


def test_trainer_ppisp_learns_exposure(tiny_npz, tmp_path, monkeypatch):
    """Learned per-camera ISP absorbs a global exposure shift.

    Parity: reference post_processing="ppisp" (simple_trainer.py:231-241,
    578-590) — splats frozen, targets are the trainer's own renders at
    half exposure, so only the ISP parameters can close the gap.
    """
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simple_trainer import Config, Runner
    from gsplat_tpu.training import apply_ppisp

    cfg = Config(
        strategy="mcmc", data="npz", result_dir=str(tmp_path / "out"),
        max_steps=40, batch_size=1, sh_degree=0, sh_degree_interval=1000,
        isect_capacity=1 << 14, cap_max=256, capacity=256,
        refine_every=1000, eval_every=1000, save_every=1000,
        ppisp=True, ppisp_lr=5e-2, ppisp_reg=1e-4,
        means_lr=0.0, scales_lr=0.0, opacities_lr=0.0, quats_lr=0.0,
        sh0_lr=0.0, shN_lr=0.0,  # only the ISP moves
    )
    runner = Runner(cfg)
    assert runner.ppisp_params is not None

    vm = jnp.asarray(runner.viewmats[runner.train_views])
    ks = jnp.asarray(runner.Ks[runner.train_views])
    base, _, _ = runner.render(runner.params, runner.alive, vm, ks, 0)
    tgt = jnp.clip(base, 0.0, 1.0) * 0.5  # uniformly darker captures
    runner._make_npz_targets = lambda: tgt

    def err(pp):
        n = base.shape[0]
        out = apply_ppisp(
            pp, jnp.clip(base, 0, 1),
            jnp.zeros(n, jnp.int32), jnp.arange(n, dtype=jnp.int32),
        )
        return float(jnp.mean((jnp.clip(out, 0, 1) - tgt) ** 2))

    e0 = err(runner.ppisp_params)
    runner.train()
    e1 = err(runner.ppisp_params)
    assert e1 < e0 * 0.5, (e0, e1)
    # exposures moved toward log(0.5)
    assert float(jnp.mean(runner.ppisp_params["exposure"])) < -0.1
    # checkpoint round-trips the ISP + its moments
    ck = [f for f in (tmp_path / "out").iterdir() if "ckpt" in f.name]
    assert ck
    r2 = Runner(cfg)
    r2._load(str(ck[0]))
    np.testing.assert_allclose(
        np.asarray(r2.ppisp_params["exposure"]),
        np.asarray(runner.ppisp_params["exposure"]), atol=1e-6,
    )


def test_sample_inference_loads_and_renders(tiny_npz, tmp_path, monkeypatch):
    """sample_inference: trainer ckpt -> Stage -> orbit renders
    (reference examples/sample_inference.py:319)."""
    monkeypatch.setenv("GSPLAT_TPU_TEST_DATA", tiny_npz)
    import sys

    from simple_trainer import Config, Runner

    cfg = Config(
        strategy="mcmc", data="npz", result_dir=str(tmp_path / "out"),
        max_steps=2, batch_size=1, sh_degree=0, sh_degree_interval=1000,
        isect_capacity=1 << 14, cap_max=256, capacity=256,
        refine_every=1000, eval_every=1000, save_every=1000,
    )
    Runner(cfg).train()
    ck = next(f for f in (tmp_path / "out").iterdir() if "ckpt" in f.name)

    import sample_inference as si

    scene = si.load_checkpoint(str(ck))
    assert scene.num_gaussians > 0
    out = tmp_path / "views"
    argv = sys.argv
    sys.argv = [
        "x", "--ckpt", str(ck), "--output-dir", str(out),
        "--n-views", "2", "--width", "64", "--height", "48",
        "--isect-capacity", str(1 << 14),
    ]
    try:
        si.main()
    finally:
        sys.argv = argv
    views = sorted(out.glob("view_*.png"))
    assert len(views) == 2
