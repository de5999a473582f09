"""Capture/replay profiler harness."""

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.profile import ProfileWorkload, capture_inputs, load_inputs


def test_capture_and_replay(tmp_path, monkeypatch):
    monkeypatch.setenv("CAPT", str(tmp_path))

    @capture_inputs("CAPT")
    def op(x, y, scale=2.0):
        return x * y * scale

    a = jnp.arange(6.0).reshape(2, 3)
    b = jnp.ones((2, 3))
    out1 = op(a, b, scale=3.0)

    args, kwargs = load_inputs(str(tmp_path / "op.capture"))
    np.testing.assert_array_equal(np.asarray(args[0]), np.asarray(a))
    assert kwargs["scale"] == 3.0

    wl = ProfileWorkload(
        fn=lambda x, y, scale=2.0: x * y * scale,
        capture_path=str(tmp_path / "op.capture"),
        warmup=1, repeats=2,
    )
    stats = wl.run()
    assert stats["time_s"] > 0

    # override
    wl2 = ProfileWorkload(
        fn=lambda x, y, scale=2.0: x * y * scale,
        capture_path=str(tmp_path / "op.capture"),
        overrides={"scale": 10.0}, warmup=1, repeats=1,
    )
    args2, kwargs2 = wl2.load()
    assert kwargs2["scale"] == 10.0

    # gradient replay
    stats_g = wl.run(grad_argnums=(0,))
    assert stats_g["time_s"] > 0
