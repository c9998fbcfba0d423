"""Trainer wiring of the calibrated int8 serving engine (``b_use_int8``).

The compiled engines don't run on the CPU test backend, so these tests
spy on the build functions and verify the lazy-calibration plumbing:
first test volume calibrates, unchainable shapes fall back to bf16.
"""

import jax.numpy as jnp
import numpy as np

from ctunet_tpu import trainer


def _bare_model(**params):
    m = trainer.Model.__new__(trainer.Model)
    m.params = {
        "model_class": "UNetSP", "use_engine": True, "use_int8": True,
        **params,
    }
    m.devices = []
    return m


def test_int8_predict_lazy_calibration(monkeypatch):
    from ctunet_tpu import engine_q

    m = _bare_model()
    m._maybe_engine = lambda variables, compute_dtype: (
        lambda x: ("bf16", x.shape)
    )
    calls = {"n": 0}

    def fake_build_q(mc, variables, calib, compute_dtype=None,
                     calib_quantile=1.0, **kw):
        calls["n"] += 1
        calls["calib_shape"] = tuple(calib.shape)
        # must be jax-traceable: the trainer now force-traces the built
        # fn (jax.eval_shape) inside its fallback guard
        return lambda x: (jnp.asarray(8), tuple(x.shape))

    monkeypatch.setattr(engine_q, "build_predict_q", fake_build_q)
    predict = m._make_whole_volume_predict(
        None, {"params": {}}, jnp.float32, atlas=np.ones((8, 8, 8))
    )
    out = predict(None, jnp.zeros((1, 8, 8, 8)))
    assert int(out[0]) == 8
    # calibrated on the first volume: (D, H, W, image+atlas)
    assert calls["calib_shape"] == (8, 8, 8, 2)
    out2 = predict(None, jnp.zeros((1, 8, 8, 8)))
    assert int(out2[0]) == 8 and calls["n"] == 1  # built once, reused


def test_int8_predict_falls_back_on_unchainable(monkeypatch, capsys):
    from ctunet_tpu import engine_q

    m = _bare_model()
    m._maybe_engine = lambda variables, compute_dtype: (
        lambda x: ("bf16", tuple(x.shape))
    )

    def fake_build_q(mc, variables, calib, compute_dtype=None,
                     calib_quantile=1.0, **kw):
        raise ValueError("needs chainable pooling")

    monkeypatch.setattr(engine_q, "build_predict_q", fake_build_q)
    predict = m._make_whole_volume_predict(
        None, {"params": {}}, jnp.float32, atlas=None
    )
    out = predict(None, jnp.zeros((1, 8, 8, 8)))
    assert out[0] == "bf16"  # served by the bf16 engine
    assert "int8 engine unavailable" in capsys.readouterr().out
    # a second call doesn't retry the build
    out2 = predict(None, jnp.zeros((1, 8, 8, 8)))
    assert out2[0] == "bf16"


def test_adaquant_falls_back_to_plain_int8(monkeypatch, capsys):
    """When the AdaQuant build fails (e.g. the rounding simulator does
    not support the model family), serving falls back to the PLAIN int8
    engine — not all the way to bf16."""
    from ctunet_tpu import engine_q

    m = _bare_model(int8_adaquant=True)
    m._maybe_engine = lambda variables, compute_dtype: (
        lambda x: ("bf16", tuple(x.shape))
    )

    def fake_build_q_opt(mc, variables, calib, **kw):
        raise ValueError("quant_opt: unsupported model")

    def fake_build_q(mc, variables, calib, compute_dtype=None,
                     calib_quantile=1.0, **kw):
        return lambda x: (jnp.asarray(8), tuple(x.shape))

    monkeypatch.setattr(engine_q, "build_predict_q_opt", fake_build_q_opt)
    monkeypatch.setattr(engine_q, "build_predict_q", fake_build_q)
    predict = m._make_whole_volume_predict(
        None, {"params": {}}, jnp.float32, atlas=None
    )
    out = predict(None, jnp.zeros((1, 8, 8, 8)))
    assert int(out[0]) == 8  # plain int8, not bf16
    cap = capsys.readouterr().out
    assert "int8+adaquant engine unavailable" in cap
    assert "calibrated int8 engine" in cap


def test_int8_builds_per_shape(monkeypatch):
    """A mixed-size test set gets one quantized build per input shape
    (the plan is shape-specific) instead of a retrace crash."""
    from ctunet_tpu import engine_q

    m = _bare_model()
    m._maybe_engine = lambda variables, compute_dtype: (
        lambda x: ("bf16", tuple(x.shape))
    )
    calib_shapes = []

    def fake_build_q(mc, variables, calib, compute_dtype=None,
                     calib_quantile=1.0, **kw):
        calib_shapes.append(tuple(calib.shape))
        return lambda x: (jnp.asarray(8), tuple(x.shape))

    monkeypatch.setattr(engine_q, "build_predict_q", fake_build_q)
    predict = m._make_whole_volume_predict(
        None, {"params": {}}, jnp.float32, atlas=None
    )
    assert int(predict(None, jnp.zeros((1, 8, 8, 8)))[0]) == 8
    assert int(predict(None, jnp.zeros((1, 8, 8, 16)))[0]) == 8
    assert int(predict(None, jnp.zeros((1, 8, 8, 8)))[0]) == 8
    assert calib_shapes == [(8, 8, 8, 1), (8, 8, 16, 1)]  # one per shape


def test_int8_patch_predict_calibrates_central_patch(monkeypatch):
    """Patch serving: the quantized per-patch engine calibrates on the
    central patch of the first padded volume (image + atlas channels)."""
    from ctunet_tpu import engine_q
    from ctunet_tpu.ops import sliding_window

    m = _bare_model(patch_size=8, patch_overlap=0.5)
    m._maybe_engine = lambda variables, compute_dtype: (
        lambda x: ("bf16", tuple(x.shape))
    )
    calls = {}

    def fake_build_q(mc, variables, calib, compute_dtype=None,
                     calib_quantile=1.0, **kw):
        calls["calib_shape"] = tuple(calib.shape)
        return lambda x: (jnp.asarray(8), tuple(x.shape))

    monkeypatch.setattr(engine_q, "build_predict_q", fake_build_q)

    built = {}

    def fake_make_sw(model, apply_fn=None, **kw):
        built["apply_fn"] = apply_fn
        return lambda vs, padded: ("sw", apply_fn(None, padded))

    monkeypatch.setattr(
        sliding_window, "make_sliding_window_fn", fake_make_sw
    )
    predict = m._make_patch_predict(
        None, {"params": {}}, jnp.float32, atlas_p=np.ones((16, 16, 16))
    )
    out = predict(None, jnp.zeros((1, 16, 16, 16)))
    assert calls["calib_shape"] == (8, 8, 8, 2)
    assert int(out[1][0]) == 8  # the built apply_fn serves int8


def test_int8_patch_predict_fallback(monkeypatch, capsys):
    from ctunet_tpu import engine_q
    from ctunet_tpu.ops import sliding_window

    m = _bare_model(patch_size=8)
    m._maybe_engine = lambda variables, compute_dtype: (
        lambda x: ("bf16", tuple(x.shape))
    )
    monkeypatch.setattr(
        engine_q, "build_predict_q",
        lambda *a, **k: (_ for _ in ()).throw(ValueError("nope")),
    )
    monkeypatch.setattr(
        sliding_window, "make_sliding_window_fn",
        lambda model, apply_fn=None, **kw: (
            lambda vs, padded: apply_fn(None, padded)
        ),
    )
    predict = m._make_patch_predict(None, {"params": {}}, jnp.float32)
    out = predict(None, jnp.zeros((1, 16, 16, 16)))
    assert out[0] == "bf16"
    assert "int8 engine unavailable" in capsys.readouterr().out


def test_int8_off_by_default():
    from ctunet_tpu.utils.config import default_params

    assert default_params()["use_int8"] is False
    m = _bare_model(use_int8=False)
    m._maybe_engine = lambda variables, compute_dtype: (
        lambda x: ("bf16", tuple(x.shape))
    )
    predict = m._make_whole_volume_predict(
        None, {"params": {}}, jnp.float32, atlas=None
    )
    assert predict(None, jnp.zeros((1, 8, 8, 8)))[0] == "bf16"


def test_int8_falls_back_on_trace_time_failure(monkeypatch, capsys):
    """build_predict_q succeeding but the returned fn failing at TRACE
    time (VMEM tile-fit ValueError, Pallas shape assert) must also fall
    back to bf16 — the trainer force-traces inside its guard (ADVICE r1)."""
    from ctunet_tpu import engine_q

    m = _bare_model()
    m._maybe_engine = lambda variables, compute_dtype: (
        lambda x: ("bf16", tuple(x.shape))
    )

    def fake_build_q(mc, variables, calib, compute_dtype=None,
                     calib_quantile=1.0, **kw):
        def fn(x):
            raise AssertionError("chain plan shape assert fires on trace")
        return fn

    monkeypatch.setattr(engine_q, "build_predict_q", fake_build_q)
    predict = m._make_whole_volume_predict(
        None, {"params": {}}, jnp.float32, atlas=None
    )
    out = predict(None, jnp.zeros((1, 8, 8, 8)))
    assert out[0] == "bf16"  # fell back instead of crashing serving
    assert "int8 engine unavailable" in capsys.readouterr().out
    # the failed build is cached: no rebuild on the second volume
    out2 = predict(None, jnp.zeros((1, 8, 8, 8)))
    assert out2[0] == "bf16"
