"""QAT fake-quant forward: fidelity to the int8 engine + trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from ctunet_tpu.models import build_model
from ctunet_tpu.ops.qat import QATModel, calibrate_unit_scales
import pytest

# heavyweight (CPU-interpret / e2e): full-suite lane only
pytestmark = pytest.mark.slow


def _setup(rng, shape=(16, 16, 32)):
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    stats = jax.tree.map(
        lambda s: s * (1.0 + 0.1 * jax.random.uniform(
            jax.random.key(1), s.shape
        )) + 0.01,
        vs["batch_stats"],
    )
    vs = {"params": vs["params"], "batch_stats": stats}
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))
    return m, vs, x


def test_qat_forward_tracks_int8_engine(rng):
    """The fake-quantized float forward simulates the engine's int8
    arithmetic: its outputs sit close to the real int8 engine's (same
    rounding points), much closer than the float forward does when
    quantization error is material."""
    from ctunet_tpu import engine_q

    m, vs, x = _setup(rng)
    scales = calibrate_unit_scales(
        "UNetSP", vs, np.asarray(x), dtype=jnp.float32
    )
    qat = QATModel("UNetSP", scales=scales, dtype=jnp.float32)
    sim = qat.apply(vs, x)

    q = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True
    )(x)
    for a, b in zip(jax.tree.leaves(sim), jax.tree.leaves(q)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.abs(a - b).mean() < 5e-3, np.abs(a - b).mean()
        assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.99


def test_qat_gradients_flow(rng):
    """STE: the fq points are gradient-transparent — every parameter the
    STANDARD forward gives a nonzero gradient (dead ReLU channels under
    random init legitimately zero some) also gets one under QAT."""
    m, vs, x = _setup(rng)
    scales = calibrate_unit_scales(
        "UNetSP", vs, np.asarray(x), dtype=jnp.float32
    )
    qat = QATModel("UNetSP", scales=scales, dtype=jnp.float32)

    def loss_qat(params):
        out = qat.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, x
        )
        return sum(jnp.sum(jnp.square(o)) for o in jax.tree.leaves(out))

    def loss_std(params):
        out = m.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, x, False
        )
        return sum(jnp.sum(jnp.square(o)) for o in jax.tree.leaves(out))

    gq = jax.tree_util.tree_flatten_with_path(
        jax.grad(loss_qat)(vs["params"])
    )[0]
    gs = jax.tree_util.tree_flatten_with_path(
        jax.grad(loss_std)(vs["params"])
    )[0]
    n_live = 0
    for (p1, a), (p2, b) in zip(gq, gs):
        assert p1 == p2
        if float(jnp.max(jnp.abs(b))) > 1e-9:
            assert float(jnp.max(jnp.abs(a))) > 0, f"{p1} dead under QAT"
            n_live += 1
    assert n_live > 30  # most of the tree is live


def test_fq_act_clipped_ste_saturation():
    """Gradient passes inside the representable range and is ZERO where
    the activation saturates the [0, 127*s] clamp — a full STE there
    lets fine-tuning drift activations past the pinned scales unseen
    (measured plain-forward collapse; see _fq_act docstring)."""
    from ctunet_tpu.ops.qat import _fq_act

    s = jnp.asarray([0.1], jnp.float32)
    y = jnp.asarray([[5.0], [25.5], [30.0]], jnp.float32)
    g = jax.grad(lambda v: jnp.sum(_fq_act(v, s)))(y)
    np.testing.assert_allclose(np.asarray(g)[:, 0], [1.0, 1.0, 0.0])
    # forward values unchanged by the clipping choice
    out = np.asarray(_fq_act(y, s))[:, 0]
    np.testing.assert_allclose(out, [5.0, 25.5, 25.5], atol=1e-5)


def test_qat_capture_names_every_unit():
    scales_keys = {
        f"{t}{i}.{j}" for t in "du" for i in range(4) for j in range(2)
    }
    m, vs, x = _setup(np.random.default_rng(0))
    got = set(calibrate_unit_scales(
        "UNetSP", vs, np.asarray(x), dtype=jnp.float32
    ).keys())
    assert got == scales_keys
