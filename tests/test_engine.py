"""Inference-engine equivalence: fused Pallas forward == flax model.apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu import engine
from ctunet_tpu.models import build_model

# heavyweight (CPU-interpret / e2e): full-suite lane only
pytestmark = pytest.mark.slow


def _variables(name, shape, in_ch, seed=0):
    m = build_model(name, compute_dtype="float32", use_checkpoint=False)
    x = jnp.zeros((1, *shape, in_ch), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(seed), x, False)
    # Nontrivial BN stats so folding is actually exercised — but keep the
    # shift SMALL and positive-variance-only: a large positive running-mean
    # perturbation used to zero every ReLU, making the decoder comparison
    # vacuous (it masked a real transposed-conv bug).
    stats = jax.tree.map(
        lambda s: s * (1.0 + 0.1 * jax.random.uniform(
            jax.random.key(1), s.shape
        )) + 0.01,
        vs["batch_stats"],
    )
    return m, {"params": vs["params"], "batch_stats": stats}


def _assert_nontrivial(outs):
    """Guard against vacuous comparisons: outputs must actually vary."""
    for o in jax.tree.leaves(outs):
        o = np.asarray(o, np.float32)
        assert float(o.std()) > 1e-3, "degenerate (constant) output"


@pytest.mark.parametrize("name,in_ch", [("UNetSP", 2), ("UNetDO", 1)])
def test_engine_matches_model(rng, name, in_ch):
    shape = (16, 16, 32)
    m, vs = _variables(name, shape, in_ch)
    x = jnp.asarray(
        rng.random((1, *shape, in_ch)).astype(np.float32)
    )
    want = m.apply(vs, x, False)
    _assert_nontrivial(want)
    predict = engine.build_predict(
        name, vs, compute_dtype=jnp.float32, interpret=True
    )
    got = predict(x)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=1e-3
        )


def test_engine_spsmall_softmax_head(rng):
    shape = (32, 32, 32)
    m, vs = _variables("UNetSPSmall", shape, 2)
    x = jnp.asarray(rng.random((1, *shape, 2)).astype(np.float32))
    want = m.apply(vs, x, False)
    _assert_nontrivial(want)
    predict = engine.build_predict(
        "UNetSPSmall", vs, compute_dtype=jnp.float32, interpret=True
    )
    got = predict(x)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=1e-3
        )


def test_supports():
    assert engine.supports("UNetSP")
    assert engine.supports("recAE_v2_fixed")
    assert not engine.supports("NotAModel")


def test_engine_legacy_recae(rng):
    shape = (16, 16, 16)
    m, vs = _variables("recAE_v2_fixed", shape, 1)
    x = jnp.asarray(rng.random((1, *shape, 1)).astype(np.float32))
    want = m.apply(vs, x, False)
    _assert_nontrivial(want)
    predict = engine.build_predict(
        "recAE_v2_fixed", vs, compute_dtype=jnp.float32, interpret=True
    )
    got = predict(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3
    )
    assert engine.supports("recAE_v2_fixed")


def test_conv_transpose_helper_matches_flax(rng):
    """Direct check of the k2s2 transposed-conv emulation against
    nn.ConvTranspose(transpose_kernel=True) — the exact op the model zoo
    uses (guards the no-flip semantics; a flipped version shifted every
    upsampled voxel by one and was masked by a vacuous fixture)."""
    import flax.linen as nn

    from ctunet_tpu.engine import _conv_transpose_k2s2

    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    K = jnp.asarray(
        rng.standard_normal((2, 2, 2, 2, 3)).astype(np.float32) * 0.3
    )
    b = jnp.asarray(rng.standard_normal(2).astype(np.float32))
    ct = nn.ConvTranspose(
        2, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
        transpose_kernel=True,
    )
    want = ct.apply({"params": {"kernel": K, "bias": b}}, x[None])[0]
    got = _conv_transpose_k2s2(x, K, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


def test_get_packed_cache_is_concrete_across_traces(rng):
    """_FusedUnit._get_packed fills lazily — possibly during a TRACE (the
    engine predict traced inside an outer jit, as sliding-window patching
    does). Under stackless tracing jnp.asarray stages there, so a naive
    cache would hold a trace-local tracer and crash the NEXT outer jit
    with UnexpectedTracerError (hit live: tools/bench_512.py --patch-only,
    second variant). The cache must hold concrete arrays."""
    from ctunet_tpu.engine import _FusedUnit

    cin, cout = 2, 4
    unit_vars = {
        "conv": {
            "kernel": rng.standard_normal((3, 3, 3, cin, cout)).astype(
                np.float32
            ),
        },
        "bn": {
            "scale": np.ones(cout, np.float32),
            "bias": np.zeros(cout, np.float32),
        },
    }
    unit_stats = {
        "bn": {
            "mean": np.zeros(cout, np.float32),
            "var": np.ones(cout, np.float32),
        }
    }
    unit = _FusedUnit(unit_vars, unit_stats, interpret=True)

    @jax.jit
    def f1(x):
        pw, pb = unit._get_packed(4)  # first fill happens INSIDE a trace
        return jnp.sum(pw) + jnp.sum(pb) + x

    @jax.jit
    def f2(x):  # distinct jit: reuses the cache from f1's trace
        pw, pb = unit._get_packed(4)
        return jnp.sum(pw) * x

    a = float(f1(0.0))
    b = float(f2(1.0))  # raised UnexpectedTracerError before the fix
    pw, pb = unit._packed[(4, False, False)]
    assert not isinstance(pw, jax.core.Tracer)
    assert not isinstance(pb, jax.core.Tracer)
    np.testing.assert_allclose(b, a, rtol=1e-5)
