"""Inference-engine equivalence: fused Pallas forward == flax model.apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu import engine
from ctunet_tpu.models import build_model


def _variables(name, shape, in_ch, seed=0):
    m = build_model(name, compute_dtype="float32", use_checkpoint=False)
    x = jnp.zeros((1, *shape, in_ch), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(seed), x, False)
    # Nontrivial BN stats so folding is actually exercised.
    stats = jax.tree.map(
        lambda s: s + jax.random.uniform(
            jax.random.key(1), s.shape, minval=0.05, maxval=0.4
        ),
        vs["batch_stats"],
    )
    return m, {"params": vs["params"], "batch_stats": stats}


@pytest.mark.parametrize("name,in_ch", [("UNetSP", 2), ("UNetDO", 1)])
def test_engine_matches_model(rng, name, in_ch):
    shape = (16, 16, 32)
    m, vs = _variables(name, shape, in_ch)
    x = jnp.asarray(
        rng.random((1, *shape, in_ch)).astype(np.float32)
    )
    want = m.apply(vs, x, False)
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
    predict = engine.build_predict(
        "recAE_v2_fixed", vs, compute_dtype=jnp.float32, interpret=True
    )
    got = predict(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3
    )
    assert engine.supports("recAE_v2_fixed")
