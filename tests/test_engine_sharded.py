"""Depth-sharded fused-engine inference == single-device engine.

One volume's depth is sharded over the mesh `spatial` axis; the chained
layout's halo planes are exchanged over the collective fabric after every
kernel (parallel/halo.py). This is the engine-path counterpart of the
XLA-SPMD sharding tests in test_parallel.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu import engine
from ctunet_tpu.models import build_model
from ctunet_tpu.parallel import make_mesh

# heavyweight (CPU-interpret / e2e): full-suite lane only
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("shards", [2])
def test_sharded_engine_matches_single(rng, shards):
    if len(jax.devices()) < shards:
        pytest.skip("needs multiple devices")
    shape = (32, 16, 32)  # D=32: 2 shards x 16, pool multiple 16
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    vs = {
        "params": vs["params"],
        "batch_stats": jax.tree.map(
            lambda s: s * 1.05 + 0.01, vs["batch_stats"]
        ),
    }
    x = jnp.asarray(rng.random((1, *shape, 2)).astype(np.float32))

    single = engine.build_predict(
        "UNetSP", vs, compute_dtype=jnp.float32, interpret=True
    )
    want = single(x)

    mesh = make_mesh(1, shards, jax.devices()[:shards])
    sharded = engine.build_sharded_predict(
        "UNetSP", vs, mesh, compute_dtype=jnp.float32, interpret=True
    )
    got = sharded(x)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-5
        )


def test_dp_engine_matches_single(rng):
    """Batch-DP engine serving: two volumes over two devices equal the
    single-device engine on each (throughput scale-out path)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    vs = {
        "params": vs["params"],
        "batch_stats": jax.tree.map(
            lambda s: s * 1.05 + 0.01, vs["batch_stats"]
        ),
    }
    x = jnp.asarray(rng.random((2, *shape, 2)).astype(np.float32))

    single = engine.build_predict(
        "UNetSP", vs, compute_dtype=jnp.float32, interpret=True
    )
    want = single(x)

    mesh = make_mesh(2, 1, jax.devices()[:2])
    dp = engine.build_dp_predict(
        "UNetSP", vs, mesh, compute_dtype=jnp.float32, interpret=True
    )
    got = dp(x)
    assert len(jax.tree.leaves(got)[0].sharding.device_set) == 2
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-5
        )

    # int8 path under shard_map: quantized per-shard serving matches the
    # unsharded quantized predict
    from ctunet_tpu import engine_q

    q_single = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True
    )
    want_q = q_single(x)
    dp_q = engine.build_dp_predict(
        "UNetSP", vs, mesh, compute_dtype=jnp.float32, interpret=True,
        int8_calib=x[0],
    )
    got_q = dp_q(x)
    for g, w in zip(jax.tree.leaves(got_q), jax.tree.leaves(want_q)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-5
        )


def test_dp_engine_legacy_family(rng):
    """The legacy k=5 family also rides batch-DP serving (its builder
    exposes the per-volume forward via jit=False); int8 stays
    generic-only with a clear error."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    shape = (16, 16, 32)
    m = build_model(
        "recAE_v2_fixed", compute_dtype="float32", use_checkpoint=False
    )
    x0 = jnp.zeros((1, *shape, 1), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    vs = {
        "params": vs["params"],
        "batch_stats": jax.tree.map(
            lambda s: s * 1.05 + 0.01, vs["batch_stats"]
        ),
    }
    x = jnp.asarray(rng.random((2, *shape, 1)).astype(np.float32))

    single = engine.build_predict(
        "recAE_v2_fixed", vs, compute_dtype=jnp.float32, interpret=True
    )
    want = single(x)

    mesh = make_mesh(2, 1, jax.devices()[:2])
    dp = engine.build_dp_predict(
        "recAE_v2_fixed", vs, mesh, compute_dtype=jnp.float32,
        interpret=True,
    )
    got = dp(x)
    assert len(jax.tree.leaves(got)[0].sharding.device_set) == 2
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-5
        )

    # int8 DP with a legacy model: the quantized builder's documented
    # scope error propagates (generic family only)
    with pytest.raises(ValueError, match="generic"):
        engine.build_dp_predict(
            "recAE_v2_fixed", vs, mesh, interpret=True, int8_calib=x[0]
        )
