"""Chain-kernel training conv: value and gradient equivalence vs XLA.

``conv3d_chain_train`` (ops/chain_conv_train.py) must match the packed XLA
conv in value AND in both VJPs — it is the same SAME/stride-1 k3 conv, so
any deviation beyond f32 summation order is a bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops.chain_conv_train import conv3d_chain_train
from ctunet_tpu.ops.packed_conv import choose_train_pack, packed_conv3d

# heavyweight (CPU-interpret / e2e): full-suite lane only
pytestmark = pytest.mark.slow


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("shape,cin,cout", [
    ((8, 16, 16), 7, 7),
    ((8, 16, 32), 2, 7),
    ((6, 8, 16), 14, 7),   # decoder-style thin output
])
def test_value_matches_xla(rng, shape, cin, cout):
    pack = choose_train_pack(shape[-1], cin, k=3)
    assert pack > 1, "fixture must exercise the chain path"
    x = jnp.asarray(rng.standard_normal((1, *shape, cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)) * 0.2, jnp.float32
    )
    got = conv3d_chain_train(x, w)
    want = packed_conv3d(x, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3
    )


def test_grads_match_xla(rng):
    shape, cin, cout = (6, 8, 16), 7, 7
    x = jnp.asarray(rng.standard_normal((1, *shape, cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)) * 0.2, jnp.float32
    )
    cot = jnp.asarray(
        rng.standard_normal((1, *shape, cout)), jnp.float32
    )

    def loss_chain(x, w):
        return jnp.sum(conv3d_chain_train(x, w) * cot)

    def loss_xla(x, w):
        return jnp.sum(packed_conv3d(x, w) * cot)

    gx_c, gw_c = jax.grad(loss_chain, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gx_c), np.asarray(gx_x), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gw_c), np.asarray(gw_x), atol=5e-3, rtol=1e-3
    )


def test_grads_match_batched(rng):
    """Batch > 1: dw sums over samples; dx stays per-sample."""
    shape, cin, cout = (4, 8, 16), 7, 7
    x = jnp.asarray(rng.standard_normal((2, *shape, cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)) * 0.2, jnp.float32
    )

    def loss_chain(x, w):
        return jnp.sum(jnp.sin(conv3d_chain_train(x, w)))

    def loss_xla(x, w):
        return jnp.sum(jnp.sin(packed_conv3d(x, w)))

    gx_c, gw_c = jax.grad(loss_chain, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gx_c), np.asarray(gx_x), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gw_c), np.asarray(gw_x), atol=5e-3, rtol=1e-3
    )


def test_unsupported_falls_back(rng):
    """k=5 and pack-1 shapes route to the XLA conv (incl. gradients)."""
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 6, 3)), jnp.float32)
    w5 = jnp.asarray(
        rng.standard_normal((5, 5, 5, 3, 4)) * 0.1, jnp.float32
    )
    got = conv3d_chain_train(x, w5)
    want = packed_conv3d(x, w5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )
    g = jax.grad(lambda a: jnp.sum(conv3d_chain_train(a, w5) ** 2))(x)
    gx = jax.grad(lambda a: jnp.sum(packed_conv3d(a, w5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gx), atol=1e-4)
