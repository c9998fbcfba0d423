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


# ---------------------------------------------------------------------------
# packed-layout variant (the packed-resident graph's conv)
# ---------------------------------------------------------------------------


def test_pack_weights_split_jax_matches_numpy(rng):
    from ctunet_tpu.ops.chain_conv_train import pack_weights_split_jax
    from ctunet_tpu.ops.pallas.conv3d import pack_weights_split

    for pack, cin, cout in [(4, 2, 3), (8, 7, 7), (2, 14, 7)]:
        w = rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32)
        m_np, c_np = pack_weights_split(w, pack)
        m_j, c_j = pack_weights_split_jax(jnp.asarray(w), pack, jnp.float32)
        np.testing.assert_allclose(np.asarray(m_j), m_np, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_j), c_np, atol=1e-6)


@pytest.mark.parametrize("shape,cin,cout,pack", [
    ((4, 4, 2), 2, 3, 4),     # (D, H, wp): tiny, entry-style cin
    ((6, 4, 2), 7, 7, 4),     # body-style channels
])
def test_packed_value_and_grads_match_xla(rng, shape, cin, cout, pack):
    from ctunet_tpu.ops.chain_conv_train import (
        conv3d_chain_train_packed,
        packed_chain_supported,
        _xla_conv_packed,
    )

    d, hh, wp = shape
    xq = jnp.asarray(
        rng.standard_normal((1, d, hh, wp, pack * cin)), jnp.float32
    )
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)) * 0.2, jnp.float32
    )
    assert packed_chain_supported(xq, w, pack)
    cot = jnp.asarray(
        rng.standard_normal((1, d, hh, wp, pack * cout)), jnp.float32
    )

    got = conv3d_chain_train_packed(xq, w)
    want = _xla_conv_packed(xq, w, pack)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3
    )

    def loss_chain(xq, w):
        return jnp.sum(conv3d_chain_train_packed(xq, w) * cot)

    def loss_xla(xq, w):
        return jnp.sum(_xla_conv_packed(xq, w, pack) * cot)

    gx_c, gw_c = jax.grad(loss_chain, argnums=(0, 1))(xq, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(xq, w)
    np.testing.assert_allclose(
        np.asarray(gx_c), np.asarray(gx_x), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gw_c), np.asarray(gw_x), atol=2e-3, rtol=1e-3
    )


def test_packed_wgrad_chain_mode_matches(rng):
    from ctunet_tpu.ops import chain_conv_train as cct

    d, hh, wp, cin, cout, pack = 4, 4, 2, 2, 3, 4
    xq = jnp.asarray(
        rng.standard_normal((1, d, hh, wp, pack * cin)), jnp.float32
    )
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)) * 0.2, jnp.float32
    )
    cot = jnp.asarray(
        rng.standard_normal((1, d, hh, wp, pack * cout)), jnp.float32
    )

    def loss(xq, w):
        return jnp.sum(cct.conv3d_chain_train_packed(xq, w) * cot)

    gw_xla = jax.grad(loss, argnums=1)(xq, w)
    cct.set_wgrad_mode("chain")
    try:
        gw_chain = jax.grad(loss, argnums=1)(xq, w)
    finally:
        cct.set_wgrad_mode("xla")
    np.testing.assert_allclose(
        np.asarray(gw_chain), np.asarray(gw_xla), atol=2e-3, rtol=1e-3
    )


def test_packed_resident_chain_impl_matches_xla(rng):
    """End-to-end: PackedResidentModel forward+grads with conv_impl
    'chain' equal the 'xla' impl (same params, same input)."""
    from ctunet_tpu.models import build_model
    from ctunet_tpu.models.packed_resident import PackedResidentModel
    from ctunet_tpu.ops import packed_conv as pcv

    model = build_model("UNetSP", compute_dtype="float32")
    pm = PackedResidentModel(model, "UNetSP", use_remat=False)
    x = jnp.asarray(rng.random((1, 16, 16, 16, 2)), jnp.float32)
    variables = model.init(jax.random.key(0), x, False)

    def loss_fn(params):
        out, _ = pm.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o * o) for o in jax.tree.leaves(out))

    try:
        pcv.set_conv_impl("chain")
        v_c, g_c = jax.value_and_grad(loss_fn)(variables["params"])
    finally:
        pcv.set_conv_impl("xla")
    v_x, g_x = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(v_c), float(v_x), rtol=1e-4)
    key = lambda kv: jax.tree_util.keystr(kv[0])  # noqa: E731
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_c), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(g_x), key=key),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(ka),
        )


def test_chain_min_pack_gate(rng):
    """set_chain_min_pack restricts the packed chain conv to high-pack
    (full-resolution) levels, where the kernel wins over XLA at training
    shapes (BASELINE.md round 4)."""
    from ctunet_tpu.ops import chain_conv_train as cct

    xq4 = jnp.zeros((1, 4, 4, 2, 4 * 7), jnp.float32)
    xq16 = jnp.zeros((1, 4, 4, 2, 16 * 7), jnp.float32)
    w = jnp.zeros((3, 3, 3, 7, 7), jnp.float32)
    assert cct.packed_chain_supported(xq4, w, 4)
    assert cct.packed_chain_supported(xq16, w, 16)
    try:
        cct.set_chain_min_pack(16)
        assert not cct.packed_chain_supported(xq4, w, 4)
        assert cct.packed_chain_supported(xq16, w, 16)
    finally:
        cct.set_chain_min_pack(2)
    assert cct.packed_chain_supported(xq4, w, 4)
