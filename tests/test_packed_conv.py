"""Differentiable packed conv: numeric + gradient equivalence to lax.conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops.packed_conv import (
    choose_train_pack,
    pack_weights_jax,
    packed_conv3d,
)


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize("pack", [2, 4, 8])
@pytest.mark.parametrize("cin,cout", [(3, 5), (7, 7)])
def test_forward_matches_conv(rng, pack, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 16, cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)) * 0.3, jnp.float32
    )
    got = packed_conv3d(x, w, pack=pack)
    want = _ref_conv(x, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3
    )


def test_forward_k5(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 16, 2)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((5, 5, 5, 2, 3)) * 0.2, jnp.float32
    )
    got = packed_conv3d(x, w, pack=4)
    want = _ref_conv(x, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3
    )


def test_gradients_match_conv(rng):
    """Both d/dx and d/dw must match the plain conv's gradients."""
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 3)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 3, 4)) * 0.3, jnp.float32
    )
    tgt = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 4)), jnp.float32)

    def loss_packed(x, w):
        return jnp.mean((packed_conv3d(x, w, pack=4) - tgt) ** 2)

    def loss_ref(x, w):
        return jnp.mean((_ref_conv(x, w) - tgt) ** 2)

    gx_p, gw_p = jax.grad(loss_packed, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               atol=1e-5, rtol=1e-4)


def test_pack_weights_linear(rng):
    """Packing is linear in the kernel (gradient flow sanity)."""
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, 2, 2)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, 2, 2)), jnp.float32)
    p12 = pack_weights_jax(w1 + w2, 4)
    np.testing.assert_allclose(
        np.asarray(p12),
        np.asarray(pack_weights_jax(w1, 4) + pack_weights_jax(w2, 4)),
        atol=1e-6,
    )


def test_choose_train_pack():
    assert choose_train_pack(304, 7) == 16
    assert choose_train_pack(304, 14) == 8
    assert choose_train_pack(304, 28) == 4
    assert choose_train_pack(38, 56) == 2
    assert choose_train_pack(19, 56) == 1  # no divisor -> plain conv
    assert choose_train_pack(15, 2, k=5) == 1  # k5 needs pack >= 2


def test_pack1_falls_back(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 5, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 2, 2)) * 0.3, jnp.float32)
    got = packed_conv3d(x, w)  # W=5 has no even divisor
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref_conv(x, w)), atol=2e-4, rtol=1e-3
    )


def test_pallas_vjp_matches_xla(rng):
    """conv3d_pallas (Pallas fwd + hand VJP) vs the XLA conv: forward and
    both gradients agree (VERDICT round-1 item 4 gradient gate)."""
    import jax
    import jax.numpy as jnp

    from ctunet_tpu.ops.packed_conv import conv3d_pallas

    x = jnp.asarray(rng.random((1, 6, 8, 32, 3)).astype(np.float32))
    w = jnp.asarray((rng.random((3, 3, 3, 3, 5)) - 0.5).astype(np.float32))

    def ref_fn(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.sum(jnp.sin(y))

    def pallas_fn(x, w):
        return jnp.sum(jnp.sin(conv3d_pallas(x, w)))

    ref_val, (ref_dx, ref_dw) = jax.value_and_grad(ref_fn, (0, 1))(x, w)
    got_val, (got_dx, got_dw) = jax.value_and_grad(pallas_fn, (0, 1))(x, w)
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_dx), np.asarray(ref_dx), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_dw), np.asarray(ref_dw), atol=1e-3, rtol=1e-3
    )


def test_conv_impl_switch(rng):
    """set_conv_impl routes PackedConv through the Pallas VJP conv."""
    import jax
    import jax.numpy as jnp

    from ctunet_tpu.models import build_model
    from ctunet_tpu.ops import packed_conv

    model = build_model("UNetDO", compute_dtype="float32",
                        use_checkpoint=False)
    x = jnp.asarray(rng.random((1, 16, 16, 16, 1)).astype(np.float32))
    vs = jax.jit(model.init, static_argnums=(2,))(jax.random.key(0), x, False)
    want = model.apply(vs, x, False)
    packed_conv.set_conv_impl("pallas")
    try:
        got = model.apply(vs, x, False)
    finally:
        packed_conv.set_conv_impl("xla")
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=1e-3
        )


def test_xla_dw_impl_matches_autodiff(rng):
    """conv_impl='xla_dw' (per-tap dot-general weight grad) is value- and
    gradient-exact vs the default packed conv's autodiff."""
    import jax
    import jax.numpy as jnp

    from ctunet_tpu.ops import packed_conv as pcv

    x = jnp.asarray(rng.standard_normal((1, 6, 8, 32, 7)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((3, 3, 3, 7, 5)).astype(np.float32) * 0.2
    )

    def loss(x, k):
        return jnp.sum(jnp.sin(pcv.packed_conv3d(x, k)))

    try:
        pcv.set_conv_impl("xla")
        v1, (gx1, gk1) = jax.value_and_grad(loss, (0, 1))(x, k)
        pcv.set_conv_impl("xla_dw")
        v2, (gx2, gk2) = jax.value_and_grad(loss, (0, 1))(x, k)
    finally:
        pcv.set_conv_impl("xla")
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                               atol=2e-5, rtol=1e-4)
