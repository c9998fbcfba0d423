"""Pallas fused Conv3D+BN+ReLU kernel: correctness vs the XLA conv.

Runs in interpret mode on the CPU backend (the TPU path shares the exact
same kernel code; alignment paddings are tested here too).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops.pallas import conv3d as pc


def _xla_conv(x, w, bias=None, relu=True):
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),
        jnp.asarray(w, jnp.float32),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    if bias is not None:
        y = y + jnp.asarray(bias)
    if relu:
        y = jnp.maximum(y, 0.0)
    return np.asarray(y)


@pytest.mark.parametrize("pack", [1, 2, 4])
@pytest.mark.parametrize("cin,cout", [(3, 5), (7, 7), (2, 7)])
def test_conv_matches_xla(rng, pack, cin, cout):
    d, hh, ww = 6, 8, 16
    x = jnp.asarray(rng.standard_normal((d, hh, ww, cin)), jnp.float32)
    w = rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal(cout).astype(np.float32)
    got = np.asarray(
        pc.conv3d_k3(
            x, w, bias=bias, pack=pack, interpret=True,
            out_dtype=jnp.float32,
        )
    )
    want = _xla_conv(x, w, bias)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_conv_no_relu(rng):
    d, hh, ww, c = 4, 8, 8, 3
    x = jnp.asarray(rng.standard_normal((d, hh, ww, c)), jnp.float32)
    w = rng.standard_normal((3, 3, 3, c, c)).astype(np.float32) * 0.3
    got = np.asarray(
        pc.conv3d_k3(x, w, pack=2, relu=False, interpret=True,
                     out_dtype=jnp.float32)
    )
    want = _xla_conv(x, w, relu=False)
    assert (want < 0).any()  # negative values survive
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_conv_bn_folding(rng):
    d, hh, ww, c = 4, 8, 8, 4
    x = jnp.asarray(rng.standard_normal((d, hh, ww, c)), jnp.float32)
    w = rng.standard_normal((3, 3, 3, c, c)).astype(np.float32) * 0.3
    scale = rng.random(c).astype(np.float32) + 0.5
    bbias = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32) * 0.1
    var = rng.random(c).astype(np.float32) + 0.5
    got = np.asarray(
        pc.conv3d_k3(
            x, w, bn=(scale, bbias, mean, var), pack=2, interpret=True,
            out_dtype=jnp.float32,
        )
    )
    y = _xla_conv(x, w, relu=False)
    want = np.maximum(
        (y - mean) / np.sqrt(var + 1e-5) * scale + bbias, 0.0
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_h_tiling_matches(rng):
    """Explicit small H tile must give identical results."""
    d, hh, ww, c = 4, 16, 8, 3
    x = jnp.asarray(rng.standard_normal((d, hh, ww, c)), jnp.float32)
    w = rng.standard_normal((3, 3, 3, c, c)).astype(np.float32) * 0.3
    pw = jnp.asarray(pc.pack_weights(w, 2))
    pb = jnp.asarray(pc.pack_bias(np.zeros(c, np.float32), 2))
    full = pc.conv3d_fused(x, pw, pb, 2, h_tile=16, interpret=True,
                           out_dtype=jnp.float32)
    tiled = pc.conv3d_fused(x, pw, pb, 2, h_tile=8, interpret=True,
                            out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(tiled), atol=1e-5
    )


def test_choose_pack():
    assert pc.choose_pack(304, 7) == 16
    assert pc.choose_pack(152, 14) == 8
    assert pc.choose_pack(76, 28) == 4
    assert pc.choose_pack(38, 56) == 2
    assert pc.choose_pack(19, 112) == 1


def test_pack_weights_zero_structure():
    w = np.ones((3, 3, 3, 2, 2), np.float32)
    pw = pc.pack_weights(w, 4).reshape(3, 3, 3, 128, 128)
    # t=0 (packed tap -1) only feeds from r=p-1 (u=-1) into s=0.
    t0 = pw[:, :, 0]
    assert t0[:, :, 3 * 2 : 4 * 2, 0:2].any()  # r=3 -> s=0 populated
    assert not t0[:, :, 0 : 3 * 2, :].any()  # other r unused
    # t=2 (packed tap +1) only feeds r=0 into s=p-1.
    t2 = pw[:, :, 2]
    assert t2[:, :, 0:2, 3 * 2 : 4 * 2].any()
    assert not t2[:, :, 2:, :].any()


@pytest.mark.parametrize("pack", [2, 4])
def test_conv_k5_matches_xla(rng, pack):
    """k=5 taps (legacy model family) pack into the same 3-tap kernel."""
    d, hh, ww, cin, cout = 6, 8, 16, 3, 4
    x = jnp.asarray(rng.standard_normal((d, hh, ww, cin)), jnp.float32)
    w = rng.standard_normal((5, 5, 5, cin, cout)).astype(np.float32) * 0.2
    bias = rng.standard_normal(cout).astype(np.float32)
    got = np.asarray(
        pc.conv3d_k3(x, w, bias=bias, pack=pack, interpret=True,
                     out_dtype=jnp.float32)
    )
    want = _xla_conv(x, w, bias)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_pack_too_small_for_k5_raises(rng):
    x = jnp.zeros((4, 8, 15, 2), jnp.float32)  # W=15 -> only pack 1 legal
    w = np.zeros((5, 5, 5, 2, 2), np.float32)
    with pytest.raises(ValueError, match="no legal pack"):
        pc.conv3d_k3(x, w, interpret=True)
