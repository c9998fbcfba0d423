"""int8 quantized serving kernels: exact-integer correctness.

The quantized chain conv (``conv3d_chain_q``) computes
``q_out = round(clamp(relu(acc * scale + bias), 0, 127))`` with int8
operands and int32 MXU accumulation. Integer products are exact, so the
kernel must match a float emulation bit-for-bit (interpret mode, CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops.pallas import conv3d as pc


def _emulate_q(x_int, w_int, scale, bias, relu=True):
    """Float emulation of the quantized conv (exact for these magnitudes)."""
    acc = jax.lax.conv_general_dilated(
        x_int[None].astype(jnp.float32),
        jnp.asarray(w_int, jnp.float32),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    res = acc * scale[None, None, None, :] + bias[None, None, None, :]
    if relu:
        res = jnp.maximum(res, 0.0)
    res = jnp.minimum(res, 127.0)
    return np.asarray(jnp.round(res), np.int8)


@pytest.mark.parametrize("pack,cin,cout", [(2, 3, 5), (4, 2, 7), (2, 7, 7)])
def test_chain_q_matches_integer_emulation(rng, pack, cin, cout):
    d, hh, ww = 6, 8, 16
    wp = ww // pack
    x = rng.integers(0, 90, (d, hh, ww, cin)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 3, cin, cout)).astype(np.int8)
    scale = (rng.random(cout) * 2e-3 + 1e-4).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32) * 3.0

    pw = pc.pack_weights(w.astype(np.float32), pack)
    assert np.abs(pw).max() <= 127
    pw8 = jnp.asarray(pw.astype(np.int8))
    ps = jnp.asarray(pc.pack_bias(scale, pack))
    pb = jnp.asarray(pc.pack_bias(bias, pack))

    xq = jnp.asarray(x.reshape(d, hh, wp, pack * cin))
    xc = pc.to_chain(xq, pack)
    out_c = pc.conv3d_chain_q(xc, pw8, ps, pb, hh, wp, interpret=True)
    out = pc.unpack_output(
        pc.from_chain(out_c, hh, wp, pack * cout), pack, cout
    )
    want = _emulate_q(jnp.asarray(x), w, jnp.asarray(scale),
                      jnp.asarray(bias))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_chain_q_borders_zero(rng):
    """Output halo planes/rows/cols must be exactly zero (int8 zero ==
    quantized zero under symmetric quantization)."""
    pack, cin, cout = 2, 3, 4
    d, hh, ww = 4, 8, 8
    wp = ww // pack
    x = rng.integers(0, 90, (d, hh, ww, cin)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 3, cin, cout)).astype(np.int8)
    pw8 = jnp.asarray(pc.pack_weights(w.astype(np.float32), pack).astype(np.int8))
    ps = jnp.asarray(pc.pack_bias(np.full(cout, 1e-3, np.float32), pack))
    pb = jnp.asarray(pc.pack_bias(np.ones(cout, np.float32), pack))
    xc = pc.to_chain(jnp.asarray(x.reshape(d, hh, wp, pack * cin)), pack)
    out_c = np.asarray(
        pc.conv3d_chain_q(xc, pw8, ps, pb, hh, wp, interpret=True)
    )
    wpad = out_c.shape[1] // (hh + 2)
    grid = out_c.reshape(d + 2, hh + 2, wpad, -1)
    assert (grid[0] == 0).all() and (grid[-1] == 0).all()
    assert (grid[:, 0] == 0).all() and (grid[:, -1] == 0).all()
    assert (grid[:, :, wp:] == 0).all()


def test_chain_q_chains_into_itself(rng):
    """conv_q -> conv_q with no glue: second conv sees correct halos."""
    pack, c = 2, 4
    d, hh, ww = 4, 8, 8
    wp = ww // pack
    x = rng.integers(0, 60, (d, hh, ww, c)).astype(np.int8)
    w1 = rng.integers(-60, 60, (3, 3, 3, c, c)).astype(np.int8)
    w2 = rng.integers(-60, 60, (3, 3, 3, c, c)).astype(np.int8)
    s = np.full(c, 5e-3, np.float32)
    b = np.zeros(c, np.float32)

    def q(wi):
        return jnp.asarray(
            pc.pack_weights(wi.astype(np.float32), pack).astype(np.int8)
        )

    ps = jnp.asarray(pc.pack_bias(s, pack))
    pb = jnp.asarray(pc.pack_bias(b, pack))
    xc = pc.to_chain(jnp.asarray(x.reshape(d, hh, wp, pack * c)), pack)
    y1 = pc.conv3d_chain_q(xc, q(w1), ps, pb, hh, wp, interpret=True)
    y2 = pc.conv3d_chain_q(y1, q(w2), ps, pb, hh, wp, interpret=True)
    got = pc.unpack_output(pc.from_chain(y2, hh, wp, pack * c), pack, c)

    mid1 = _emulate_q(jnp.asarray(x), w1, jnp.asarray(s), jnp.asarray(b))
    want = _emulate_q(jnp.asarray(mid1), w2, jnp.asarray(s), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(got), want)
