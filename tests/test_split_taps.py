"""Split-tap kernels: the round-3 dots-per-conv restructure.

The 27-tap chained conv spends 18 of its 27 matmuls on t = +-1 tap
matrices that carry exactly ONE nonzero (Cin x Cout) block each; the
split form computes them as 9 main dots on the raw slab + 3 correction
dots on a gathered boundary buffer (``pack_weights_split`` /
``conv3d_chain_split``), and analogously for the fused upsample+conv
(24 -> 10 dots per parity pair). These tests pin:

- exact agreement with the 27-tap kernels (BIT-exact in int8 — integer
  adds are associative; f32-tight in bf16 mode);
- end-to-end: the int8 engine built with ``split_taps=True`` (default)
  is bit-identical to the full-tap build.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops.pallas import conv3d as pc
from ctunet_tpu.ops.pallas import upconv as uc


@pytest.mark.parametrize("pack,cin,cout", [
    (4, 3, 5), (2, 7, 7), (8, 2, 7), (1, 5, 3),
])
def test_split_conv_matches_full_f32(rng, pack, cin, cout):
    d, hh, ww = 6, 8, 32
    x = rng.standard_normal((d, hh, ww, cin)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 3, cin, cout)) * 0.3).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    wp = ww // pack
    xc = pc.to_chain(
        jnp.asarray(x.reshape(d, hh, wp, pack * cin)), pack
    )
    ref = pc.conv3d_chain(
        xc, jnp.asarray(pc.pack_weights(w, pack)),
        jnp.asarray(pc.pack_bias(b, pack)), hh, wp, interpret=True,
        out_dtype=jnp.float32,
    )
    wm, wc = pc.pack_weights_split(w, pack)
    got = pc.conv3d_chain_split(
        xc, jnp.asarray(wm), jnp.asarray(wc),
        jnp.asarray(pc.pack_bias(b, pack)), hh, wp, pack, cin,
        interpret=True, out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("zp", [False, True])
@pytest.mark.parametrize("pack,cin,cout", [(4, 3, 5), (16, 3, 7), (1, 5, 3)])
def test_split_conv_q_bit_exact(rng, zp, pack, cin, cout):
    d, hh, ww = 6, 8, 64
    wp = ww // pack
    xq = rng.integers(-128, 128, (d, hh, wp, pack * cin)).astype(np.int8)
    w = rng.integers(-127, 128, (3, 3, 3, cin, cout)).astype(np.float32)
    scale = rng.random(cout).astype(np.float32) * 0.01 + 0.001
    bias = rng.standard_normal(cout).astype(np.float32) * 3
    xc = pc.to_chain(jnp.asarray(xq), pack, fill=-128 if zp else 0)
    ps = jnp.asarray(pc.pack_bias(scale, pack))
    pb = jnp.asarray(pc.pack_bias(bias, pack))
    ref = pc.conv3d_chain_q(
        xc, jnp.asarray(pc.pack_weights(w, pack).astype(np.int8)), ps, pb,
        hh, wp, interpret=True, zp=zp,
    )
    wm, wc = pc.pack_weights_split(w, pack)
    got = pc.conv3d_chain_split(
        xc, jnp.asarray(wm.astype(np.int8)), jnp.asarray(wc.astype(np.int8)),
        pb, hh, wp, pack, cin, scale=ps, zp=zp, interpret=True,
    )
    assert (np.asarray(got) == np.asarray(ref)).all()


@pytest.mark.parametrize("dual", [False, True])
def test_split_upconv_matches_full_f32(rng, dual):
    pin, cin, co, dh, hh, ww = 4, 6, 5, 4, 8, 32
    wp = ww // pin
    ci_split = cin // 2 if dual else None
    R = (rng.standard_normal((4, 4, 4, cin, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    ma, mb = uc.build_upconv_matrices(R, pin, ci_split)
    sa, sb = uc.build_upconv_matrices_split(R, pin, ci_split)
    cw_a = cin if ci_split is None else ci_split
    cw_b = 0 if ci_split is None else cin - ci_split
    b2 = jnp.asarray(uc.pack_out_bias(bias, 2 * pin))
    a_chain = pc.to_chain(
        jnp.asarray(
            rng.standard_normal((dh, hh, wp, pin * cw_a)).astype(np.float32)
        ), pin,
    )
    b_chain = None
    if dual:
        b_chain = pc.to_chain(
            jnp.asarray(rng.standard_normal(
                (dh, hh, wp, pin * cw_b)
            ).astype(np.float32)), pin,
        )
    ref = uc.upconv_fused_chain(
        a_chain, jnp.asarray(ma), b2, hh, wp, b_chain=b_chain,
        mats_b=None if mb is None else jnp.asarray(mb), interpret=True,
    )
    got = uc.upconv_fused_chain_split(
        a_chain, (jnp.asarray(sa[0]), jnp.asarray(sa[1])), b2, hh, wp,
        pin, cw_a, b_chain=b_chain,
        split_b=None if sb is None else (jnp.asarray(sb[0]),
                                         jnp.asarray(sb[1])),
        cw_b=cw_b, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_split_upconv_q_bit_exact(rng):
    pin, cin, co, dh, hh, ww = 8, 4, 7, 4, 8, 64
    wp = ww // pin
    ci_split = 2
    R = np.round(
        rng.standard_normal((4, 4, 4, cin, co)) * 50
    ).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    scale = rng.random(co).astype(np.float32) * 0.01 + 0.001
    pout = 2 * pin
    ma, mb = uc.build_upconv_matrices(R, pin, ci_split)
    sa, sb = uc.build_upconv_matrices_split(R, pin, ci_split)
    # zp bias rows: per-parity zero-point corrections from the quantized
    # matrices — identical between forms (same taps rearranged)
    colsum = ma.sum(axis=(2, 3)) + mb.sum(axis=(2, 3))
    colsum_s = (sa[0].sum(axis=(2, 3)) + sa[1].sum(axis=(2, 3))
                + sb[0].sum(axis=(2, 3)) + sb[1].sum(axis=(2, 3)))
    np.testing.assert_array_equal(colsum, colsum_s)
    scale_lane = uc.pack_out_bias(scale, pout)[0]
    base = uc.pack_out_bias(bias, pout)[0]
    b2 = jnp.asarray(np.stack([
        base + 128.0 * colsum[a, b] * scale_lane
        for a in range(2) for b in range(2)
    ]).astype(np.float32))
    s2 = jnp.asarray(uc.pack_out_bias(scale, pout))
    cw_a, cw_b = ci_split, cin - ci_split
    a_chain = pc.to_chain(jnp.asarray(
        rng.integers(-128, 128, (dh, hh, wp, pin * cw_a)).astype(np.int8)
    ), pin, fill=-128)
    b_chain = pc.to_chain(jnp.asarray(
        rng.integers(-128, 128, (dh, hh, wp, pin * cw_b)).astype(np.int8)
    ), pin, fill=-128)
    ref = uc.upconv_fused_chain(
        a_chain, jnp.asarray(ma.astype(np.int8)), b2, hh, wp,
        b_chain=b_chain, mats_b=jnp.asarray(mb.astype(np.int8)),
        scale2=s2, interpret=True, zp=True,
    )
    got = uc.upconv_fused_chain_split(
        a_chain,
        (jnp.asarray(sa[0].astype(np.int8)),
         jnp.asarray(sa[1].astype(np.int8))),
        b2, hh, wp, pin, cw_a, b_chain=b_chain,
        split_b=(jnp.asarray(sb[0].astype(np.int8)),
                 jnp.asarray(sb[1].astype(np.int8))),
        cw_b=cw_b, scale2=s2, interpret=True, zp=True,
    )
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_int8_engine_split_vs_full_bit_exact(rng):
    """End-to-end: the split-tap int8 engine build (the default) is
    bit-identical to the full 27-tap build — same quantized taps, same
    integer algebra, only the dot decomposition differs."""
    from ctunet_tpu import engine_q
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))
    want = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        split_taps=False,
    )(x)
    got = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        split_taps=True,
    )(x)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
