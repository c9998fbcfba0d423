"""Fused upsample+conv kernel == ConvT(k2,s2) -> SAME conv + bias + ReLU.

The composite kernel (ops/pallas/upconv.py) evaluates the decoder's
[transposed conv -> first conv unit] pair in one fractionally-strided pass
over HALF-resolution operands; the convT bias rides a ones input channel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.engine import _conv_transpose_k2s2
from ctunet_tpu.ops.pallas import conv3d as pc
from ctunet_tpu.ops.pallas import upconv as uc


@pytest.mark.parametrize("dual", [True, False])
def test_upconv_fused_matches_composite(rng, dual):
    Dh, Hh, Wh = 4, 4, 16
    Ca, Cb, Ct, Co = 3, 2, 5, 3
    pin = 4
    wp = Wh // pin
    cin = Ca + (Cb if dual else 0)

    a = rng.random((Dh, Hh, Wh, Ca)).astype(np.float32)
    b = rng.random((Dh, Hh, Wh, Cb)).astype(np.float32)
    kT = (rng.random((2, 2, 2, Ct, cin)) - 0.5).astype(np.float32) * 0.5
    bT = (rng.random(Ct) - 0.5).astype(np.float32)
    w0 = (rng.random((3, 3, 3, Ct, Co)) - 0.5).astype(np.float32) * 0.3
    scale0 = (rng.random(Co) * 0.5 + 0.75).astype(np.float32)
    bias0 = (rng.random(Co) - 0.5).astype(np.float32)

    cat = np.concatenate([a, b], -1) if dual else a
    up = _conv_transpose_k2s2(jnp.asarray(cat), jnp.asarray(kT),
                              jnp.asarray(bT))
    y = jax.lax.conv_general_dilated(
        up[None], jnp.asarray(w0 * scale0[None, None, None, None, :]),
        (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0] + bias0
    ref = np.asarray(jnp.maximum(y, 0.0))

    bcol = np.broadcast_to(
        bT[None, None, None, :, None], (2, 2, 2, Ct, 1)
    ).copy()
    if dual:
        kT_aug = np.concatenate(
            [kT[..., :Ca], bcol, kT[..., Ca:]], -1
        )
        ci_split = Ca + 1
    else:
        kT_aug = np.concatenate([kT, bcol], -1)
        ci_split = None
    R = uc.composite_response(kT_aug, w0, scale0)
    ma, mb = uc.build_upconv_matrices(R, pin, ci_split=ci_split)
    bias2 = jnp.asarray(uc.pack_out_bias(bias0, 2 * pin))

    a1 = np.concatenate([a, np.ones((Dh, Hh, Wh, 1), np.float32)], -1)
    ac = pc.to_chain(
        jnp.asarray(a1).reshape(Dh, Hh, wp, pin * (Ca + 1)), pin
    )
    bc = (
        pc.to_chain(jnp.asarray(b).reshape(Dh, Hh, wp, pin * Cb), pin)
        if dual else None
    )
    out = uc.upconv_fused_chain(
        ac, jnp.asarray(ma), bias2, Hh, wp,
        b_chain=bc, mats_b=None if mb is None else jnp.asarray(mb),
        interpret=True,
    )
    std = pc.from_chain(out, 2 * Hh, wp, 2 * pin * Co)
    got = np.asarray(pc.unpack_output(std, 2 * pin, Co))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    # chained-layout borders stay zero (halo invariant)
    oc = np.asarray(out).reshape(2 * Dh + 2, 2 * Hh + 2, -1, out.shape[-1])
    assert np.all(oc[0] == 0) and np.all(oc[-1] == 0)
    assert np.all(oc[:, 0] == 0) and np.all(oc[:, -1] == 0)
