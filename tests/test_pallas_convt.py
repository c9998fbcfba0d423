"""Pallas convT+depth-to-space kernel: correctness vs the flax op."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops.pallas.convt import (
    build_matrices,
    conv_transpose_k2s2,
    unpack2,
)


@pytest.mark.parametrize("ci,co", [(3, 4), (5, 5)])
def test_matches_flax_convtranspose(rng, ci, co):
    dh, hh, wh = 3, 8, 8
    x = jnp.asarray(rng.standard_normal((dh, hh, wh, ci)), jnp.float32)
    K = rng.standard_normal((2, 2, 2, co, ci)).astype(np.float32) * 0.3
    b = rng.standard_normal(co).astype(np.float32)
    ct = nn.ConvTranspose(
        co, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
        transpose_kernel=True,
    )
    want = ct.apply(
        {"params": {"kernel": jnp.asarray(K), "bias": jnp.asarray(b)}},
        x[None],
    )[0]
    mats, pb = build_matrices(K, b)
    got = unpack2(
        conv_transpose_k2s2(
            x, jnp.asarray(mats), jnp.asarray(pb), interpret=True
        ),
        co,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-3
    )


def test_rejects_unaligned_wh(rng):
    x = jnp.zeros((2, 8, 12, 3), jnp.float32)
    K = np.zeros((2, 2, 2, 2, 3), np.float32)
    mats, pb = build_matrices(K, np.zeros(2, np.float32))
    with pytest.raises(AssertionError, match="multiple of 8"):
        conv_transpose_k2s2(x, jnp.asarray(mats), jnp.asarray(pb),
                            interpret=True)
