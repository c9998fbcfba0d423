"""Differentiable W-packed 3D convolution (pure XLA; the training-path
counterpart of the Pallas inference kernel).

XLA's 3D conv on TPU is pathological for thin channels in BOTH directions:
the forward runs at ~0.6 TFLOP/s, and the backward materializes im2col-like
temps whose 7-lane minor dim gets padded 18x — the 224x304x304 training
step literally cannot fit in HBM (measured; BASELINE.md). The packing
transform from ``ops/pallas/conv3d.py`` fixes both, and is fully
differentiable when expressed in-graph:

- packing the volume is a pure reshape ``(B,D,H,W,C) -> (B,D,H,W/p,p*C)``;
- the packed weights are a LINEAR function of the raw (k,k,k,Cin,Cout)
  kernel — a contraction with a static 0/1 placement tensor — so gradients
  flow through to the raw parameters and optimizer state/checkpoints keep
  the reference parameterization;
- the packed conv is a standard ``lax.conv_general_dilated`` over ~112
  channels, which XLA handles sanely forward and backward.

Pack choice targets ~128 packed input channels (larger packs inflate FLOPs
by p; thinner ones under-fill the MXU lanes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _placement(k: int, pack: int) -> np.ndarray:
    """Static 0/1 tensor M[dx, s, t1, r]: original W-tap dx contributes to
    packed tap t1-1 from packed-in position r into packed-out position s
    (same algebra as ``ops/pallas/conv3d.pack_weights``)."""
    half = k // 2
    m = np.zeros((k, pack, 3, pack), np.float32)
    for dx in range(k):
        for s in range(pack):
            u = s + dx - half
            t = (u + pack) // pack - 1
            assert -1 <= t <= 1
            r = u - t * pack
            m[dx, s, t + 1, r] = 1.0
    return m


def pack_weights_jax(kernel: jax.Array, pack: int) -> jax.Array:
    """(k,k,k,Cin,Cout) -> packed (k,k,3, pack*Cin, pack*Cout), differentiable."""
    k = kernel.shape[0]
    cin, cout = kernel.shape[3], kernel.shape[4]
    m = jnp.asarray(_placement(k, pack), kernel.dtype)
    # out[a,b,t, r,i, s,o] = sum_d kernel[a,b,d,i,o] * m[d,s,t,r]
    pw = jnp.einsum("abdio,dstr->abtriso", kernel, m)
    return pw.reshape(k, k, 3, pack * cin, pack * cout)


def choose_train_pack(ww: int, cin: int, k: int = 3, target: int = 128,
                      max_pack: int = 16) -> int:
    """Largest pack dividing W with pack*Cin <= target (FLOPs inflate by
    pack, so aim for just-filled MXU lanes), respecting pack >= k//2.
    Returns 1 when no legal pack exists (callers use the plain conv)."""
    min_pack = max(2, k // 2) if k > 3 else 2
    cands = [
        p for p in (16, 8, 4, 2)
        if p <= max_pack and p >= min_pack and ww % p == 0
    ]
    for p in cands:  # descending
        if p * cin <= target:
            return p
    return cands[-1] if cands else 1


def packed_conv3d(
    x: jax.Array,
    kernel: jax.Array,
    pack: Optional[int] = None,
    precision=None,
) -> jax.Array:
    """SAME, stride-1, odd-k 3D conv over (B, D, H, W, C), W-packed.

    Numerically identical to ``lax.conv_general_dilated(..., 'SAME')``
    (modulo float summation order); ~2.5x faster forward and without the
    thin-channel conv-backward memory blowup.
    """
    k = kernel.shape[0]
    b, d, hh, ww, cin = x.shape
    cout = kernel.shape[-1]
    if pack is None:
        pack = choose_train_pack(ww, cin, k=k)
    if pack <= 1:
        # No preferred_element_type: it breaks reverse-mode dtype matching
        # for conv, and the MXU accumulates in f32 regardless.
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    pw = pack_weights_jax(kernel, pack).astype(x.dtype)
    xq = x.reshape(b, d, hh, ww // pack, pack * cin)
    y = jax.lax.conv_general_dilated(
        xq, pw, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y.reshape(b, d, hh, ww, cout)
