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


def pack_pad_jax(kernel: jax.Array, pack: int, dtype) -> jax.Array:
    """Raw kernel -> 128-lane-padded packed weights (k*k*3, Cin_p, Cout_p),
    in-graph and differentiable — the operand layout every Pallas packed
    kernel expects."""
    k = kernel.shape[0]
    cin, cout = kernel.shape[3], kernel.shape[4]
    pw = pack_weights_jax(kernel, pack).astype(dtype)
    cin_p = -(-pack * cin // 128) * 128
    cout_p = -(-pack * cout // 128) * 128
    return jnp.pad(
        pw.reshape(k * k * 3, pack * cin, pack * cout),
        ((0, 0), (0, cin_p - pack * cin), (0, cout_p - pack * cout)),
    )


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


# ---------------------------------------------------------------------------
# Pallas-forward training conv (custom VJP)
#
# The fused Pallas kernel serves the TRAINING path too: forward and
# input-gradient are the packed-tap kernel (a transposed conv with kernel
# size 3 / stride 1 is a conv with spatially-flipped, channel-swapped
# weights), the weight-gradient is 27 tap-shifted einsums whose contraction
# (all voxels) is already MXU-shaped in XLA. Selected per trace via
# ``set_conv_impl`` (trainer config key ``conv_impl``).
# ---------------------------------------------------------------------------

_CONV_IMPL = "xla"


def set_conv_impl(impl: str) -> None:
    """Select the training-conv implementation at trace time:
    'xla' (packed XLA conv, default), 'xla_dw' (packed XLA conv with the
    weight-grad as explicit per-tap dot_generals instead of XLA's
    conv-backward), 'pallas' (fused kernel fwd/dgrad with a hand VJP), or
    'chain' (ring-cached chain-kernel fwd/dgrad + all-MXU dot-general
    weight grads — ops/chain_conv_train.py). Retracing (e.g. rebuilding
    the train step) applies."""
    global _CONV_IMPL
    assert impl in ("xla", "xla_dw", "pallas", "chain"), impl
    _CONV_IMPL = impl


def get_conv_impl() -> str:
    return _CONV_IMPL


def _pallas_same_conv(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """(B,D,H,W,Ci) SAME stride-1 conv via the Pallas packed-tap kernel.

    The packed weights are computed in-graph from the raw kernel (pure
    linear transform) then padded to the kernel's 128-lane layout.
    """
    from . import pallas  # noqa: F401
    from .pallas import conv3d as pc

    b, d, hh, ww, cin = x.shape
    k = kernel.shape[0]
    cout = kernel.shape[-1]
    pack = choose_train_pack(ww, cin, k=k)

    def xla():
        return packed_conv3d(x, kernel)

    if pack <= 1:
        return xla()
    pw = pack_pad_jax(kernel, pack, x.dtype)
    pb = jnp.zeros((1, pw.shape[2]), jnp.float32)

    interpret = jax.default_backend() == "cpu"

    def one(v):
        out = pc.conv3d_fused(
            v.reshape(d, hh, ww // pack, pack * cin), pw, pb, pack, k=k,
            relu=False, out_dtype=x.dtype, packed_in=True,
            interpret=interpret,
        )
        return pc.unpack_output(out, pack, cout)

    try:
        return jax.vmap(one)(x) if b > 1 else one(x[0])[None]
    except (ValueError, AssertionError):
        # shape too small/odd for the kernel's tiling -> XLA packed conv
        # (cheap at such sizes, and keeps fwd/bwd consistent).
        return xla()


def _flip_swap(kernel: jax.Array) -> jax.Array:
    """w(k,k,k,Ci,Co) -> spatially flipped, channels swapped (for dgrad)."""
    return jnp.flip(kernel, (0, 1, 2)).swapaxes(3, 4)


@jax.custom_vjp
def conv3d_pallas(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """SAME stride-1 3D conv, Pallas forward + hand VJP (training path)."""
    return _pallas_same_conv(x, kernel)


def _conv3d_pallas_fwd(x, kernel):
    return _pallas_same_conv(x, kernel), (x, kernel)


def _conv3d_pallas_bwd(res, g):
    x, kernel = res
    k = kernel.shape[0]
    half = k // 2
    # dL/dx: SAME conv of g with the flipped, channel-swapped kernel — the
    # same Pallas kernel, packed on g's channel count.
    dx = _pallas_same_conv(g, _flip_swap(kernel).astype(g.dtype))
    # dL/dw[a,b,c,i,o] = sum_v x[v + (a,b,c) - half, i] * g[v, o]: 27 tap-
    # shifted whole-volume contractions (each one MXU-shaped in XLA).
    xp = jnp.pad(
        x, ((0, 0),) + ((half, half),) * 3 + ((0, 0),)
    )
    b, d, hh, ww, _ = x.shape
    taps = []
    for a in range(k):
        for bb in range(k):
            rows = []
            for c in range(k):
                xs = jax.lax.dynamic_slice(
                    xp, (0, a, bb, c, 0), (b, d, hh, ww, x.shape[-1])
                )
                # bf16 operands with f32 accumulation: an explicit f32
                # astype materialized two full-volume f32 temps per tap
                # (the sole cause of a 25 GB HBM OOM at 224x304x304).
                rows.append(
                    jnp.einsum(
                        "bdhwi,bdhwo->io", xs, g,
                        preferred_element_type=jnp.float32,
                    )
                )
            taps.append(jnp.stack(rows))
    dw = jnp.stack(taps).reshape(kernel.shape).astype(kernel.dtype)
    return dx.astype(x.dtype), dw


conv3d_pallas.defvjp(_conv3d_pallas_fwd, _conv3d_pallas_bwd)


@jax.custom_vjp
def _packed_core_dw(xq: jax.Array, pw: jax.Array) -> jax.Array:
    """The packed-space conv with a hand-rolled weight-grad.

    Forward and data-grad are XLA convs (already sane in packed space);
    the WEIGHT grad replaces XLA's conv-backward — which at batch-1
    full-resolution shapes lowers to slow large-window reduce
    formulations (~130 ms/step in the 224x304x304 profile, BASELINE.md
    round 4) — with k*k*3 shifted MXU dot_generals: each packed tap is
    ``x_window^T @ g`` over the flattened (B,D,H,wp) rows, f32
    accumulation.
    """
    return jax.lax.conv_general_dilated(
        xq, pw, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _packed_core_dw_fwd(xq, pw):
    return _packed_core_dw(xq, pw), (xq, pw)


def _packed_core_dw_bwd(res, g):
    xq, pw = res
    k0, k1, k2 = pw.shape[0], pw.shape[1], pw.shape[2]
    b, d, hh, wp, ci = xq.shape
    co = g.shape[-1]
    # data grad: conv with the spatially-flipped, in/out-swapped kernel
    # (the standard dgrad identity for SAME odd-k stride-1)
    dxq = jax.lax.conv_general_dilated(
        g, jnp.flip(pw, (0, 1, 2)).swapaxes(3, 4), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(xq.dtype)
    # weight grad: per-tap dot_generals
    pa, pb_, pt = k0 // 2, k1 // 2, k2 // 2
    xp = jnp.pad(
        xq, ((0, 0), (pa, pa), (pb_, pb_), (pt, pt), (0, 0))
    )
    g2 = g.reshape(-1, co)
    taps = []
    for a in range(k0):
        for bb in range(k1):
            for t in range(k2):
                sl = jax.lax.slice(
                    xp, (0, a, bb, t, 0), (b, a + d, bb + hh, t + wp, ci)
                )
                taps.append(jax.lax.dot_general(
                    sl.reshape(-1, ci), g2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
    dpw = jnp.stack(taps).reshape(k0, k1, k2, ci, co).astype(pw.dtype)
    return dxq, dpw


_packed_core_dw.defvjp(_packed_core_dw_fwd, _packed_core_dw_bwd)


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
    if _CONV_IMPL == "xla_dw":
        y = _packed_core_dw(xq, pw)
    else:
        y = jax.lax.conv_general_dilated(
            xq, pw, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    return y.reshape(b, d, hh, ww, cout)
