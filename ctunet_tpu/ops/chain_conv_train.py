"""Training conv on the Pallas chain kernel: custom VJP, all-MXU backward.

The training path's XLA packed convs run far off roofline at full
resolution (HLO-profiled, BASELINE.md round 4: ~25 ms per forward conv and
~58 ms per weight-grad conv at 224x304x304 vs a ~2-5 ms MXU roofline; the
Pallas chain conv serves the same forward in ~10 ms). This module brings
that kernel to the differentiable path (``conv_impl = "chain"``):

- **forward**: ``pack_weights_jax`` (a linear, differentiable transform of
  the raw (k,k,k,Ci,Co) kernel) -> :func:`ops.pallas.conv3d.conv3d_chain`
  (ring-cached, double-buffered DMA; relu/bias OFF — BN/bias/ReLU stay
  outside as cheap elementwise XLA);
- **dL/dx**: the identity ``dx = conv(g, flip(W).swapaxes(i,o))`` for
  SAME stride-1 convs, again through the chain kernel;
- **dL/dW**: 27 tap-shifted whole-volume contractions in CHAIN layout —
  ``dw_packed[tap] = x_chain_shifted^T @ g_chain`` as plain
  ``dot_general``s with f32 accumulation (MXU-shaped: (Ci_p x D*R) @
  (D*R x Co_p)), then the PACKED kernel gradient is pulled back through
  ``pack_weights_jax``'s transpose via ``jax.vjp`` (it is linear, so this
  is exact).

Halo semantics: ``to_chain`` zero-pads one plane/row of halo in D/H and
``wpad - wp >= 1`` zero columns between H-rows serve as the W halo, so
tap-shifted reads land on exact zeros; the dw contraction pads the flat
row axis with one extra ``wpad`` of zeros per side for the same reason.

Reference behavior: the conv inside every UNet block
(``ctunet/pytorch/models.py:9-49``); this is a speed-of-light-path
reformulation, numerically the same conv (modulo f32 summation order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .packed_conv import (
    _flip_swap,
    choose_train_pack,
    pack_pad_jax,
    pack_weights_jax,
    packed_conv3d,
)
from .pallas import conv3d as pc
from .pallas.conv3d import _round_up


def _chain_conv_one(v: jax.Array, kernel: jax.Array, pack: int,
                    interpret: bool) -> jax.Array:
    """(D, H, W, Ci) -> (D, H, W, Co) through the chain kernel."""
    d, hh, ww, cin = v.shape
    cout = kernel.shape[-1]
    pw = pack_pad_jax(kernel, pack, v.dtype)
    pb = jnp.zeros((1, pw.shape[2]), jnp.float32)
    wp = ww // pack
    xc = pc.to_chain(v.reshape(d, hh, wp, pack * cin), pack)
    yc = pc.conv3d_chain(
        xc, pw, pb, hh, wp, relu=False, interpret=interpret,
        out_dtype=v.dtype,
    )
    yp = pc.from_chain(yc, hh, wp, pack * cout)
    return pc.unpack_output(yp, pack, cout)


def _supported(x, kernel) -> int:
    """Return the pack to use, or 0 when the chain kernel doesn't apply.

    On CPU the kernels run in (slow) interpret mode — acceptable only
    because ``conv_impl = "chain"`` is an explicit opt-in; the default
    training impl stays the packed XLA conv.
    """
    if kernel.shape[0] != 3:
        return 0
    b, d, hh, ww, cin = x.shape
    cout = kernel.shape[-1]
    pack = choose_train_pack(ww, cin, k=3)
    if pack <= 1:
        return 0
    for c in (cin, cout):
        if _round_up(pack * c, 128) > 512:
            return 0
    # chain tiling needs an H tile dividing H (guaranteed: 1 divides H)
    return pack


@jax.custom_vjp
def conv3d_chain_train(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """SAME stride-1 k3 conv, Pallas chain forward + all-MXU hand VJP."""
    return _fwd_value(x, kernel)


def _fwd_value(x, kernel):
    pack = _supported(x, kernel)
    if pack == 0:
        return packed_conv3d(x, kernel)
    interpret = jax.default_backend() == "cpu"
    outs = [
        _chain_conv_one(x[i], kernel, pack, interpret)
        for i in range(x.shape[0])
    ]
    return outs[0][None] if len(outs) == 1 else jnp.stack(outs)


def _fwd_rule(x, kernel):
    return _fwd_value(x, kernel), (x, kernel)


def _dw_chain(x: jax.Array, g: jax.Array, pack: int) -> jax.Array:
    """dL/dW via 27 tap-shifted chain-layout contractions (one sample)."""
    d, hh, ww, cin = x.shape
    cout = g.shape[-1]
    wp = ww // pack
    xc = pc.to_chain(
        x.reshape(d, hh, wp, pack * cin), pack
    )  # (D+2, R, cin_p)
    gc = pc.to_chain(g.reshape(d, hh, wp, pack * cout), pack)
    return dw_chain_packed(xc, gc, hh, pack, cin, cout)


def dw_chain_packed(xc: jax.Array, gc: jax.Array, hh: int, pack: int,
                    cin: int, cout: int) -> jax.Array:
    """Packed-kernel gradient from CHAIN-layout operands.

    ``gc`` must carry exact zeros on halo rows/pad columns (to_chain
    guarantees it; chain-resident callers enforce it with a mask multiply,
    which also kills the spurious halo gradients)."""
    dp2 = xc.shape[0]
    d = dp2 - 2
    wpad = xc.shape[1] // (hh + 2)
    rows = xc.shape[1]
    # the extreme tap shift is -(wpad + 1): pad wpad + 8 zeros per side so
    # every dynamic_slice start stays in range (dynamic_slice CLAMPS
    # out-of-range starts, which silently mis-shifts the corner taps)
    lead = wpad + 8
    xp = jnp.pad(xc, ((0, 0), (lead, lead), (0, 0)))
    gs = gc[1 : 1 + d].reshape(d * rows, -1)
    taps = []
    for dz in range(3):
        xz = xp[dz : dz + d]
        for dy in range(3):
            for t in range(3):
                shift = (dy - 1) * wpad + (t - 1) + lead
                xs = jax.lax.dynamic_slice(
                    xz, (0, shift, 0), (d, rows, xz.shape[2])
                ).reshape(d * rows, -1)
                taps.append(
                    jax.lax.dot_general(
                        xs, gs, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
    dwp = jnp.stack(taps)  # (27, cin_p, cout_p)
    return dwp[:, : pack * cin, : pack * cout].reshape(
        3, 3, 3, pack * cin, pack * cout
    )


def _bwd_rule(res, g):
    x, kernel = res
    pack = _supported(x, kernel)
    if pack == 0:
        # mirror packed_conv3d's autodiff
        _, vjp = jax.vjp(packed_conv3d, x, kernel)
        return vjp(g)
    interpret = jax.default_backend() == "cpu"
    # dx: conv of g with the flipped, channel-swapped kernel
    kt = _flip_swap(kernel).astype(g.dtype)
    dxs = [
        _chain_conv_one(g[i], kt, pack, interpret)
        for i in range(g.shape[0])
    ]
    dx = dxs[0][None] if len(dxs) == 1 else jnp.stack(dxs)
    # dw: packed-kernel grads, pulled back through the linear packing
    dwp = sum(
        _dw_chain(x[i], g[i], pack) for i in range(x.shape[0])
    )
    _, pack_vjp = jax.vjp(
        lambda kk: pack_weights_jax(kk, pack).astype(jnp.float32), kernel
    )
    (dw,) = pack_vjp(dwp)
    return dx.astype(x.dtype), dw.astype(kernel.dtype)


conv3d_chain_train.defvjp(_fwd_rule, _bwd_rule)
