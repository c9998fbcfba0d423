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


# ---------------------------------------------------------------------------
# Packed-layout variant: the packed-RESIDENT training graph's conv
# (models/packed_resident.py) on the SPLIT-TAP chain kernel.
#
# The per-op ``conv3d_chain_train`` above was measured a net loss in the
# STANDARD training graph: its to_chain/from_chain conversions start from
# standard layout and cost ~470 ms/step at full res (BASELINE.md). In the
# packed-resident graph the activations already live in the W-packed
# layout, so the conversion is a pad+reshape of a lane-dense tensor
# (~1 ms/conv at 224x304x304) while the conv itself moves from the
# block-banded XLA form (~30 ms for a full-res forward conv — structural-
# zero MACs, the same disease VERDICT r2 item 1 diagnosed for serving) to
# the split-tap ring kernel (~9 ms bf16). Forward and input-gradient run
# the split kernel; the weight-gradient defaults to XLA's native conv
# wgrad on the packed operands (measured best in round 2) with the
# all-MXU chain-dot form selectable for experiments.
# ---------------------------------------------------------------------------

import numpy as np

_WGRAD_MODE = "xla"  # "xla" (native conv wgrad) | "chain" (27 tap dots)


def set_wgrad_mode(mode: str) -> None:
    """Weight-grad route for the packed chain conv (trace-time)."""
    global _WGRAD_MODE
    assert mode in ("xla", "chain"), mode
    _WGRAD_MODE = mode


def pack_weights_split_jax(w: jax.Array, pack: int, dtype):
    """Traced-value analog of :func:`ops.pallas.conv3d.pack_weights_split`
    (that one is numpy-only): split-tap packing of a (3,3,3,Cin,Cout)
    kernel as a linear function of the raw weights, so it can run on
    values produced inside a jitted training step. Exactness vs the numpy
    packer is tested in tests/test_chain_conv_train.py."""
    cin, cout = int(w.shape[3]), int(w.shape[4])
    kp = _round_up(pack * cin, 128)
    kc = _round_up(6 * cin, 128)
    cout_p = _round_up(pack * cout, 128)
    w = w.astype(dtype)
    # in-block taps: main[dz*3+dy] = sum_dx kron(E_dx, w[dz,dy,dx]) with
    # E_dx[si, s] = [si == s + dx - 1] (the W-shift placement matrix)
    shifts = []
    for dx in range(3):
        e = np.zeros((pack, pack), np.float32)
        for s in range(pack):
            si = s + dx - 1
            if 0 <= si < pack:
                e[si, s] = 1.0
        shifts.append(e)
    mains = []
    for dz in range(3):
        for dy in range(3):
            m = sum(
                jnp.kron(jnp.asarray(e, dtype), w[dz, dy, dx])
                for dx, e in enumerate(shifts)
            )
            mains.append(jnp.pad(
                m, ((0, kp - pack * cin), (0, cout_p - pack * cout))
            ))
    main = jnp.stack(mains)
    # boundary taps: corr[dz] rows (2dy)*cin hold w[dz,dy,0] -> output
    # position 0; rows (2dy+1)*cin hold w[dz,dy,2] -> position pack-1
    corrs = []
    for dz in range(3):
        blocks = []
        for dy in range(3):
            blocks.append(jnp.pad(
                w[dz, dy, 0], ((0, 0), (0, (pack - 1) * cout))
            ))
            blocks.append(jnp.pad(
                w[dz, dy, 2], ((0, 0), ((pack - 1) * cout, 0))
            ))
        c = jnp.concatenate(blocks, 0)
        corrs.append(jnp.pad(
            c, ((0, kc - 6 * cin), (0, cout_p - pack * cout))
        ))
    return main, jnp.stack(corrs)


_MIN_PACK = 2  # chain kernel only where pack >= this (trace-time knob)


def set_chain_min_pack(n: int) -> None:
    """Restrict the packed chain conv to levels with pack >= ``n``.

    The kernel's advantage is concentrated at the FULL-RES levels (pack
    16: fwd ~9 ms vs ~30 ms XLA at 224x304x304); at the deep, tiny levels
    the to_chain/from_chain conversions and launch overhead outweigh the
    kernel (full-chain measured 605 ms/step vs 581 all-XLA, no-remat).
    ``set_chain_min_pack(16)`` applies the kernel only where it wins."""
    global _MIN_PACK
    _MIN_PACK = int(n)


def packed_chain_supported(xq: jax.Array, kernel: jax.Array,
                           pack: int) -> bool:
    """Static gate: can the split chain kernel serve this packed conv?"""
    if tuple(kernel.shape[:3]) != (3, 3, 3):
        return False
    cin, cout = int(kernel.shape[3]), int(kernel.shape[4])
    if pack < max(2, _MIN_PACK) or int(xq.shape[-1]) != pack * cin:
        return False
    # (No H-dimension constraint: the kernel runs h_tile=1, which divides
    # any H.)
    return all(_round_up(pack * c, 128) <= 512 for c in (cin, cout))


def _split_conv_packed_one(v: jax.Array, kernel: jax.Array, pack: int,
                           interpret: bool) -> jax.Array:
    """(D, H, wp, pack*Ci) packed -> (D, H, wp, pack*Co) packed, via the
    split-tap chain kernel (relu/bias off — BN+ReLU stay outside)."""
    d, hh, wp, _ = v.shape
    cin, cout = int(kernel.shape[3]), int(kernel.shape[4])
    wm, wc = pack_weights_split_jax(kernel, pack, v.dtype)
    pb = jnp.zeros((1, wm.shape[2]), jnp.float32)
    xc = pc.to_chain(v, pack)
    # Tighter VMEM budget than the engine default: the training graph hits
    # shapes the engine never compiles standalone (e.g. the full-res 28->7
    # decoder conv at cin_p=512 — the engine fuses it into the half-res
    # upsample+conv), and at those shapes Mosaic's real stack exceeds the
    # picker's scratch estimate (measured: est 11.4 MB -> actual 16.01 MB
    # at ht=38, 12 KB over the 16 MB scoped-vmem limit). 7 MB estimated
    # keeps the worst measured shape at ~8.5 MB actual.
    wpad = xc.shape[1] // (hh + 2)
    h_tile = pc._pick_chain_h_tile_split(
        hh, wpad, xc.shape[-1], wc.shape[-2], wm.shape[2], quant=False,
        vmem_budget=7 * 2**20,
    )
    yc = pc.conv3d_chain_split(
        xc, wm, wc, pb, hh, wp, pack, cin, relu=False, h_tile=h_tile,
        interpret=interpret, out_dtype=v.dtype,
    )
    return pc.from_chain(yc, hh, wp, pack * cout)


@jax.custom_vjp
def conv3d_chain_train_packed(xq: jax.Array, kernel: jax.Array) -> jax.Array:
    """SAME stride-1 k3 conv on packed-layout activations
    ``(B, D, H, W/p, p*Cin)`` with a raw ``(3,3,3,Cin,Cout)`` kernel:
    split-tap chain forward + hand VJP (split-kernel dgrad, XLA wgrad).

    Callers must pre-check :func:`packed_chain_supported`; the pack is
    inferred from the lane count."""
    return _fwd_packed_value(xq, kernel)


def _infer_pack(xq, kernel) -> int:
    return int(xq.shape[-1]) // int(kernel.shape[3])


def _fwd_packed_value(xq, kernel):
    pack = _infer_pack(xq, kernel)
    interpret = jax.default_backend() == "cpu"
    outs = [
        _split_conv_packed_one(xq[i], kernel, pack, interpret)
        for i in range(xq.shape[0])
    ]
    return outs[0][None] if len(outs) == 1 else jnp.stack(outs)


def _fwd_packed_rule(xq, kernel):
    return _fwd_packed_value(xq, kernel), (xq, kernel)


def _xla_conv_packed(xq, kernel, pack):
    pw = pack_weights_jax(kernel, pack).astype(xq.dtype)
    return jax.lax.conv_general_dilated(
        xq, pw, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _bwd_packed_rule(res, g):
    xq, kernel = res
    pack = _infer_pack(xq, kernel)
    interpret = jax.default_backend() == "cpu"
    # dL/dx: SAME stride-1 conv of g with the flipped, channel-swapped
    # kernel — the same split kernel, so the dgrad also skips the
    # structural-zero MACs
    kt = _flip_swap(kernel).astype(g.dtype)
    dxs = [
        _split_conv_packed_one(g[i], kt, pack, interpret)
        for i in range(g.shape[0])
    ]
    dx = dxs[0][None] if len(dxs) == 1 else jnp.stack(dxs)
    if _WGRAD_MODE == "chain":
        cin, cout = int(kernel.shape[3]), int(kernel.shape[4])
        hh = int(xq.shape[2])
        dwp = sum(
            dw_chain_packed(
                pc.to_chain(xq[i], pack), pc.to_chain(g[i], pack),
                hh, pack, cin, cout,
            )
            for i in range(xq.shape[0])
        )
        _, pack_vjp = jax.vjp(
            lambda kk: pack_weights_jax(kk, pack).astype(jnp.float32),
            kernel,
        )
        (dw,) = pack_vjp(dwp)
    else:
        # XLA's native conv weight-grad on the packed operands (measured
        # faster than dot-general forms in round 2), via a weights-only
        # vjp of the packed XLA conv — including the linear pullback
        # through the packing transform
        _, vjp = jax.vjp(lambda kk: _xla_conv_packed(xq, kk, pack), kernel)
        (dw,) = vjp(g.astype(xq.dtype))
    return dx.astype(xq.dtype), dw.astype(kernel.dtype)


conv3d_chain_train_packed.defvjp(_fwd_packed_rule, _bwd_packed_rule)
