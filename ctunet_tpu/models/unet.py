"""Generic 3D U-Net family (flax.linen, channels-last, TPU-first).

Re-designs the reference model zoo (``ctunet/pytorch/models.py:9-261``) as
pure functional flax modules:

- layout is channels-LAST ``(B, D, H, W, C)`` — XLA's native conv layout on
  TPU, keeping the MXU fed without transposes (the reference is NCDHW);
- compute in a configurable ``dtype`` (bf16 by default at call sites) with
  float32 params and float32 BatchNorm statistics;
- activation rematerialization via ``nn.remat`` per block (the reference
  wraps every block in ``torch.utils.checkpoint``, ``models.py:232-256``);
- the *effective* reference graph is reproduced exactly, including quirk Q1
  (SURVEY.md §5): when ``fc_layer is None`` — every shipped variant — the
  computed center block is discarded (``models.py:241``) and the decoder
  consumes the last pooled feature map directly. We therefore do not create
  the dead center-block parameters at all; the torch checkpoint port drops
  the corresponding dead weights.

Block structure parity (``models.py:9-49``):
  down:  Conv(k, s=1, pad, no bias) + BN + ReLU, x2, + channel Dropout
  up:    ConvTranspose(k=2, s=2, bias) then the same two conv units
BatchNorm matches torch defaults: eps=1e-5, effective momentum 0.9.
ConvTranspose uses ``transpose_kernel=True`` (gradient-of-conv semantics) so
torch ``ConvTranspose3d`` weights port bit-exactly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _pad_tuple(pad: int) -> Tuple[Tuple[int, int], ...]:
    return ((pad, pad),) * 3


class BatchNorm(nn.Module):
    """BatchNorm with f32 statistics but compute-dtype data path.

    Same parameter/stats structure as ``nn.BatchNorm`` (scale/bias params,
    mean/var batch_stats) so checkpoints are interchangeable, but the
    normalization itself runs in the activation dtype — only the (tiny)
    statistics reductions touch f32. With ``nn.BatchNorm(dtype=f32)`` every
    block activation (and remat residual) was f32 and the 224x304x304
    training step needed >50GB HBM.

    Stats semantics match torch BatchNorm3d for normalization (biased batch
    variance, eps=1e-5) and flax for the running average (torch stores the
    unbiased variance in ``running_var``; a documented delta — eval-mode
    checkpoint parity is unaffected since loaded stats are used as-is).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (c,),
            jnp.float32,
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (c,),
            jnp.float32,
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class PackedConv(nn.Module):
    """Drop-in Conv3D (SAME, stride 1) computed as a W-packed conv.

    Same parameter structure as ``nn.Conv`` (kernel (k,k,k,Cin,Cout)
    + optional bias) so checkpoints/ports are unaffected; the packing is an
    in-graph linear transform (see ``ops/packed_conv.py``) that sidesteps
    XLA's thin-channel 3D-conv pathologies forward AND backward.
    """

    features: int
    kernel: int = 3
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.packed_conv import (
            conv3d_pallas,
            get_conv_impl,
            packed_conv3d,
        )

        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel,) * 3 + (cin, self.features),
            self.param_dtype,
        )
        batched = x.ndim == 5
        xb = x if batched else x[None]
        impl = get_conv_impl()
        if impl == "chain":
            from ..ops.chain_conv_train import conv3d_chain_train as conv
        else:
            conv = conv3d_pallas if impl == "pallas" else packed_conv3d
        y = conv(xb.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(y.dtype)
        return y if batched else y[0]


class ConvUnit(nn.Module):
    """Conv3D + BatchNorm + ReLU (one torch ``Conv3d+BatchNorm3d+ReLU``)."""

    features: int
    kernel: int = 3
    pad: int = 1
    stride: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 1 and self.pad == self.kernel // 2:
            x = PackedConv(
                self.features,
                self.kernel,
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
        else:  # general case (unused by the shipped variants)
            x = nn.Conv(
                self.features,
                (self.kernel,) * 3,
                strides=(self.stride,) * 3,
                padding=_pad_tuple(self.pad),
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class _ConvT2x2(nn.Module):
    """k=2 s=2 VALID transposed conv as einsum + depth-to-space.

    Parameter-identical to ``nn.ConvTranspose(features, (2,2,2),
    strides=(2,2,2), padding='VALID', transpose_kernel=True, use_bias=
    True)`` — kernel (2,2,2,O,I), same initializer — so torch
    ``ConvTranspose3d`` weights port bit-exactly and existing checkpoints
    load unchanged. With stride == kernel size the output decomposes
    exactly (no overlap): ``out[2z+a,2y+b,2x+c,o] = sum_i x[z,y,x,i] *
    k[a,b,c,o,i]`` (no spatial flip; verified against flax in
    tests/test_models.py::test_convt2x2_matches_flax_convtranspose). The
    einsum's forward AND backward are plain MXU contractions — XLA's
    transposed-conv lowering instead emitted full-volume layout copies and
    a `reverse` in the backward (~100 ms/step at 224x304x304)."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, 2, self.features, cin),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,),
            self.param_dtype,
        )
        k = kernel.astype(self.dtype)
        xb = x if x.ndim == 5 else x[None]
        y = jnp.einsum("nzyxi,abcoi->nzaybxco", xb.astype(self.dtype), k)
        bsz, d, _, hh, _, ww, _, co = y.shape
        y = y.reshape(bsz, d * 2, hh * 2, ww * 2, co)
        y = y + bias.astype(y.dtype)
        return y if x.ndim == 5 else y[0]


class UNetBlock(nn.Module):
    """Two conv units; up blocks prepend a stride-2 transposed conv.

    Parity target: ``UNetBlock`` (``models.py:9-49``).
    """

    out_c: int
    kern_s_conv: int = 5
    kern_s_uconv: int = 2
    pad: int = 2
    stride_c: int = 1
    stride_upc: int = 2
    dropout_p: float = 0.0
    up_block: bool = False
    conv_bias: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.up_block:
            if self.kern_s_uconv == 2 and self.stride_upc == 2:
                # Non-overlapping k2s2: one einsum + depth-to-space.
                # Param-compatible with nn.ConvTranspose(transpose_kernel=
                # True) but avoids XLA's transposed-conv lowering, whose
                # full-res fwd+bwd at 224x304x304 spends ~100 ms/step in
                # layout copies and a whole-volume `reverse` (HLO-profiled;
                # BASELINE.md round 4).
                x = _ConvT2x2(
                    x.shape[-1],
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="upconv",
                )(x)
            else:
                x = nn.ConvTranspose(
                    x.shape[-1],
                    (self.kern_s_uconv,) * 3,
                    strides=(self.stride_upc,) * 3,
                    padding="VALID",
                    transpose_kernel=True,
                    use_bias=True,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="upconv",
                )(x)
        for j in range(2):
            x = ConvUnit(
                self.out_c,
                self.kern_s_conv,
                self.pad,
                self.stride_c,
                use_bias=self.conv_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"unit{j}",
            )(x, train)
        if self.dropout_p > 0:
            # torch Dropout3d drops whole channels.
            x = nn.Dropout(
                self.dropout_p,
                broadcast_dims=(1, 2, 3),
                deterministic=not train,
            )(x)
        return x


class ResidualBlock(nn.Module):
    """Residual variant (``models.py:100-155``): block(x) + skip(x), ReLU."""

    out_c: int
    kern_sz_conv: int = 5
    kern_s_uconv: int = 2
    padding: int = 1
    stride_conv: int = 1
    stride_upconv: int = 2
    dropout_p: float = 0.0
    up_block: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        up = x
        if self.up_block:
            up = nn.ConvTranspose(
                x.shape[-1],
                (self.kern_s_uconv,) * 3,
                strides=(self.stride_upconv,) * 3,
                padding="VALID",
                transpose_kernel=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="upconv",
            )(x)
        h = up
        for j in range(2):
            h = ConvUnit(
                self.out_c,
                self.kern_sz_conv,
                self.padding,
                self.stride_conv,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"unit{j}",
            )(h, train)
        if self.dropout_p > 0:
            h = nn.Dropout(
                self.dropout_p, broadcast_dims=(1, 2, 3),
                deterministic=not train,
            )(h)

        if x.shape[-1] != self.out_c:
            sk = x
            if self.up_block:
                sk = nn.ConvTranspose(
                    x.shape[-1],
                    (self.kern_s_uconv,) * 3,
                    strides=(self.stride_upconv,) * 3,
                    padding="VALID",
                    transpose_kernel=True,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="skip_upconv",
                )(sk)
            sk = nn.Conv(
                self.out_c,
                (1, 1, 1),
                strides=(self.stride_conv,) * 3,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="skip_conv",
            )(sk)
            identity = BatchNorm(name="skip_bn")(
                sk, use_running_average=not train
            )
        else:
            # Equal channels: identity is the (upsampled) input. NOTE the
            # reference's ResidualBlock (models.py:145-155) would crash here
            # for up blocks (identity never upsampled) — dead code there
            # (all residual variants are commented out); we implement the
            # documented intent.
            identity = up

        return nn.relu(h + identity)


class CenterBlock(nn.Module):
    """FC bottleneck (``models.py:52-97``). Only instantiated when
    ``fc_layer`` is set — the conv branch is dead in every shipped variant
    (quirk Q1) and is not reproduced."""

    fc_sizes: Tuple[int, int]
    dropout_p: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ifc, cfc = self.fc_sizes
        b = x.shape[0]
        shape = x.shape
        h = x.reshape(b, -1)
        h = nn.Dense(cfc, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc0")(h)
        h = nn.Dense(ifc, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(h)
        h = nn.leaky_relu(h)
        if self.dropout_p > 0:
            h = nn.Dropout(self.dropout_p, deterministic=not train)(h)
        return h.reshape(shape)


class _SplitConv1x1(nn.Module):
    """1x1x1 conv over an IMPLICIT channel concat of two tensors.

    Parameter structure is identical to ``nn.Conv(features, (1,1,1))`` over
    the materialized concat (kernel (1,1,1,Ca+Cb,F) + bias), so checkpoints
    and torch ports are unaffected; the concat itself never exists.
    """

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, 1, ca + cb, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        k = kernel[0, 0, 0].astype(self.dtype)
        return (
            a.astype(self.dtype) @ k[:ca]
            + b.astype(self.dtype) @ k[ca:]
            + bias.astype(self.dtype)
        )


def _maxpool2_fwd_value(x):
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4, 6))


def _repeat2(t):
    """Nearest-neighbor 2x upsample of (B, D, H, W, C) via broadcasting."""
    b, d, h, w, c = t.shape
    t = jnp.broadcast_to(
        t[:, :, None, :, None, :, None, :], (b, d, 2, h, 2, w, 2, c)
    )
    return t.reshape(b, 2 * d, 2 * h, 2 * w, c)


def _pool_pack(w: int, c: int, target: int = 128) -> int:
    """Largest even W-pack dividing ``w`` with ``pack*c <= target`` lanes
    (even so the W-pool halving stays inside a pack block)."""
    p = 1
    for cand in (2, 4, 8, 16, 32):
        if w % cand == 0 and cand * c <= target:
            p = cand
    return p


def _repeat2_packed(t: jax.Array, p: int, c: int) -> jax.Array:
    """NN 2x upsample of a W-packed (B, D, H, wp, (p/2)*C) tensor to
    (B, 2D, 2H, wp, p*C): D/H repeat by broadcast, W repeat in lane
    space (each of the p/2 W positions duplicates in place)."""
    b, d, h, wp, _ = t.shape
    t = t.reshape(b, d, h, wp, p // 2, c)
    t = jnp.broadcast_to(
        t[:, :, None, :, None, :, :, None, :],
        (b, d, 2, h, 2, wp, p // 2, 2, c),
    )
    return t.reshape(b, 2 * d, 2 * h, wp, p * c)


@jax.custom_vjp
def _maxpool2(x):
    return _maxpool2_fwd_value(x)


def _maxpool2_fwd(x):
    y = _maxpool2_fwd_value(x)
    return y, (x, y)


def _maxpool2_bwd(res, g):
    x, y = res
    # Layout-friendly backward: compare against the 2x-upsampled max and
    # route the (upsampled) gradient to matching elements, split evenly
    # among ties (matching jnp.max's subgradient; ties are common in bf16
    # activations). All tensors stay standard 5D channels-last — jnp.max's
    # default VJP materialized 8D broadcast temps that XLA laid out at
    # (2,128) tiles, costing ~97 ms of the full-res train step.
    b, d, h, w, c = x.shape
    p = _pool_pack(w, c)
    if p > 1:
        # W-packed backward: all full-res temps carry p*C lanes (~128)
        # instead of C (7/14 at full res, which TPU pads 18x per tile —
        # the remaining ~75 ms of thin-layout broadcasts in the 224^3
        # step). W-pairs sit INSIDE a pack block, so pooling W is a
        # lane-space (p/2, 2, C) max and the standard<->packed moves are
        # contiguous reshapes.
        xq = x.reshape(b, d, h, w // p, p * c)
        # eq against the upsampled max, computed packed: repeat D/H by
        # broadcast, W by lane-space repeat
        yq = y.reshape(b, d // 2, h // 2, (w // 2) // (p // 2),
                       (p // 2) * c)
        eq = (xq == _repeat2_packed(yq, p, c)).astype(jnp.float32)
        ties = eq.reshape(
            b, d // 2, 2, h // 2, 2, w // p, p // 2, 2, c
        ).sum(axis=(2, 4, 7))  # (b, d/2, h/2, w/p, p/2, c)
        gq = g.reshape(b, d // 2, h // 2, (w // 2) // (p // 2),
                       p // 2, c)
        ties = ties.reshape(gq.shape)
        gg = (gq.astype(jnp.float32) / ties).reshape(yq.shape)
        dx = (eq * _repeat2_packed(gg, p, c)).astype(x.dtype)
        return (dx.reshape(x.shape),)
    eq = (x == _repeat2(y)).astype(jnp.float32)
    ties = eq.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c).sum(
        axis=(2, 4, 6)
    )
    gg = g.astype(jnp.float32) / ties
    dx = (eq * _repeat2(gg)).astype(x.dtype)
    return (dx,)


_maxpool2.defvjp(_maxpool2_fwd, _maxpool2_bwd)


def _maxpool(x):
    """MaxPool3d(kernel=2, stride=2) (``models.py:190-191``).

    Formulated as reshape+max rather than ``nn.max_pool``: the windowed
    reduce's backward is a ``select_and_scatter`` whose operands XLA lays
    out with a 36.6x lane-padding expansion on thin channels — two 9.9 GB
    temps at 224x304x304x7, the sole reason the reference's full-res
    training config could not compile on a 16 GB chip. A custom VJP keeps
    the backward in plain 5D shapes (see ``_maxpool2_bwd``). Tie gradients
    deviate from torch's first-element routing — an inconsequential
    training-dynamics delta, documented here.
    """
    b, d, h, w, c = x.shape
    if d % 2 or h % 2 or w % 2:  # odd sizes: floor-crop like VALID pooling
        x = x[:, : d - d % 2, : h - h % 2, : w - w % 2, :]
    return _maxpool2(x)


class UNet(nn.Module):
    """Generic U-Net with the reference's channel arithmetic and effective
    forward graph (``models.py:158-261``).

    Decoder channel sizing reproduces ``models.py:208-216`` exactly; the
    encoder doubles ``i_size`` per level. ``cat=True`` concatenates skip
    features, ``cat=False`` adds them; ``use_skip_connections=False`` gives a
    plain autoencoder.
    """

    input_channels: int = 1
    out_channels: int = 2
    n_blocks: int = 4
    kern_sz_conv: int = 3
    kern_sz_upconv: int = 2
    stride_conv: int = 1
    stride_upconv: int = 2
    i_size: int = 8
    padding: int = 1
    dropout_p: float = 0.0
    use_checkpoint: bool = True
    fc_layer: Optional[Tuple[int, int]] = None
    use_skip_connections: bool = True
    apply_softmax: bool = False
    apply_sigmoid: bool = True
    cat: bool = True
    residual: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _block_cls(self):
        base = ResidualBlock if self.residual else UNetBlock
        if self.use_checkpoint:
            # Per-block activation recompute (ref: torch.utils.checkpoint).
            return nn.remat(base, static_argnums=(2,))
        return base

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = self._block_cls()
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # --- encoder -------------------------------------------------
        d = []
        h = x
        for i in range(self.n_blocks):
            c2 = self.i_size * (2 ** i)
            if self.residual:
                blk = block(
                    c2, self.kern_sz_conv, self.kern_sz_upconv, self.padding,
                    self.stride_conv, self.stride_upconv, self.dropout_p,
                    False, name=f"d{i}", **common,
                )
            else:
                blk = block(
                    c2, self.kern_sz_conv, 0, self.padding, self.stride_conv,
                    0, self.dropout_p, False, name=f"d{i}", **common,
                )
            di = blk(h, train)
            d.append(di)
            h = _maxpool(di)

        # --- bottleneck (quirk Q1: only the FC path is live) ----------
        if self.fc_layer is not None:
            h = CenterBlock(
                tuple(self.fc_layer), self.dropout_p, name="cblock", **common
            )(h, train)

        # --- decoder ---------------------------------------------------
        u = h
        last_pair = None
        for idx in range(self.n_blocks):
            i = self.n_blocks - 1 - idx  # ref loop: i = n_blocks-1 .. 0
            c2 = self.i_size * (2 ** i)
            if self.residual:
                blk = block(
                    c2, self.kern_sz_conv, self.kern_sz_upconv, self.padding,
                    self.stride_conv, self.stride_upconv, self.dropout_p,
                    True, name=f"u{idx}", **common,
                )
            else:
                blk = block(
                    c2, self.kern_sz_conv, self.kern_sz_upconv, self.padding,
                    self.stride_conv, self.stride_upconv, self.dropout_p,
                    True, name=f"u{idx}", **common,
                )
            ubl = blk(u, train)
            if self.use_skip_connections:
                if self.cat:
                    if idx == self.n_blocks - 1:
                        # Final full-resolution skip concat is never
                        # materialized: the 1x1 head conv is weight-split
                        # over the pair instead. XLA saved this concat's
                        # backward residual in a (batch, channel)-tiled
                        # layout with an 18x padding blowup (9.9 GB at
                        # 224x304x304x14), which OOMed full-res training.
                        last_pair = (ubl, d[i])
                        u = None
                    else:
                        u = jnp.concatenate([ubl, d[i]], axis=-1)
                else:
                    u = ubl + d[i]
            else:
                u = ubl

        if last_pair is not None:
            lc = _SplitConv1x1(
                self.out_channels, name="last_conv", **common
            )(*last_pair)
        else:
            lc = nn.Conv(
                self.out_channels, (1, 1, 1), use_bias=True,
                name="last_conv", **common,
            )(u)

        out = jax.nn.softmax(lc, axis=-1) if self.apply_softmax else lc
        out = jax.nn.sigmoid(out) if self.apply_sigmoid else out
        return out
