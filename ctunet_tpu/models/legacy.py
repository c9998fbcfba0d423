"""Legacy fixed 4-level U-Net (challenge-submission reproducibility).

Parity target: ``recAE_v2_fixed`` (``ctunet/pytorch/models.py:441-538``) and
``UNet4_2IC`` (``models.py:541-557``). Unlike the generic family:

- kernel 5, padding 2;
- conv layers use bias (torch ``nn.Conv3d`` default in ``down_block_cr`` /
  ``up_block_cr``, ``models.py:393-438``);
- the center block IS in the data path (``models.py:522-526``) — the legacy
  model has a real bottleneck, unlike the generic UNet (quirk Q1);
- softmax head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import register_model
from .unet import ConvUnit, _maxpool

Dtype = Any


class _DownBlockCR(nn.Module):
    """``down_block_cr`` (``models.py:393-411``): 2x (conv k5 p2 + BN + ReLU)
    with conv bias, + Dropout3d."""

    out_c: int
    kern_s: int = 5
    pad: int = 2
    dropout_p: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for j in range(2):
            x = ConvUnit(
                self.out_c, self.kern_s, self.pad, use_bias=True,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"unit{j}",
            )(x, train)
        if self.dropout_p > 0:
            x = nn.Dropout(
                self.dropout_p, broadcast_dims=(1, 2, 3),
                deterministic=not train,
            )(x)
        return x


class _UpBlockCR(nn.Module):
    """``up_block_cr`` (``models.py:414-438``): ConvTranspose(k2,s2) then the
    two conv units."""

    out_c: int
    kern_s_conv: int = 5
    kern_s_uconv: int = 2
    pad: int = 2
    stride_uc: int = 2
    dropout_p: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            x.shape[-1],
            (self.kern_s_uconv,) * 3,
            strides=(self.stride_uc,) * 3,
            padding="VALID",
            transpose_kernel=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="upconv",
        )(x)
        for j in range(2):
            x = ConvUnit(
                self.out_c, self.kern_s_conv, self.pad, use_bias=True,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"unit{j}",
            )(x, train)
        if self.dropout_p > 0:
            x = nn.Dropout(
                self.dropout_p, broadcast_dims=(1, 2, 3),
                deterministic=not train,
            )(x)
        return x


@register_model("recAE_v2_fixed")
class RecAEv2Fixed(nn.Module):
    """Hand-unrolled 4-level U-Net (``models.py:441-538``).

    Fully convolutional; input spatial dims must be multiples of 16.
    """

    input_channels: int = 1
    i_size: int = 8
    kern_sz_conv: int = 5
    padding: int = 2
    dropout_p: float = 0.0
    use_checkpoint: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fms = [self.i_size * (2 ** n) for n in range(5)]
        common = dict(
            kern_s=self.kern_sz_conv, pad=self.padding,
            dropout_p=self.dropout_p, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        down_cls = (
            nn.remat(_DownBlockCR, static_argnums=(2,))
            if self.use_checkpoint else _DownBlockCR
        )
        up_cls = (
            nn.remat(_UpBlockCR, static_argnums=(2,))
            if self.use_checkpoint else _UpBlockCR
        )

        downs = []
        h = x
        for i in range(4):
            di = down_cls(fms[i], name=f"dblock{i + 1}", **common)(h, train)
            downs.append(di)
            h = _maxpool(di)

        # Real bottleneck — lives in the data path here (cf. quirk Q1).
        h = down_cls(fms[4], name="cblock_center", **common)(h, train)

        up_common = dict(
            kern_s_conv=self.kern_sz_conv, pad=self.padding,
            dropout_p=self.dropout_p, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        for i in range(4):
            h = up_cls(fms[3 - i], name=f"ublock{i + 1}", **up_common)(
                h, train
            )
            h = jnp.concatenate([h, downs[3 - i]], axis=-1)

        lc = nn.Conv(
            2, (1, 1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="last_conv",
        )(h)
        return jax.nn.softmax(lc, axis=-1)


@register_model("UNet4_2IC")
class UNet4_2IC(RecAEv2Fixed):
    """Legacy model with 2 input channels and i_size=7
    (``models.py:541-557``)."""

    input_channels: int = 2
    i_size: int = 7
