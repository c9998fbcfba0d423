"""Named model variants and double-output heads.

Parity targets: ``ctunet/pytorch/models.py:272-387`` — zero-arg configured
classes selected from configs by name. Registered in the explicit model
registry (replacing the reference's ``eval()`` dispatch, ``Model.py:485``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import register_model
from .unet import UNet

Dtype = Any


def _unet_kwargs(dtype, param_dtype, use_checkpoint):
    return dict(dtype=dtype, param_dtype=param_dtype,
                use_checkpoint=use_checkpoint)


@register_model("UNet4b2i3o")
class UNet4b2i3o(nn.Module):
    """Three-channel-output U-Net with shape priors (``models.py:272-278``):
    i_size=7, 2 inputs (skull + atlas), 3 outputs, sigmoid head."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_checkpoint: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return UNet(
            i_size=7, input_channels=2, out_channels=3, name="unet",
            **_unet_kwargs(self.dtype, self.param_dtype, self.use_checkpoint),
        )(x, train)


@register_model("UNet5b2i3o")
class UNet5b2i3o(nn.Module):
    """5-block small variant (``models.py:281-287``): i_size=4, n_blocks=5."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_checkpoint: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return UNet(
            i_size=4, input_channels=2, out_channels=3, n_blocks=5,
            name="unet",
            **_unet_kwargs(self.dtype, self.param_dtype, self.use_checkpoint),
        )(x, train)


@register_model("UNet4b1i3o")
class UNet4b1i3o(nn.Module):
    """Single-input variant without shape priors (``models.py:290-296``)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_checkpoint: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return UNet(
            i_size=7, input_channels=1, out_channels=3, name="unet",
            **_unet_kwargs(self.dtype, self.param_dtype, self.use_checkpoint),
        )(x, train)


def _double_out_head(backg_flap_fullsk):
    """Split the 3-channel output into the two 2-channel encodings
    (``models.py:317-330``): (full skull, flap).

    Expressed as two constant 3x2 channel matmuls rather than channel
    slices + concats: slice/concat over a size-3 minor dim at full volume
    resolution made XLA save backward residuals in a (batch, channel)-tiled
    layout with an 85x padding expansion — two 9.9 GB temps that alone
    OOMed the reference's full-res training config. The matmul form keeps
    standard layouts (and is algebraically identical):
      full = out @ [[1,0],[0,1],[0,1]];  flap = out @ [[0,0],[-1,1],[0,0]] + [1,0]
    """
    dt = backg_flap_fullsk.dtype
    m_full = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]], dt)
    m_flap = jnp.asarray([[0.0, 0.0], [-1.0, 1.0], [0.0, 0.0]], dt)
    b_flap = jnp.asarray([1.0, 0.0], dt)
    encoded_full_skull = backg_flap_fullsk @ m_full
    encoded_flap = backg_flap_fullsk @ m_flap + b_flap
    return encoded_full_skull, encoded_flap


@register_model("UNetSP")
class UNetSP(nn.Module):
    """U-Net with shape priors, double output (``models.py:299-330``).

    The flagship model (examples/UNetSPDO configs). Input: (B, D, H, W, 2)
    broken skull + atlas; output: two 2-channel maps (full skull, flap).
    """

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_checkpoint: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = UNet(
            i_size=7, input_channels=2, out_channels=3, name="unet",
            **_unet_kwargs(self.dtype, self.param_dtype, self.use_checkpoint),
        )(x, train)
        return _double_out_head(out)


@register_model("UNetSPSmall")
class UNetSPSmall(nn.Module):
    """Small 5-block double-output variant for 512-res inputs
    (``models.py:333-365``); unlike UNetSP it softmaxes both heads."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_checkpoint: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = UNet(
            i_size=4, input_channels=2, out_channels=3, n_blocks=5,
            name="unet",
            **_unet_kwargs(self.dtype, self.param_dtype, self.use_checkpoint),
        )(x, train)
        full, flap = _double_out_head(out)
        return (
            jax.nn.softmax(full, axis=-1),
            jax.nn.softmax(flap, axis=-1),
        )


@register_model("UNetDO")
class UNetDO(nn.Module):
    """Double output without shape priors (``models.py:368-387``)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_checkpoint: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = UNet(
            i_size=7, input_channels=1, out_channels=3, name="unet",
            **_unet_kwargs(self.dtype, self.param_dtype, self.use_checkpoint),
        )(x, train)
        return _double_out_head(out)
