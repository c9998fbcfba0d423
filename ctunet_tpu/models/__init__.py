from .. import registry
from .unet import CenterBlock, ConvUnit, ResidualBlock, UNet, UNetBlock
from .variants import (
    UNet4b1i3o,
    UNet4b2i3o,
    UNet5b2i3o,
    UNetDO,
    UNetSP,
    UNetSPSmall,
)
from .legacy import RecAEv2Fixed, UNet4_2IC


def build_model(
    name: str,
    compute_dtype="float32",
    param_dtype="float32",
    use_checkpoint: bool = True,
):
    """Instantiate a registered model by config name with the dtype policy."""
    import jax.numpy as jnp

    cls = registry.get_model(name)
    return cls(
        dtype=jnp.dtype(compute_dtype),
        param_dtype=jnp.dtype(param_dtype),
        use_checkpoint=use_checkpoint,
    )


# Number of input channels each registered model expects (atlas models: 2).
MODEL_INPUT_CHANNELS = {
    "UNet4b2i3o": 2,
    "UNet5b2i3o": 2,
    "UNet4b1i3o": 1,
    "UNetSP": 2,
    "UNetSPSmall": 2,
    "UNetDO": 1,
    "recAE_v2_fixed": 1,
    "UNet4_2IC": 2,
}

# Models whose forward returns the (full skull, flap) double output.
DOUBLE_OUTPUT_MODELS = {"UNetSP", "UNetSPSmall", "UNetDO"}

__all__ = [
    "CenterBlock",
    "ConvUnit",
    "ResidualBlock",
    "UNet",
    "UNetBlock",
    "UNet4b1i3o",
    "UNet4b2i3o",
    "UNet5b2i3o",
    "UNetDO",
    "UNetSP",
    "UNetSPSmall",
    "RecAEv2Fixed",
    "UNet4_2IC",
    "build_model",
    "MODEL_INPUT_CHANNELS",
    "DOUBLE_OUTPUT_MODELS",
]
