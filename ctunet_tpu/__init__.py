"""ctunet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) 3D CT segmentation
framework with the capability surface of vfmatzkin/ct-unet.

Public API mirrors the reference package (``ctunet/__init__.py:1-2``):
``load_params`` parses an INI config, ``Model`` is the config-driven
trainer/predictor entry point.
"""

from .utils.config import default_params, load_params, set_cfg_params
from . import ops, registry, utils

__version__ = "0.1.0"

__all__ = [
    "Model",
    "default_params",
    "load_params",
    "set_cfg_params",
    "ops",
    "registry",
    "utils",
]


def __getattr__(name):
    # Lazy import: keep `import ctunet_tpu` light (no model/trainer deps).
    if name == "Model":
        from .trainer import Model

        return Model
    raise AttributeError(f"module 'ctunet_tpu' has no attribute {name!r}")
