"""One-hot / argmax codecs (channels-last).

TPU-native replacements for the reference's label codecs:
``one_hot_encoding`` (``ctunet/utilities.py:73-100``), ``hard_segm_from_tensor``
(``utilities.py:103-124``) and the torch ``one_hot(...).movedim(...)`` calls
in the datasets (``ctunet/pytorch/datasets.py:108-110,209-214``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot(labels: jax.Array, num_classes: int = 2, dtype=jnp.float32) -> jax.Array:
    """Integer labels (...,) -> one-hot (..., C), channels-last."""
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=dtype)


def hard_segm(prob_map: jax.Array, keep_dims: bool = False) -> jax.Array:
    """Argmax hard segmentation over the trailing channel axis.

    Channels-last analog of ``hard_segm_from_tensor``
    (``ctunet/utilities.py:103-124``): (B, D, H, W, C) -> (B, D, H, W) float,
    or (D, H, W, C) -> (D, H, W); ``keep_dims`` re-appends a size-1 channel.
    """
    seg = jnp.argmax(prob_map, axis=-1).astype(jnp.float32)
    if keep_dims:
        seg = seg[..., None]
    return seg
