"""Prediction postprocessing: thresholding + largest connected component.

New capability per BASELINE.json ("postprocessing (thresholding,
largest-connected-component) also move on-device"); the reference writes raw
argmax masks with no cleanup (``ctunet/pytorch/ProblemHandler.py:116-163``).

Two implementations:
- :func:`largest_cc_device` — jit-compatible iterative label propagation
  (6-neighborhood max-flood until fixpoint under ``lax.while_loop``). Cost is
  O(component diameter) fused max-stencil sweeps; right for patch-sized
  volumes or when staying on device matters.
- :func:`largest_cc` — host scipy labeling (one pass); right for full
  volumes on the prediction-writing path, which is host-bound anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .preprocess import _cross_reduce


def threshold(volume, thr: float = 0.5):
    """Binarize a probability map."""
    return (volume >= thr).astype(jnp.float32)


def largest_cc(mask: np.ndarray) -> np.ndarray:
    """Keep the largest 6-connected foreground component (host, scipy)."""
    from scipy import ndimage

    mask = np.asarray(mask) > 0
    labels, n = ndimage.label(
        mask, structure=ndimage.generate_binary_structure(3, 1)
    )
    if n <= 1:
        return mask.astype(np.float32)
    counts = np.bincount(labels.ravel())
    counts[0] = 0
    return (labels == counts.argmax()).astype(np.float32)


@jax.jit
def largest_cc_device(mask: jax.Array) -> jax.Array:
    """Keep the largest 6-connected component (device, fixpoint flood).

    Each foreground voxel starts with a unique id; ids flood to the
    neighborhood max until no change, then the id with the largest count
    wins.
    """
    # int32 voxel ids: float32 ids collide above 2^24 voxels (a full-res
    # 224x304x304 volume is 20.7M), silently merging components.
    assert mask.size < 2**31, "volume too large for int32 voxel ids"
    m = (mask > 0).astype(jnp.int32)
    n = mask.size
    ids = (
        jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
        * mask.shape[1] * mask.shape[2]
        + jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1) * mask.shape[2]
        + jax.lax.broadcasted_iota(jnp.int32, mask.shape, 2)
        + 1
    ) * m

    def cond(carry):
        prev, cur = carry
        return jnp.any(prev != cur)

    def body(carry):
        _, cur = carry
        nxt = _cross_reduce(cur, jnp.maximum, 0) * m
        return cur, nxt

    first = _cross_reduce(ids, jnp.maximum, 0) * m
    _, labels = jax.lax.while_loop(cond, body, (ids, first))

    flat = labels.reshape(-1)
    counts = jnp.zeros((n + 2,), jnp.int32).at[flat].add(1)
    counts = counts.at[0].set(0)  # background
    biggest = jnp.argmax(counts).astype(jnp.int32)
    return ((labels == biggest) & (m > 0)).astype(jnp.float32)
