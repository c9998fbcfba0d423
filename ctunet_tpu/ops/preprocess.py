"""On-device CT ingest: HU windowing, isotropic resampling, padding, morphology.

The reference keeps preprocessing in an external package ("headctools", see
SURVEY.md quirk Q6) and does CPU-side padding (``transforms.py:303-335``) and
SimpleITK morphology (``transforms.py:356-377``). Here the full ingest path is
fused on-device XLA (BASELINE.json north star): HU clip/window + threshold,
trilinear resampling to target spacing (separable interpolation via
``jax.image.resize`` — compiles to per-axis contractions), pad-to-multiple,
and binary erosion/dilation as fused min/max stencils.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@partial(jax.jit, static_argnames=("binarize",))
def hu_window(
    volume: Array,
    lo: float = -100.0,
    hi: float = 1500.0,
    threshold: float = 150.0,
    binarize: bool = True,
) -> Array:
    """Clip a CT volume to an HU window; optionally threshold to binary bone.

    (New capability per BASELINE.json; the reference expects pre-binarized
    inputs produced offline.)
    """
    v = jnp.clip(volume.astype(jnp.float32), lo, hi)
    if binarize:
        return (v >= threshold).astype(jnp.float32)
    return (v - lo) / (hi - lo)


def resample_to_shape(volume: Array, target_shape: Sequence[int]) -> Array:
    """Trilinear resample of a (D, H, W) volume to a static target shape."""
    return jax.image.resize(
        volume.astype(jnp.float32), tuple(target_shape), method="trilinear"
    )


def resample_to_spacing(
    volume: Array,
    spacing: Sequence[float],
    target_spacing: Sequence[float] = (1.0, 1.0, 1.0),
) -> Array:
    """Resample to a target voxel spacing (shape computed on host)."""
    shape = volume.shape
    target_shape = tuple(
        max(1, int(round(s * sp / tsp)))
        for s, sp, tsp in zip(shape, spacing, target_spacing)
    )
    return resample_to_shape(volume, target_shape)


def fixed_pad(
    v: Array, final_img_size: Sequence[int], constant_value: float = 0.0
):
    """Pad trailing edges up to ``final_img_size``
    (ref ``transforms.py:311-335``). Returns (padded, padding) where padding
    is a tuple of (before, after) pairs usable with :func:`unpad`."""
    padding = tuple(
        (0, int(t) - int(s)) for s, t in zip(v.shape, final_img_size)
    )
    for s, t in zip(v.shape, final_img_size):
        if s > t:
            raise ValueError(
                f"input size {tuple(v.shape)} exceeds target {tuple(final_img_size)}"
            )
    out = jnp.pad(v, padding, constant_values=constant_value)
    return out, padding


def unpad(x: Array, pad_width) -> Array:
    """Inverse of :func:`fixed_pad` (ref ``transforms.py:303-308``)."""
    slices = tuple(
        slice(b, None if a == 0 else -a) for (b, a) in pad_width
    )
    return x[slices]


def pad_to_multiple(
    v: Array, multiple: int = 16, constant_value: float = 0.0
):
    """Pad each spatial dim up to the next multiple (U-Net pooling needs
    sizes divisible by 2^n_blocks). Returns (padded, padding)."""
    target = tuple(int(np.ceil(s / multiple)) * multiple for s in v.shape)
    return fixed_pad(v, target, constant_value)


# ---------------------------------------------------------------------------
# Binary morphology as fused shift-stencils (6-connectivity ball radius 1,
# the SimpleITK {Erode,Dilate}ObjectMorphology default used at
# ``transforms.py:356-377``).
# ---------------------------------------------------------------------------


def _cross_reduce(x: Array, op, pad_value: float) -> Array:
    out = x
    for axis in range(x.ndim):
        lo = jnp.roll(x, 1, axis)
        hi = jnp.roll(x, -1, axis)
        # roll wraps; overwrite the wrapped border with the pad value.
        idx_lo = [slice(None)] * x.ndim
        idx_lo[axis] = slice(0, 1)
        idx_hi = [slice(None)] * x.ndim
        idx_hi[axis] = slice(-1, None)
        lo = lo.at[tuple(idx_lo)].set(pad_value)
        hi = hi.at[tuple(idx_hi)].set(pad_value)
        out = op(op(out, lo), hi)
    return out


@partial(jax.jit, static_argnames=("times",))
def dilate(volume: Array, times: int = 1) -> Array:
    """Binary dilation, 6-neighborhood (ref ``transforms.py:368-377``)."""
    v = (volume > 0).astype(jnp.float32)
    for _ in range(times):
        v = _cross_reduce(v, jnp.maximum, 0.0)
    return v


@partial(jax.jit, static_argnames=("times",))
def erode(volume: Array, times: int = 1) -> Array:
    """Binary erosion, 6-neighborhood (ref ``transforms.py:356-366``)."""
    v = (volume > 0).astype(jnp.float32)
    for _ in range(times):
        v = _cross_reduce(v, jnp.minimum, 1.0)
    return v


def erode_dilate(key: jax.Array, volume: Array, p: float = 1.0) -> Array:
    """With probability p, randomly erode or dilate once (working version of
    the reference's bit-rotted ``ErodeDilate``/``erode_dilate``,
    ``transforms.py:97-127`` — quirk Q2)."""
    k_coin, k_choice = jax.random.split(key)
    choice = jax.random.randint(k_choice, (), 0, 2)
    out = jax.lax.cond(choice == 0, lambda v: erode(v), lambda v: dilate(v), volume)
    coin = jax.random.uniform(k_coin, ())
    return jnp.where(coin <= p, out, (volume > 0).astype(jnp.float32))
