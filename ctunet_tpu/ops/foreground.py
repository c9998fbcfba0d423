"""Volume-level foreground cropping for serving.

CT skulls occupy a fraction of the preprocessed volume (the voxel grid is
~95% empty; the tight nonzero bounding box is smaller than the canvas in
every axis). The chain kernels' per-voxel cost is shape-proportional, so
the coarse sparsity lever that in-kernel branching could not deliver
(measured net loss — BASELINE.md "Constant-region short-circuit") is to
run the engine on the foreground bounding box + margin and reconstruct
the full-canvas prediction on the host.

Correctness model: outside the crop the INPUT is exactly zero (the crop
contains the whole nonzero bbox), so the crop's SAME-padding zeros match
the true data for every first-layer voxel. Deeper layers see zero padding
where the full-volume run carries constant bias/BN fields, so predictions
can differ inside a receptive-field band at the crop border; the margin
pushes that band into empty space, and crop offsets snap to the pooling
multiple so every pool grid stays aligned with the whole-volume run.
Mask parity is MEASURED (tools/parity_check.py ``dice_*_crop`` columns)
rather than claimed: the reference computes whole volumes only
(``ctunet/pytorch/Model.py:298-322``), and the crop path must reproduce
its masks.

Background reconstruction: an empty (all-zero) input yields a spatially
constant prediction, so the full-canvas mask is the crop's mask pasted
into a constant field — the argmax class of the model on an empty volume
(:func:`background_class` measures it instead of assuming class 0).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

Slices = Tuple[slice, ...]


def plan_crop(
    vol: np.ndarray,
    margin: int = 16,
    multiple: int = 16,
    min_size: Optional[Sequence[int]] = None,
) -> Optional[Tuple[Tuple[int, ...], Tuple[int, ...]]]:
    """Foreground crop plan for one (D, H, W) volume.

    Returns ``(offsets, sizes)`` with offsets snapped DOWN to ``multiple``
    (pool-grid alignment with the whole-volume run) and sizes padded by
    ``margin`` on each side then snapped UP to ``multiple``, clamped to
    the canvas. ``None`` when the volume is empty or the crop would not
    shrink any axis (serve whole-volume instead).
    """
    vol = np.asarray(vol)
    assert vol.ndim == 3, vol.shape
    offs, sizes = [], []
    any_gain = False
    for ax in range(3):
        other = tuple(i for i in range(3) if i != ax)
        prof = np.any(vol != 0, axis=other)
        nz = np.flatnonzero(prof)
        if nz.size == 0:
            return None
        lo = max(0, int(nz[0]) - margin)
        hi = min(vol.shape[ax], int(nz[-1]) + 1 + margin)
        lo = (lo // multiple) * multiple
        size = -(-(hi - lo) // multiple) * multiple
        if min_size is not None:
            size = max(size, int(min_size[ax]))
        size = min(size, vol.shape[ax])
        lo = min(lo, vol.shape[ax] - size)
        offs.append(lo)
        sizes.append(size)
        if size < vol.shape[ax]:
            any_gain = True
    if not any_gain:
        return None
    return tuple(offs), tuple(sizes)


def crop_slices(offsets: Sequence[int], sizes: Sequence[int]) -> Slices:
    return tuple(slice(o, o + s) for o, s in zip(offsets, sizes))


def paste_full(
    crop_mask: np.ndarray,
    offsets: Sequence[int],
    full_shape: Sequence[int],
    background: int = 0,
) -> np.ndarray:
    """Paste a cropped (…, d, h, w) mask into a ``background``-filled
    full-canvas array (leading batch dims preserved)."""
    crop_mask = np.asarray(crop_mask)
    lead = crop_mask.shape[:-3]
    out = np.full(lead + tuple(full_shape), background, crop_mask.dtype)
    sl = crop_slices(offsets, crop_mask.shape[-3:])
    out[(Ellipsis,) + sl] = crop_mask
    return out


def background_class(predict, input_shape, dtype) -> list:
    """Argmax class of the model on an EMPTY volume, per output head.

    The empty-input prediction is spatially constant (conv of zeros =
    bias); its argmax is the class to fill outside the crop. Measured
    once per serving session (a 32-voxel cube suffices: constant fields
    need no resolution). ``input_shape`` is the unbatched model input
    shape, e.g. ``(32, 32, 32, 2)``."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1, *input_shape), dtype)
    out = predict(x)
    classes = []
    for o in jax.tree.leaves(out):
        a = np.asarray(o, np.float32)[0]
        center = tuple(s // 2 for s in a.shape[:-1])
        classes.append(int(np.argmax(a[center])))
    return classes
