"""Losses and quality metrics (channels-last, jit-friendly).

Exactly reproduces the reference loss math so trained models / loss curves
are comparable:

- ``dice_loss``: squared-denominator global Dice over flattened
  (classes x voxels) per batch element, eps = 1e-7, including the background
  channel — bit-matching ``ctunet/utilities.py:35-50`` (quirk Q5 in SURVEY.md).
- ``softmax_cross_entropy``: ``torch.nn.CrossEntropyLoss`` semantics — mean
  over batch and voxels of -log_softmax(pred)[label]
  (used at ``ctunet/pytorch/ProblemHandler.py:69,251,256``).
- ``dice_coeff``: mean foreground Dice of one-hot(argmax(pred)) vs one-hot
  target, NaN when both sets are empty — matching monai ``compute_meandice``
  as called at ``ctunet/utilities.py:53-59``.
- ``hausdorff``: host-side Hausdorff distance via exact euclidean distance
  transforms on class boundaries, NaN/inf replaced with max(shape) —
  matching ``ctunet/utilities.py:62-70``.

All device functions take channels-LAST tensors ``(B, D, H, W, C)``; this is
the framework-wide layout (MXU-friendly), unlike the reference's NCDHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-7


def dice_loss(probs: jax.Array, masks: jax.Array) -> jax.Array:
    """Squared-denominator Dice loss (reference ``utilities.py:35-50``).

    :param probs: predicted probabilities, (B, ..., C), any float dtype.
    :param masks: one-hot targets, same shape.
    """
    b = probs.shape[0]
    p = probs.astype(jnp.float32).reshape(b, -1)
    m = masks.astype(jnp.float32).reshape(b, -1)
    num = jnp.sum(p * m, axis=1)
    den1 = jnp.sum(p * p, axis=1)
    den2 = jnp.sum(m * m, axis=1)
    return 1.0 - 2.0 * jnp.mean((num + _EPS) / (den1 + den2 + _EPS))


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax CE; equivalent to ``torch.nn.CrossEntropyLoss``.

    :param logits: (B, ..., C). NOTE: like the reference, the training path
        feeds post-sigmoid activations here (quirk Q4 in SURVEY.md) — the
        math is the same, CE simply treats them as logits.
    :param labels: (B, ...) integer class indices.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # One-hot multiply instead of take_along_axis: XLA lowers the gather
    # (and its scatter-add gradient) to flat-1D T(1024) ops that ran at
    # ~80 MB/s on TPU — measured 50 ms/step of pure gather in the 128-res
    # train step. The elementwise form fuses away entirely.
    sel = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    picked = jnp.sum(logp * sel, axis=-1)
    return -jnp.mean(picked)


def dice_coeff(pred_probs: jax.Array, target_onehot: jax.Array) -> jax.Array:
    """Mean foreground Dice of hard predictions (ref ``utilities.py:53-59``).

    Per (batch, foreground-class): ``2|X n Y| / (|X|+|Y|)``; NaN when both
    empty (monai semantics), then mean — NaN propagates like the reference.
    """
    num_classes = target_onehot.shape[-1]
    hard = jax.nn.one_hot(
        jnp.argmax(pred_probs, axis=-1), num_classes, dtype=jnp.float32
    )
    tgt = target_onehot.astype(jnp.float32)
    b = hard.shape[0]
    x = hard.reshape(b, -1, num_classes)[..., 1:]  # exclude background
    y = tgt.reshape(b, -1, num_classes)[..., 1:]
    inter = jnp.sum(x * y, axis=1)
    denom = jnp.sum(x, axis=1) + jnp.sum(y, axis=1)
    dc = jnp.where(denom > 0, 2.0 * inter / denom, jnp.nan)
    return jnp.mean(dc)


# ---------------------------------------------------------------------------
# Hausdorff distance (host-side; display metric only, off the hot path)
# ---------------------------------------------------------------------------


def _surface(mask: np.ndarray) -> np.ndarray:
    """Boundary voxels: mask minus its 1-step erosion (6-connectivity)."""
    from scipy import ndimage

    eroded = ndimage.binary_erosion(mask, ndimage.generate_binary_structure(3, 1))
    return mask & ~eroded


def _directed_hd(a: np.ndarray, b: np.ndarray) -> float:
    """max over surface(a) of distance to surface(b) (exact EDT)."""
    from scipy import ndimage

    sa, sb = _surface(a), _surface(b)
    if not sa.any() or not sb.any():
        return float("nan")
    dist_to_b = ndimage.distance_transform_edt(~sb)
    return float(dist_to_b[sa].max())


def hausdorff(pred_probs, target_onehot) -> float:
    """Mean foreground Hausdorff distance (ref ``utilities.py:62-70``).

    NaN/inf results are replaced with ``max(spatial shape)`` before
    averaging, exactly like the reference's ``nan_to_num`` fallback.
    Host-side (numpy/scipy); call with concrete arrays only.
    """
    pred = np.asarray(pred_probs, dtype=np.float32)
    tgt = np.asarray(target_onehot, dtype=np.float32)
    num_classes = tgt.shape[-1]
    hard = np.argmax(pred, axis=-1)
    inf_alt = float(max(tgt.shape[1:-1]))

    vals = []
    for bi in range(tgt.shape[0]):
        for c in range(1, num_classes):  # exclude background
            x = hard[bi] == c
            y = tgt[bi, ..., c] > 0.5
            hd = max(_directed_hd(x, y), _directed_hd(y, x))
            if not np.isfinite(hd):
                hd = inf_alt
            vals.append(hd)
    return float(np.mean(vals)) if vals else inf_alt


def hausdorff_device_argmax(pred_logits, target_onehot) -> float:
    """``hausdorff`` with the argmax taken ON DEVICE before fetching.

    Only uint8 label maps cross the host link instead of full f32
    probability + one-hot volumes (~60x less traffic at 224x304x304,
    where the naive fetch stalls validation under slow links). argmax is
    softmax-invariant, so logits and probabilities give the same labels
    and the same value as ``hausdorff`` (ref ``utilities.py:62-70``).
    """
    num_classes = int(target_onehot.shape[-1])
    hard = np.asarray(jnp.argmax(pred_logits, axis=-1).astype(jnp.uint8))
    tgt = np.asarray(
        jnp.argmax(target_onehot, axis=-1).astype(jnp.uint8)
    )
    inf_alt = float(max(target_onehot.shape[1:-1]))

    vals = []
    for bi in range(tgt.shape[0]):
        for c in range(1, num_classes):  # exclude background
            hd = max(
                _directed_hd(hard[bi] == c, tgt[bi] == c),
                _directed_hd(tgt[bi] == c, hard[bi] == c),
            )
            if not np.isfinite(hd):
                hd = inf_alt
            vals.append(hd)
    return float(np.mean(vals)) if vals else inf_alt
