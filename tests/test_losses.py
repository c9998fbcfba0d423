"""Loss/metric golden tests.

Cross-checked against torch (baked-in CPU build) where the reference's math
is a torch builtin (CrossEntropyLoss), and against independent numpy
implementations of the documented formulas elsewhere (SURVEY.md Q5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops import dice_coeff, dice_loss, hausdorff, softmax_cross_entropy


def _np_dice_loss(probs, masks, eps=1e-7):
    b = probs.shape[0]
    p = probs.reshape(b, -1).astype(np.float64)
    m = masks.reshape(b, -1).astype(np.float64)
    num = (p * m).sum(1)
    den1 = (p * p).sum(1)
    den2 = (m * m).sum(1)
    return 1 - 2 * np.mean((num + eps) / (den1 + den2 + eps))


def test_dice_loss_matches_reference_formula(rng):
    probs = rng.random((2, 4, 4, 4, 2)).astype(np.float32)
    masks = (rng.random((2, 4, 4, 4, 2)) > 0.5).astype(np.float32)
    got = float(dice_loss(jnp.asarray(probs), jnp.asarray(masks)))
    want = _np_dice_loss(probs, masks)
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_loss_perfect_prediction():
    m = np.zeros((1, 4, 4, 4, 2), np.float32)
    m[..., 0] = 1.0
    got = float(dice_loss(jnp.asarray(m), jnp.asarray(m)))
    assert got == pytest.approx(0.0, abs=1e-5)


def test_softmax_ce_matches_torch(rng):
    import torch

    logits = rng.standard_normal((2, 3, 3, 3, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 3, 3, 3))
    got = float(
        softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    )
    # torch wants channels-first (B, C, spatial).
    t_logits = torch.tensor(logits).permute(0, 4, 1, 2, 3)
    t_labels = torch.tensor(labels, dtype=torch.long)
    want = float(torch.nn.CrossEntropyLoss()(t_logits, t_labels))
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_coeff_perfect():
    tgt = np.zeros((1, 4, 4, 4, 2), np.float32)
    tgt[..., 1] = 0.0
    tgt[0, 1:3, 1:3, 1:3, 1] = 1.0
    tgt[..., 0] = 1.0 - tgt[..., 1]
    pred = tgt * 10.0  # argmax == target
    got = float(dice_coeff(jnp.asarray(pred), jnp.asarray(tgt)))
    assert got == pytest.approx(1.0)


def test_dice_coeff_half_overlap():
    tgt = np.zeros((1, 1, 1, 4, 2), np.float32)
    tgt[0, 0, 0, :2, 1] = 1.0
    tgt[..., 0] = 1.0 - tgt[..., 1]
    pred = np.zeros_like(tgt)
    pred[0, 0, 0, 1:3, 1] = 1.0
    pred[..., 0] = 1.0 - pred[..., 1]
    got = float(dice_coeff(jnp.asarray(pred), jnp.asarray(tgt)))
    # |X n Y| = 1, |X| + |Y| = 4 -> dice 0.5
    assert got == pytest.approx(0.5)


def test_dice_coeff_both_empty_is_nan():
    """monai semantics: 0/0 -> NaN, propagates through the mean."""
    tgt = np.zeros((1, 2, 2, 2, 2), np.float32)
    tgt[..., 0] = 1.0
    pred = tgt.copy()
    got = float(dice_coeff(jnp.asarray(pred), jnp.asarray(tgt)))
    assert np.isnan(got)


def test_hausdorff_identical_is_zero():
    tgt = np.zeros((1, 8, 8, 8, 2), np.float32)
    tgt[0, 2:5, 2:5, 2:5, 1] = 1.0
    tgt[..., 0] = 1.0 - tgt[..., 1]
    assert hausdorff(tgt * 5, tgt) == pytest.approx(0.0)


def test_hausdorff_shifted():
    tgt = np.zeros((1, 8, 8, 8, 2), np.float32)
    tgt[0, 2:4, 2:4, 2:4, 1] = 1.0
    tgt[..., 0] = 1.0 - tgt[..., 1]
    pred = np.zeros_like(tgt)
    pred[0, 2:4, 2:4, 4:6, 1] = 1.0  # shifted 2 voxels in x
    pred[..., 0] = 1.0 - pred[..., 1]
    assert hausdorff(pred * 5, tgt) == pytest.approx(2.0)


def test_hausdorff_empty_fallback():
    """Empty prediction -> NaN replaced by max spatial dim (ref behavior)."""
    tgt = np.zeros((1, 8, 8, 8, 2), np.float32)
    tgt[0, 2:4, 2:4, 2:4, 1] = 1.0
    tgt[..., 0] = 1.0 - tgt[..., 1]
    pred = np.zeros_like(tgt)
    pred[..., 0] = 1.0  # all background
    assert hausdorff(pred, tgt) == pytest.approx(8.0)
