"""Volume-level foreground cropping (ops/foreground.py + serving loop).

The reference serves whole volumes only (``ctunet/pytorch/Model.py:
298-322``); cropping is a TPU-side throughput optimization that must not
change the served masks beyond crop-border effects (parity is measured on
trained checkpoints by tools/parity_check.py; here the mechanics are
verified: plans, pasting, and end-to-end mask agreement).
"""

import glob
import os

import numpy as np
import pytest

from ctunet_tpu.ops import foreground


def test_plan_crop_bbox_margin_snap():
    vol = np.zeros((64, 96, 96), np.float32)
    vol[20:30, 40:50, 33:55] = 1.0
    plan = foreground.plan_crop(vol, margin=4, multiple=16)
    assert plan is not None
    offs, sizes = plan
    for o, s, lo, hi, dim in zip(
        offs, sizes, (20, 40, 33), (30, 50, 55), vol.shape
    ):
        assert o % 16 == 0 and s % 16 == 0
        assert o <= lo - 4 or o == 0
        assert o + s >= hi + 4 or o + s == dim
        assert o + s <= dim
    # the crop really contains all foreground
    sl = foreground.crop_slices(offs, sizes)
    assert vol[sl].sum() == vol.sum()


def test_plan_crop_empty_and_full():
    assert foreground.plan_crop(np.zeros((32, 32, 32)), 4, 16) is None
    # full-canvas foreground: no axis shrinks -> None
    assert foreground.plan_crop(np.ones((32, 32, 32)), 4, 16) is None


def test_plan_crop_min_size():
    vol = np.zeros((64, 64, 64), np.float32)
    vol[2:6, 2:6, 2:6] = 1.0
    plan = foreground.plan_crop(vol, margin=2, multiple=16,
                                min_size=(32, 32, 32))
    offs, sizes = plan
    assert sizes == (32, 32, 32)
    assert offs == (0, 0, 0)


def test_paste_full_roundtrip():
    full = np.random.default_rng(0).integers(0, 3, (1, 32, 48, 48))
    offs, sizes = (16, 0, 16), (16, 32, 16)
    sl = foreground.crop_slices(offs, sizes)
    crop = full[(slice(None),) + sl]
    pasted = foreground.paste_full(crop, offs, full.shape[1:], background=7)
    np.testing.assert_array_equal(pasted[(slice(None),) + sl], crop)
    mask = np.ones(full.shape, bool)
    mask[(slice(None),) + sl] = False
    assert (pasted[mask] == 7).all()


@pytest.mark.slow
def test_serving_crop_matches_whole_volume(tmp_path):
    """End-to-end: the fg_crop serving path writes masks that agree with
    the whole-volume path (same weights, same inputs; differences may
    only appear in the crop-border band)."""
    from ctunet_tpu import Model
    from ctunet_tpu.data import spherical_shell
    from ctunet_tpu.data.atlas import register_atlas
    from ctunet_tpu.utils import nifti

    shape = (64, 64, 64)
    # off-center small skull so the crop genuinely shrinks the canvas
    shell = np.zeros(shape, np.float32)
    small = spherical_shell((32, 32, 32), radius_frac=0.4).astype(np.float32)
    shell[4:36, 8:40, 4:36] = small
    d = tmp_path / "data"
    d.mkdir()
    nifti.write(str(d / "skull.nii.gz"), nifti.NiftiImage(shell))
    csv = str(d / "files.csv")
    with open(csv, "w") as f:
        f.write("image,mask\n")
        f.write(str(d / "skull.nii.gz") + ",\n")
    register_atlas(shape, spherical_shell(shape))

    base = dict(
        name="fg", model_class="UNetSP",
        problem_handler="FlapRecWithShapePriorDoubleOut",
        device="cpu", batch_size=1, dice_lambda=1.0, ce_lambda=1.0,
        optimizer="adam", learning_rate=1e-3, momentum=0.99,
        weight_decay=0.0, workspace_path=str(tmp_path / "ws"),
        autosave_epochs=0, save_dice_plots=False,
        n_workers=1, compute_dtype="float32", remat=False,
        log_every=0, seed=0,
    )
    # train one epoch to produce the shared checkpoint
    Model(params=dict(
        base, train_flag=True, test_flag=False, n_epochs=1,
        train_files_csv=csv, validation_files_csv=csv,
    ))

    outs = {}
    for crop in (False, True):
        Model(params=dict(
            base, train_flag=False, test_flag=True, test_files_csv=csv,
            fg_crop=crop, fg_margin=8,
        ))
        masks = {}
        for p in glob.glob(str(d / "pred_fg" / "*.nii.gz")):
            masks[os.path.basename(p).split("_")[-1]] = np.asarray(
                nifti.read(p).data
            )
        assert masks, "no predictions written"
        outs[crop] = masks

    # The crop plan actually used (same planner the serving loop calls).
    plan = foreground.plan_crop(shell, margin=8, multiple=16)
    assert plan is not None
    offs, sizes = plan
    sl = foreground.crop_slices(offs, sizes)

    # A 1-epoch model's empty-space response is still noisy (scattered
    # positives far from the skull), so global mask equality is a trained-
    # checkpoint property (measured by tools/parity_check.py --crop).
    # Mechanics verified here: inside the crop the two paths agree except
    # for a thin crop-border band, the crop interior is near-exact, and
    # outside the crop the crop path fills a constant class.
    assert outs[False].keys() == outs[True].keys()
    inner = tuple(slice(8, s - 8) for s in sizes)
    for key in outs[False]:
        a, b = outs[False][key], outs[True][key]
        assert a.shape == b.shape
        agree_crop = float((a[sl] == b[sl]).mean())
        assert agree_crop >= 0.98, (
            f"{key}: crop-box agreement only {agree_crop:.4f}"
        )
        agree_in = float((a[sl][inner] == b[sl][inner]).mean())
        assert agree_in >= 0.995, (
            f"{key}: crop-interior agreement only {agree_in:.4f}"
        )
        outside = np.ones(a.shape, bool)
        outside[sl] = False
        if outside.any():
            vals = np.unique(b[outside])
            assert vals.size == 1, (
                f"{key}: outside-crop fill not constant: {vals}"
            )
