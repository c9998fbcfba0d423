"""Round-2 fixes: torch-free .pt loading, `_c{i}` writer branch, empty-loss
guard, scheduler parity, best-model tracking with empty validation, and
atlas padding on non-pool-multiple inputs."""

import csv
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu import Model, problem, steps
from ctunet_tpu.data import make_dataset, spherical_shell
from ctunet_tpu.data.atlas import register_atlas
from ctunet_tpu.utils import nifti


# ---------------------------------------------------------------------------
# torch-free .pt unpickler
# ---------------------------------------------------------------------------


def _make_torch_files(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    m = nn.Sequential(
        nn.Conv3d(2, 3, 3, bias=False), nn.BatchNorm3d(3), nn.Linear(4, 5)
    )
    p_sd = str(tmp_path / "sd.pt")
    p_mod = str(tmp_path / "mod.pt")
    torch.save(m.state_dict(), p_sd)
    torch.save(m, p_mod)
    ref = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return p_sd, p_mod, ref


@pytest.mark.parametrize("kind", ["state_dict", "module"])
def test_torch_free_unpickler(tmp_path, kind):
    from ctunet_tpu.models.torch_port import _load_state_dict_torch_free

    p_sd, p_mod, ref = _make_torch_files(tmp_path)
    got = _load_state_dict_torch_free(p_sd if kind == "state_dict" else p_mod)
    keys = {k for k in ref if not k.endswith("num_batches_tracked")}
    assert keys <= set(got)
    for k in keys:
        np.testing.assert_array_equal(got[k], ref[k])


def test_torch_free_rejects_non_zip(tmp_path):
    from ctunet_tpu.models.torch_port import _load_state_dict_torch_free

    p = tmp_path / "x.pt"
    p.write_bytes(b"not a zip")
    with pytest.raises(Exception):
        _load_state_dict_torch_free(str(p))


# ---------------------------------------------------------------------------
# single-output writer `_c{i}` branch (ref ProblemHandler.py:145-150)
# ---------------------------------------------------------------------------


def test_writer_multi_channel_c_branch(tmp_path):
    handler = problem.FlapRec()
    src = spherical_shell((8, 8, 8)).astype(np.float32)
    in_path = str(tmp_path / "vol.nii.gz")
    nifti.write(in_path, nifti.NiftiImage(src))
    # per-sample prediction with an extra leading dim: 2 images x one-hot(2)
    pred = np.zeros((1, 2, 8, 8, 8, 2), np.float32)
    pred[0, 0, ..., 1] = 1.0  # image 0 argmaxes to all-ones
    saved = handler.write_predictions(pred, [in_path], "cbranch")
    c0 = str(tmp_path / "pred_cbranch" / "vol_c0.nii.gz")
    c1 = str(tmp_path / "pred_cbranch" / "vol_c1.nii.gz")
    assert c0 in saved and c1 in saved
    np.testing.assert_array_equal(nifti.read(c0).data, np.ones((8, 8, 8)))
    np.testing.assert_array_equal(nifti.read(c1).data, np.zeros((8, 8, 8)))


# ---------------------------------------------------------------------------
# empty-loss guard
# ---------------------------------------------------------------------------


def test_empty_loss_config_raises():
    handler = problem.FlapRecWithShapePriorDoubleOut()
    model = object()
    opt = steps.make_optimizer({})
    with pytest.raises(ValueError, match="dice_lambda"):
        steps.make_train_step(
            model, handler, opt, {"ce_lambda": 0.0, "dice_lambda": None}
        )


# ---------------------------------------------------------------------------
# optimizer / scheduler parity
# ---------------------------------------------------------------------------


def test_adamw_amsgrad_builds_and_steps():
    opt = steps.make_optimizer(
        {"optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 1e-2}
    )
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    g = {"w": jnp.ones(3)}
    updates, state = opt.update(g, state, params, value=jnp.asarray(1.0))
    assert np.all(np.isfinite(np.asarray(updates["w"])))
    assert np.all(np.asarray(updates["w"]) < 0)


def test_scheduler_reduces_on_plateau():
    """The `scheduler` key adds per-step ReduceLROnPlateau (factor .1,
    patience 10, ref Model.py:543-546 + quirk Q4 per-batch stepping)."""
    opt = steps.make_optimizer(
        {"optimizer": "sgd", "learning_rate": 1.0, "scheduler": True}
    )
    params = {"w": jnp.zeros(1)}
    state = opt.init(params)
    g = {"w": jnp.ones(1)}
    scales = []
    for _ in range(30):
        updates, state = opt.update(
            g, state, params, value=jnp.asarray(5.0)  # flat loss: plateau
        )
        scales.append(float(-np.asarray(updates["w"])[0]))
    assert scales[0] == pytest.approx(1.0)  # sgd lr=1 -> update == grad
    assert scales[-1] == pytest.approx(0.01, rel=1e-3)  # two 0.1 cuts
    assert 0.1 in [pytest.approx(s, rel=1e-3) for s in scales]


# ---------------------------------------------------------------------------
# best-model tracking with an empty validation epoch
# ---------------------------------------------------------------------------


def test_empty_validation_does_not_crash(tmp_path):
    csv_train = make_dataset(str(tmp_path / "d"), n=2, shape=(16, 16, 16))
    empty_csv = str(tmp_path / "d" / "empty.csv")
    with open(empty_csv, "w", newline="") as f:
        csv.writer(f).writerow(["image", "mask"])
    p = dict(
        train_flag=True,
        test_flag=False,
        name="emptyval",
        model_class="UNetDO",
        problem_handler="FlapRecDoubleOut",
        device="cpu",
        n_epochs=2,
        batch_size=2,
        dice_lambda=1.0,
        ce_lambda=1.0,
        workspace_path=str(tmp_path / "ws"),
        train_files_csv=csv_train,
        validation_files_csv=empty_csv,
        compute_dtype="float32",
        remat=False,
        log_every=0,
        n_workers=1,
    )
    m = Model(params=p)  # epoch 2 used to raise TypeError (None compare)
    assert m.best_model["value"] is None
    assert m.current_epoch == 2


# ---------------------------------------------------------------------------
# atlas padding on non-pool-multiple test inputs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("patch_inference", [False, True])
def test_atlas_padded_with_images(tmp_path, patch_inference):
    # train at 32 (pool multiple) to produce a checkpoint...
    root = tmp_path
    csv_train = make_dataset(str(root / "train"), n=2, shape=(32, 32, 32))
    register_atlas((32, 32, 32), spherical_shell((32, 32, 32)))
    base = dict(
        name="apad",
        model_class="UNetSP",
        problem_handler="FlapRecWithShapePriorDoubleOut",
        device="cpu",
        batch_size=2,
        dice_lambda=1.0,
        ce_lambda=1.0,
        workspace_path=str(root / "ws"),
        compute_dtype="float32",
        remat=False,
        log_every=0,
        n_workers=1,
    )
    Model(params=dict(
        base, train_flag=True, test_flag=False, n_epochs=1,
        train_files_csv=csv_train, validation_files_csv=csv_train,
    ))
    # ...then predict 20^3 volumes (padded to 32): the atlas channel must be
    # padded alongside the images (used to raise on broadcast).
    csv_test = make_dataset(str(root / "test"), n=1, shape=(20, 20, 20))
    register_atlas((20, 20, 20), spherical_shell((20, 20, 20)))
    Model(params=dict(
        base, train_flag=False, test_flag=True, test_files_csv=csv_test,
        patch_inference=patch_inference, patch_size=16, patch_overlap=0.5,
    ))
    fl = glob.glob(str(root / "test" / "pred_apad" / "*_fl.nii.gz"))
    assert fl
    assert nifti.read(fl[0]).data.shape == (20, 20, 20)


# ---------------------------------------------------------------------------
# checkpoint template restore falls back only when keys are missing
# ---------------------------------------------------------------------------


def test_restore_partial_checkpoint_with_template(tmp_path, capsys):
    from ctunet_tpu import checkpoint as ckpt

    state = steps.TrainState(
        params={"w": jnp.ones((2, 2))},
        batch_stats={"m": jnp.zeros(2)},
        opt_state=(jnp.ones(2),),
        step=jnp.asarray(3, jnp.int32),
    )
    # a best-model-only save: params + stats, no opt_state/step
    import orbax.checkpoint as ocp

    partial = str(tmp_path / "partial.ckpt")
    with ocp.StandardCheckpointer() as c:
        c.save(
            partial,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
    restored = ckpt.restore_checkpoint(partial, template_state=state)
    assert "lacks" in capsys.readouterr().out
    assert set(restored) == {"params", "batch_stats"}

    full = str(tmp_path / "full.ckpt")
    ckpt.save_checkpoint(full, state)
    restored = ckpt.restore_checkpoint(full, template_state=state)
    assert int(restored["step"]) == 3


def test_sigterm_checkpoints_and_stops(tmp_path, monkeypatch):
    """Preemption handling: a signal mid-training checkpoints and exits the
    loop cleanly (SURVEY.md §5 failure-recovery gap in the reference).
    The signal fires deterministically from inside the second train step
    (after the trainer has installed its handler)."""
    import os
    import signal

    orig_make = steps.make_train_step

    def wrapped_make(*a, **k):
        step = orig_make(*a, **k)
        count = {"n": 0}

        def stepped(*args):
            count["n"] += 1
            if count["n"] == 2:
                os.kill(os.getpid(), signal.SIGINT)
            return step(*args)

        return stepped

    monkeypatch.setattr(steps, "make_train_step", wrapped_make)

    csv_train = make_dataset(str(tmp_path / "d"), n=2, shape=(16, 16, 16))
    p = dict(
        train_flag=True,
        test_flag=False,
        name="preempt",
        model_class="UNetDO",
        problem_handler="FlapRecDoubleOut",
        device="cpu",
        n_epochs=50,  # would run long without the interrupt
        batch_size=2,
        dice_lambda=1.0,
        ce_lambda=1.0,
        workspace_path=str(tmp_path / "ws"),
        train_files_csv=csv_train,
        validation_files_csv=csv_train,
        compute_dtype="float32",
        remat=False,
        log_every=0,
        n_workers=1,
    )
    m = Model(params=p)
    assert m.current_epoch < 50  # stopped early
    ckpts = os.listdir(
        str(tmp_path / "ws" / "UNetDO_FlapRecDoubleOut" / "model")
    )
    assert any(x.endswith(".ckpt") for x in ckpts)
