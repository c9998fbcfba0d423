"""Workspace/path resolution semantics (ref ``Model.py:407-446``)."""

import os

import pytest

from ctunet_tpu.trainer import Model
from ctunet_tpu.utils import default_params

# heavyweight (CPU-interpret / e2e): full-suite lane only
pytestmark = pytest.mark.slow


def _mk(tmp_path, **over):
    p = default_params()
    p.update(
        name="run1",
        model_class="UNetSP",
        problem_handler="FlapRecWithShapePriorDoubleOut",
        workspace_path=str(tmp_path / "ws"),
        train_flag=False,
        test_flag=False,
        device="cpu",
    )
    p.update(over)
    return Model(params=p)


def test_model_path_layout(tmp_path):
    m = _mk(tmp_path)
    assert m.params["model_path"].endswith(
        "ws/UNetSP_FlapRecWithShapePriorDoubleOut/model/run1.ckpt"
    )
    assert os.path.isdir(
        str(tmp_path / "ws/UNetSP_FlapRecWithShapePriorDoubleOut/model")
    )


def test_tensorboard_path_defaulted(tmp_path):
    m = _mk(tmp_path)
    assert m.params["tensorboard_run_path"].endswith(
        "ws/runs/UNetSP_FlapRecWithShapePriorDoubleOut_run1"
    )


def test_name_from_resume_model(tmp_path):
    m = _mk(tmp_path, name=None, resume_model="/models/old_run.ckpt")
    assert m.params["name"] == "old_run"
    # without force_resumed, the model path is the NEW workspace path
    assert m.params["model_path"].endswith("model/old_run.ckpt")


def test_force_resumed_keeps_resume_path(tmp_path):
    m = _mk(
        tmp_path,
        name=None,
        resume_model="/models/old_run.ckpt",
        force_resumed=True,
    )
    assert m.params["model_path"] == "/models/old_run.ckpt"


def test_no_name_no_resume_raises(tmp_path):
    with pytest.raises(AttributeError, match="at least a name"):
        _mk(tmp_path, name=None)


def test_no_workspace_raises(tmp_path):
    with pytest.raises(AttributeError, match="workspace_path"):
        _mk(tmp_path, workspace_path=None)


def test_cfg_and_params_warning(tmp_path, capsys):
    ini = tmp_path / "c.ini"
    ini.write_text(
        "[D]\ns_name = x\ns_model_class = UNetSP\n"
        "s_problem_handler = FlapRec\n"
        f"s_workspace_path = {tmp_path}/ws\n"
    )
    Model(str(ini), params={"name": "ignored"})
    out = capsys.readouterr().out
    assert "Only the cfg file will be used" in out


def test_missing_cfg_raises():
    with pytest.raises(FileNotFoundError):
        Model("/does/not/exist.ini")


def test_cli_list_unwrap(tmp_path):
    """CLI passes [argv] — the constructor unwraps (ref Model.py:44)."""
    ini = tmp_path / "c.ini"
    ini.write_text(
        "[D]\ns_name = x\ns_model_class = UNetSP\n"
        "s_problem_handler = FlapRec\n"
        f"s_workspace_path = {tmp_path}/ws\n"
    )
    m = Model([str(ini)])
    assert m.params["name"] == "x"
