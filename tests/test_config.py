"""Config system tests: INI type-prefix parsing parity
(reference semantics: ``ctunet/utilities.py:215-256``)."""

import pytest

from ctunet_tpu.utils.config import default_params, load_params, set_cfg_params

INI = """
[DEFAULT]
b_train_flag = True
b_test_flag = False
s_name = FlapRecSP2O
s_model_class = UNetSP
s_problem_handler = FlapRecWithShapePriorDoubleOut
s_resume_model =

[TRAINING]
i_n_epochs = 40
i_batch_size = 2
f_dice_lambda = 1
f_ce_lambda = 0.5

[MISC]
i_autosave_epochs = 1
b_save_dice_plots = True
unprefixed_key = hello
"""


@pytest.fixture
def ini_file(tmp_path):
    p = tmp_path / "cfg.ini"
    p.write_text(INI)
    return str(p)


def test_type_prefixes(ini_file):
    params = set_cfg_params(ini_file, default_params())
    assert params["train_flag"] is True
    assert params["test_flag"] is False
    assert params["name"] == "FlapRecSP2O"
    assert params["n_epochs"] == 40 and isinstance(params["n_epochs"], int)
    assert params["batch_size"] == 2
    assert params["dice_lambda"] == 1.0
    assert params["ce_lambda"] == 0.5
    assert params["autosave_epochs"] == 1
    assert params["save_dice_plots"] is True
    assert params["resume_model"] == ""
    assert params["unprefixed_key"] == "hello"


def test_defaults_preserved(ini_file):
    params = set_cfg_params(ini_file, default_params())
    # Keys not in the INI keep their defaults.
    assert params["force_resumed"] is False
    assert params["compute_dtype"] == "bfloat16"


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        set_cfg_params(str(tmp_path / "nope.ini"), {})


def test_none_returns_none():
    assert set_cfg_params(None, {}) is None


def test_load_params_alias(ini_file):
    assert load_params(ini_file, {})["name"] == "FlapRecSP2O"


def test_reference_example_configs_parse():
    """The reference's shipped example INIs must parse unchanged."""
    import glob

    inis = glob.glob("/root/reference/examples/**/*.ini", recursive=True)
    assert inis
    for ini in inis:
        params = set_cfg_params(ini, default_params())
        assert params["model_class"] in {
            "UNetSP", "UNetSPSmall", "UNetDO", "UNet4_2IC", "recAE_v2_fixed",
        }
        assert params["problem_handler"]
