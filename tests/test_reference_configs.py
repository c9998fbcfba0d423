"""Drop-in compatibility: the reference's shipped example configs must
construct a Model through our registries unchanged (flags/paths overridden
so no data is needed)."""

import glob
import os

import pytest

from ctunet_tpu.trainer import Model
from ctunet_tpu.utils import default_params, set_cfg_params

REF_INIS = sorted(
    glob.glob("/root/reference/examples/**/*.ini", recursive=True)
)

# applies ONLY to the reference-INI tests below; the repo-example test
# must run everywhere (it depends on shipped files alone)
needs_reference = pytest.mark.skipif(
    not REF_INIS, reason="reference repo not mounted"
)


REPO_INIS = sorted(
    glob.glob(
        os.path.join(
            os.path.dirname(__file__), os.pardir, "examples", "**", "*.ini"
        ),
        recursive=True,
    )
)


@pytest.mark.parametrize(
    "ini", REPO_INIS, ids=lambda p: os.path.basename(p)
)
def test_repo_example_ini_constructs_model(ini, tmp_path):
    """Every shipped example config parses and constructs a Model."""
    params = set_cfg_params(ini, default_params())
    params.update(
        train_flag=False,
        test_flag=False,
        workspace_path=str(tmp_path / "ws"),
        device="cpu",
    )
    Model(params=params)


@needs_reference
@pytest.mark.parametrize("ini", REF_INIS, ids=lambda p: os.path.basename(p))
def test_reference_ini_constructs_model(ini, tmp_path):
    params = set_cfg_params(ini, default_params())
    params.update(
        train_flag=False,
        test_flag=False,
        workspace_path=str(tmp_path / "ws"),
        device="cpu",
    )
    m = Model(params=params)
    # the named classes resolve through our registries
    assert type(m.problem_handler).__name__ in params["problem_handler"] or (
        params["problem_handler"]
        in type(m.problem_handler).__mro__[0].__name__
    )
    from ctunet_tpu.registry import MODEL_REGISTRY

    assert params["model_class"] in MODEL_REGISTRY
