"""Checkpoint save/restore round trips (orbax + torch .pt import)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu import checkpoint as ckpt
from ctunet_tpu import steps


@pytest.fixture
def state():
    return steps.TrainState(
        params={"w": jnp.arange(6.0).reshape(2, 3)},
        batch_stats={"bn": {"mean": jnp.ones(3)}},
        opt_state=(jnp.full((2, 3), 0.5),),
        step=jnp.asarray(7, jnp.int32),
    )


def test_roundtrip(tmp_path, state):
    path = str(tmp_path / "m.ckpt")
    ckpt.save_checkpoint(path, state, extra={"epoch": 3, "model_class": "X"})
    restored = ckpt.restore_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state.params["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored["opt_state"][0]), 0.5 * np.ones((2, 3))
    )
    assert int(restored["step"]) == 7
    import json

    meta = json.load(open(path + ".meta.json"))
    assert meta == {"epoch": 3, "model_class": "X"}


def test_overwrite(tmp_path, state):
    path = str(tmp_path / "m.ckpt")
    ckpt.save_checkpoint(path, state)
    state2 = state._replace(step=jnp.asarray(9, jnp.int32))
    ckpt.save_checkpoint(path, state2)  # force overwrite
    assert int(ckpt.restore_checkpoint(path)["step"]) == 9


def test_cross_device_template_restore(tmp_path, state):
    """A checkpoint whose stored shardings can't resolve on this platform
    restores via the shape/dtype-only template (cross-device resume, e.g.
    a TPU-trained checkpoint opened on a CPU host)."""
    import orbax.checkpoint as ocp

    path = str(tmp_path / "m.ckpt")
    ckpt.save_checkpoint(path, state)
    with ocp.StandardCheckpointer() as ckptr:
        tpl = ckpt._abstract_template(ckptr, path)
        leaves = jax.tree.leaves(
            tpl, is_leaf=lambda m: isinstance(m, jax.ShapeDtypeStruct)
        )
        assert all(isinstance(m, jax.ShapeDtypeStruct) for m in leaves)
        restored = ckptr.restore(path, tpl)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state.params["w"])
    )
    assert int(restored["step"]) == 7


def test_load_any_orbax(tmp_path, state):
    path = str(tmp_path / "m.ckpt")
    ckpt.save_checkpoint(path, state)
    variables = ckpt.load_any(path, "UNetSP")
    assert set(variables) == {"params", "batch_stats"}


def test_load_any_torch_pt(tmp_path):
    """A reference-style .pt state_dict loads through the port."""
    torch = pytest.importorskip("torch")
    import importlib.util

    ref_path = "/root/reference/ctunet/pytorch/models.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("refmodels", ref_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    m = mod.UNetSP()
    pt = str(tmp_path / "ref.pt")
    torch.save(m.state_dict(), pt)
    variables = ckpt.load_any(pt, "UNetSP")
    assert "unet" in variables["params"]
    assert "unet" in variables["batch_stats"]


def test_is_torch_checkpoint(tmp_path):
    p = tmp_path / "x.pt"
    p.write_bytes(b"")
    assert ckpt.is_torch_checkpoint(str(p))
    assert not ckpt.is_torch_checkpoint(str(tmp_path))
