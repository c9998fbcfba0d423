"""Numerical parity against the reference's own torch models.

These tests load ``/root/reference/ctunet/pytorch/models.py`` directly (it
only imports torch), randomize its weights, port the state_dict through
``ctunet_tpu.models.torch_port``, and require the flax forward pass to match
the torch forward pass to float32 tolerance — the hard checkpoint-parity
gate from SURVEY.md §7 step 3.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.models import build_model
from ctunet_tpu.models.torch_port import port_state_dict

_REF = "/root/reference/ctunet/pytorch/models.py"

pytestmark = [
    pytest.mark.skipif(
        not os.path.exists(_REF), reason="reference repo not mounted"
    ),
    # heavyweight (loads torch + all variants): full-suite lane only
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def ref_models():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("refmodels", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(torch, model, seed=0):
    """Random weights + nontrivial BN running stats."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if k.endswith("running_var"):
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.2
        # num_batches_tracked etc left as-is
    model.load_state_dict(sd)
    return model


def _compare(ref_models, name, in_ch, spatial=16, atol=2e-4):
    import torch

    tm = _randomize(torch, getattr(ref_models, name)())
    tm.eval()
    # disable torch gradient checkpointing requirement on grad
    rng = np.random.default_rng(3)
    x = rng.random((1, spatial, spatial, spatial, in_ch)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        t_out = tm(xt)

    variables = port_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, name
    )
    m = build_model(name, use_checkpoint=False)
    j_out = m.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
        False,
    )

    def to_np_lastc(t):
        return t.permute(0, 2, 3, 4, 1).numpy()

    if isinstance(t_out, tuple):
        for to, jo in zip(t_out, j_out):
            np.testing.assert_allclose(
                np.asarray(jo), to_np_lastc(to), atol=atol
            )
    else:
        np.testing.assert_allclose(
            np.asarray(j_out), to_np_lastc(t_out), atol=atol
        )


def test_parity_unetsp(ref_models):
    _compare(ref_models, "UNetSP", 2)


def test_parity_unetdo(ref_models):
    _compare(ref_models, "UNetDO", 1)


def test_parity_unetspsmall(ref_models):
    _compare(ref_models, "UNetSPSmall", 2, spatial=32)


def test_parity_legacy_recae(ref_models):
    _compare(ref_models, "recAE_v2_fixed", 1)


def test_parity_legacy_unet4_2ic(ref_models):
    _compare(ref_models, "UNet4_2IC", 2)


def test_dataparallel_prefix_stripped(ref_models):
    """state_dicts saved from nn.DataParallel carry 'module.' prefixes
    (ref ``Model.py:481-486``); the port must strip them."""
    import torch

    tm = _randomize(torch, ref_models.UNetSP())
    sd = {f"module.{k}": v.numpy() for k, v in tm.state_dict().items()}
    variables = port_state_dict(sd, "UNetSP")
    assert "unet" in variables["params"]


def test_export_roundtrip_and_forward(ref_models):
    """Export direction: flax variables -> torch state_dict. The exported
    weights must round-trip through the port unchanged AND drive the
    reference torch model to the same outputs as the flax model."""
    import torch

    from ctunet_tpu.models.torch_port import export_state_dict

    model = build_model("UNetSP", compute_dtype="float32",
                        use_checkpoint=False)
    x = jnp.zeros((1, 16, 16, 16, 2), jnp.float32)
    vs = jax.jit(model.init, static_argnums=(2,))(jax.random.key(5), x, False)
    # nontrivial BN stats
    vs = {
        "params": vs["params"],
        "batch_stats": jax.tree.map(
            lambda s: s * 1.1 + 0.02, vs["batch_stats"]
        ),
    }
    sd = export_state_dict(vs, "UNetSP")

    # round trip: port back and compare trees leaf-by-leaf
    back = port_state_dict(sd, "UNetSP")
    for (pa, va), (pb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(vs["params"]),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(back["params"]),
               key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=0)

    # forward parity: merge over a fresh reference model (dead cblock kept)
    tm = ref_models.UNetSP()
    full = tm.state_dict()
    full.update({k: torch.tensor(v) for k, v in sd.items()})
    tm.load_state_dict(full)
    tm.eval()

    rng = np.random.default_rng(7)
    xin = rng.random((1, 16, 16, 16, 2)).astype(np.float32)
    want = model.apply(vs, jnp.asarray(xin), False)
    with torch.no_grad():
        got = tm(torch.tensor(xin).permute(0, 4, 1, 2, 3))
    for g, w in zip(got, want):
        g = g.numpy().transpose(0, 2, 3, 4, 1)
        np.testing.assert_allclose(g, np.asarray(w), atol=2e-4, rtol=1e-3)
