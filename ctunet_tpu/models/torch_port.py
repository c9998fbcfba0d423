"""Import reference (PyTorch) checkpoints into flax variable trees.

The reference saves ``state_dict`` files (``ctunet/pytorch/Model.py:282``)
and can also load whole pickled modules (``Model.py:464-472``). This module
converts those state_dicts to this framework's variable trees so existing
trained models keep working bit-for-bit:

- Conv3d / ConvTranspose3d weights ``(O,I,kd,kh,kw)`` / ``(I,O,kd,kh,kw)``
  -> flax kernels ``(kd,kh,kw,I,O)`` / transpose-kernel layout — both are the
  same ``transpose(2,3,4,1,0)`` (verified numerically against torch in
  ``tests/test_torch_parity.py``);
- BatchNorm weight/bias -> scale/bias params; running_mean/var ->
  ``batch_stats``;
- the generic UNet's dead center-block weights (quirk Q1, SURVEY.md §5;
  ``models.py:238-241``) are dropped — they are not in the reference's data
  path either.

Loading does not require torch: ``.pt`` files are unpickled with a minimal
torch-free unpickler when torch is absent (torch is only an optional dep).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# state_dict acquisition
# ---------------------------------------------------------------------------


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pt`` checkpoint into {name: ndarray}.

    Accepts both formats the reference produces/loads
    (``Model.py:464-472``): a plain state_dict, or a pickled module (then
    its ``state_dict()`` is taken). Uses torch if importable.
    """
    import torch

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(loaded, dict):
        loaded = loaded.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in loaded.items()}


# ---------------------------------------------------------------------------
# key mapping
# ---------------------------------------------------------------------------


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch (O,I,kd,kh,kw) or convT (I,O,kd,kh,kw) -> flax (kd,kh,kw,.,.)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _strip_prefixes(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove ``module.`` (nn.DataParallel) wrappers (ref ``Model.py:486``)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _port_conv_unit(params, stats, prefix, conv_idx, torch_sd, tpath):
    """One Conv3d+BN pair at torch indices (conv_idx, conv_idx+1)."""
    w = torch_sd[f"{tpath}.{conv_idx}.weight"]
    _set(params, prefix + ("conv", "kernel"), _conv_kernel(w))
    b_key = f"{tpath}.{conv_idx}.bias"
    if b_key in torch_sd:
        _set(params, prefix + ("conv", "bias"), torch_sd[b_key])
    bn = conv_idx + 1
    _set(params, prefix + ("bn", "scale"), torch_sd[f"{tpath}.{bn}.weight"])
    _set(params, prefix + ("bn", "bias"), torch_sd[f"{tpath}.{bn}.bias"])
    _set(stats, prefix + ("bn", "mean"), torch_sd[f"{tpath}.{bn}.running_mean"])
    _set(stats, prefix + ("bn", "var"), torch_sd[f"{tpath}.{bn}.running_var"])


def _port_generic_unet(torch_sd: Mapping[str, np.ndarray], n_blocks: int,
                       root: Tuple[str, ...]):
    """Generic ``UNet`` family (``models.py:158-261``): d_blocks / u_blocks /
    last_conv. The dead ``cblock.*`` keys are intentionally ignored."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for i in range(n_blocks):
        tpath = f"d_blocks.{i}.block"
        for j, conv_idx in enumerate((0, 3)):
            _port_conv_unit(
                params, stats, root + (f"d{i}", f"unit{j}"), conv_idx,
                torch_sd, tpath,
            )

    for j in range(n_blocks):
        tpath = f"u_blocks.{j}.block"
        _set(params, root + (f"u{j}", "upconv", "kernel"),
             _conv_kernel(torch_sd[f"{tpath}.0.weight"]))
        _set(params, root + (f"u{j}", "upconv", "bias"),
             torch_sd[f"{tpath}.0.bias"])
        for k, conv_idx in enumerate((1, 4)):
            _port_conv_unit(
                params, stats, root + (f"u{j}", f"unit{k}"), conv_idx,
                torch_sd, tpath,
            )

    _set(params, root + ("last_conv", "kernel"),
         _conv_kernel(torch_sd["last_conv.weight"]))
    _set(params, root + ("last_conv", "bias"), torch_sd["last_conv.bias"])
    return params, stats


def _port_legacy(torch_sd: Mapping[str, np.ndarray]):
    """Legacy ``recAE_v2_fixed`` / ``UNet4_2IC`` (``models.py:441-557``)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for name in ("dblock1", "dblock2", "dblock3", "dblock4", "cblock_center"):
        for j, conv_idx in enumerate((0, 3)):
            _port_conv_unit(
                params, stats, (name, f"unit{j}"), conv_idx, torch_sd, name
            )

    for name in ("ublock1", "ublock2", "ublock3", "ublock4"):
        _set(params, (name, "upconv", "kernel"),
             _conv_kernel(torch_sd[f"{name}.0.weight"]))
        _set(params, (name, "upconv", "bias"), torch_sd[f"{name}.0.bias"])
        for k, conv_idx in enumerate((1, 4)):
            _port_conv_unit(
                params, stats, (name, f"unit{k}"), conv_idx, torch_sd, name
            )

    _set(params, ("last_conv", "kernel"),
         _conv_kernel(torch_sd["last_conv.weight"]))
    _set(params, ("last_conv", "bias"), torch_sd["last_conv.bias"])
    return params, stats


_N_BLOCKS = {
    "UNet4b2i3o": 4,
    "UNet5b2i3o": 5,
    "UNet4b1i3o": 4,
    "UNetSP": 4,
    "UNetSPSmall": 5,
    "UNetDO": 4,
}
_LEGACY = {"recAE_v2_fixed", "UNet4_2IC"}


def port_state_dict(
    state_dict: Mapping[str, np.ndarray], model_class: str
) -> Dict[str, Any]:
    """Convert a reference state_dict to flax ``{'params', 'batch_stats'}``.

    Legacy fixed-U-Net names map at the tree root; generic-family names map
    under the ``unet`` submodule (the head models wrap the plain UNet).
    """
    sd = _strip_prefixes(dict(state_dict))
    if model_class in _LEGACY:
        params, stats = _port_legacy(sd)
    elif model_class in _N_BLOCKS:
        params, stats = _port_generic_unet(sd, _N_BLOCKS[model_class], ("unet",))
    else:
        raise KeyError(f"No torch port mapping for model '{model_class}'")
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, model_class: str) -> Dict[str, Any]:
    """One-shot: read a reference ``.pt`` file and port it."""
    return port_state_dict(load_state_dict(path), model_class)
