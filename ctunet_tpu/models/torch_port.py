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
    its ``state_dict()`` is taken). Uses torch if importable; otherwise the
    torch-free unpickler below (zip-format ``.pt`` files).
    """
    try:
        import torch
    except ImportError:
        return _load_state_dict_torch_free(path)

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(loaded, dict):
        loaded = loaded.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in loaded.items()}


# ---------------------------------------------------------------------------
# torch-free .pt reader (zip serialization format, torch >= 1.6)
# ---------------------------------------------------------------------------

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StubModule:
    """Placeholder for pickled ``nn.Module`` objects: state arrives via the
    default ``__dict__`` protocol; parameters/buffers are collected by
    :func:`_stub_state_dict`."""

    def __init__(self, *args, **kwargs):  # tolerate constructor args
        pass


def _rebuild_tensor_v2(storage, offset, size, stride, *_):
    arr, dtype = storage
    itemsize = np.dtype(dtype).itemsize
    if not size:
        return arr[offset:offset + 1].reshape(())
    strides = tuple(int(s) * itemsize for s in stride)
    out = np.lib.stride_tricks.as_strided(
        arr[offset:], shape=tuple(int(s) for s in size), strides=strides
    )
    return np.ascontiguousarray(out)


def _rebuild_parameter(data, *_):
    return data


def _load_state_dict_torch_free(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a zip-format ``.pt`` without torch.

    Supports plain tensors (``_rebuild_tensor_v2``) and pickled modules
    (classes are stubbed; the state_dict is reassembled from the stubs'
    ``_parameters``/``_buffers``/``_modules`` trees).
    """
    import pickle
    import zipfile

    zf = zipfile.ZipFile(path)
    pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
    if not pkl_names:
        raise ValueError(
            f"{path} is not a zip-format torch checkpoint (legacy tar-format "
            ".pt files need torch installed to load)"
        )
    prefix = pkl_names[0][: -len("/data.pkl")]

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch._utils" and name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if module == "torch._utils" and name == "_rebuild_parameter":
                return _rebuild_parameter
            if module == "torch" and name in _STORAGE_DTYPES:
                return ("storage_type", name)
            if module in ("builtins", "collections", "copyreg"):
                import importlib

                return getattr(importlib.import_module(module), name)
            # Anything else (nn.Module subclasses in pickled-module files,
            # torch.nn containers, the reference's model classes): stub it.
            return type(name, (_StubModule,), {"__module__": module})

        def persistent_load(self, pid):
            kind, storage_type, key, _location, _numel = pid
            assert kind == "storage", f"unknown persistent id {pid!r}"
            name = (
                storage_type[1]
                if isinstance(storage_type, tuple)
                else storage_type.__name__
            )
            dtype = _STORAGE_DTYPES[name]
            raw = zf.read(f"{prefix}/data/{key}")
            return (np.frombuffer(raw, dtype=dtype), dtype)

    with zf.open(pkl_names[0]) as f:
        loaded = Unpickler(f).load()

    if isinstance(loaded, _StubModule):
        loaded = _stub_state_dict(loaded)
    if not isinstance(loaded, dict):
        raise ValueError(
            f"unsupported object of type {type(loaded).__name__} in {path}"
        )
    return {k: np.asarray(v) for k, v in loaded.items()}


def _stub_state_dict(stub, prefix: str = "") -> Dict[str, np.ndarray]:
    """Reassemble ``state_dict()`` from a stubbed pickled module tree."""
    out: Dict[str, np.ndarray] = {}
    d = getattr(stub, "__dict__", {})
    for name, value in (d.get("_parameters") or {}).items():
        if value is not None:
            out[prefix + name] = np.asarray(value)
    for name, value in (d.get("_buffers") or {}).items():
        if value is not None:
            out[prefix + name] = np.asarray(value)
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            out.update(_stub_state_dict(child, prefix + name + "."))
    return out


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


# ---------------------------------------------------------------------------
# Export (flax variables -> reference torch state_dict layout)
# ---------------------------------------------------------------------------


def _get(tree, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node, np.float32)


def _export_conv_unit(sd, params, stats, prefix, conv_idx, tpath):
    w = _get(params, prefix + ("conv", "kernel"))
    sd[f"{tpath}.{conv_idx}.weight"] = np.ascontiguousarray(
        np.transpose(w, (4, 3, 0, 1, 2))
    )
    try:
        sd[f"{tpath}.{conv_idx}.bias"] = _get(params, prefix + ("conv", "bias"))
    except KeyError:
        pass
    bn = conv_idx + 1
    sd[f"{tpath}.{bn}.weight"] = _get(params, prefix + ("bn", "scale"))
    sd[f"{tpath}.{bn}.bias"] = _get(params, prefix + ("bn", "bias"))
    sd[f"{tpath}.{bn}.running_mean"] = _get(stats, prefix + ("bn", "mean"))
    sd[f"{tpath}.{bn}.running_var"] = _get(stats, prefix + ("bn", "var"))
    sd[f"{tpath}.{bn}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_state_dict(
    variables: Mapping[str, Any], model_class: str
) -> Dict[str, np.ndarray]:
    """Convert flax ``{'params','batch_stats'}`` to the reference torch
    state_dict layout (inverse of :func:`port_state_dict`).

    The generic family's dead center-block weights (quirk Q1) are NOT
    emitted — merge over a freshly constructed reference model's state_dict
    (its ``cblock.*`` entries are dead in the reference data path,
    ``models.py:238-241``).
    """
    if model_class in _LEGACY:
        raise NotImplementedError(
            "legacy export not implemented (port direction only)"
        )
    if model_class not in _N_BLOCKS:
        raise KeyError(f"No torch export mapping for model '{model_class}'")
    n_blocks = _N_BLOCKS[model_class]
    params = variables["params"]["unet"]
    stats = variables["batch_stats"]["unet"]
    sd: Dict[str, np.ndarray] = {}

    for i in range(n_blocks):
        for j, conv_idx in enumerate((0, 3)):
            _export_conv_unit(
                sd, params, stats, (f"d{i}", f"unit{j}"), conv_idx,
                f"d_blocks.{i}.block",
            )
    for j in range(n_blocks):
        tpath = f"u_blocks.{j}.block"
        w = _get(params, (f"u{j}", "upconv", "kernel"))
        # flax transpose_kernel layout (k,k,k,O,I) -> torch convT (I,O,k,k,k)
        sd[f"{tpath}.0.weight"] = np.ascontiguousarray(
            np.transpose(w, (4, 3, 0, 1, 2))
        )
        sd[f"{tpath}.0.bias"] = _get(params, (f"u{j}", "upconv", "bias"))
        for k, conv_idx in enumerate((1, 4)):
            _export_conv_unit(
                sd, params, stats, (f"u{j}", f"unit{k}"), conv_idx, tpath
            )
    w = _get(params, ("last_conv", "kernel"))
    sd["last_conv.weight"] = np.ascontiguousarray(
        np.transpose(w, (4, 3, 0, 1, 2))
    )
    sd["last_conv.bias"] = _get(params, ("last_conv", "bias"))
    return sd
