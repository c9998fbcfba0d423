"""Checkpoint save/restore (orbax) + reference ``.pt`` resume.

Improves on the reference checkpointing (``ctunet/pytorch/Model.py:266-296,
448-472``, SURVEY.md §5): params AND optimizer state AND step are saved (the
reference restarts Adam moments from zero on resume), with the same dual
best-model/periodic-checkpoint semantics. Reference torch ``.pt`` files are
accepted transparently on resume via the weight port.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from .utils import makedir


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, state, extra: Optional[Dict] = None) -> None:
    """Save a TrainState (+ small metadata dict) to ``path`` (directory)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.expanduser(path))
    makedir(os.path.dirname(path))
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    if extra:
        # Orbax StandardCheckpointer holds arrays/numbers only; metadata
        # (epoch, model class, ...) goes in a JSON sidecar.
        import json

        with open(path + ".meta.json", "w") as f:
            json.dump(extra, f)


def restore_checkpoint(path: str, template_state=None) -> Dict[str, Any]:
    """Restore a checkpoint dir. With a template TrainState, arrays come back
    with matching structure/dtypes; otherwise raw pytrees."""
    ocp = _ocp()
    path = os.path.abspath(os.path.expanduser(path))
    with ocp.StandardCheckpointer() as ckptr:
        if template_state is not None:
            template = {
                "params": template_state.params,
                "batch_stats": template_state.batch_stats,
                "opt_state": template_state.opt_state,
                "step": template_state.step,
            }
            # Inspect the stored tree first: only fall back to a raw restore
            # when the checkpoint genuinely lacks keys the template expects
            # (e.g. a best-model-only save without opt_state); a corrupt or
            # shape-mismatched checkpoint still raises.
            stored_keys = _stored_top_keys(path)
            if stored_keys is None or set(template) <= stored_keys:
                try:
                    return ckptr.restore(path, template)
                except Exception as e:
                    if stored_keys is not None:
                        raise
                    # No readable _METADATA (older orbax / schema drift):
                    # behave like the documented fallback, loudly.
                    print(
                        f"template restore of {path} failed "
                        f"({type(e).__name__}: {e}); restoring raw tree."
                    )
            else:
                print(
                    f"checkpoint {path} lacks "
                    f"{set(template) - stored_keys}; restoring raw tree "
                    "(no template)."
                )
        try:
            return ckptr.restore(path)
        except ValueError as e:
            if "not found in jax.local_devices" not in str(e):
                raise
            # Cross-device restore: the stored sharding metadata names
            # devices of the SAVING platform (e.g. a TPU-trained
            # checkpoint opened on CPU). Rebuild an abstract template
            # from the checkpoint's own metadata — shapes/dtypes without
            # shardings — so orbax restores onto the default device.
            return ckptr.restore(path, _abstract_template(ckptr, path))


def _abstract_template(ckptr, path: str):
    """Shape/dtype-only pytree from an orbax checkpoint's metadata
    (drops stored shardings for cross-platform restore)."""
    meta = ckptr.metadata(path)
    meta = getattr(meta, "item_metadata", meta)  # orbax API drift
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    return jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        meta,
        is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"),
    )


def _stored_top_keys(path: str) -> Optional[set]:
    """Top-level pytree keys recorded in an orbax checkpoint's _METADATA."""
    import json

    try:
        with open(os.path.join(path, "_METADATA")) as f:
            md = json.load(f)
        keys = set()
        for item in md.get("tree_metadata", {}).values():
            km = item.get("key_metadata") or []
            if km:
                keys.add(km[0]["key"])
        return keys or None
    except Exception:
        return None


def is_torch_checkpoint(path: str) -> bool:
    return os.path.isfile(os.path.expanduser(path)) and path.endswith(".pt")


def load_any(path: str, model_class: str) -> Dict[str, Any]:
    """Load model variables from an orbax dir OR a reference torch ``.pt``
    (both formats the reference's ``load_model`` accepts, ``Model.py:448-472``,
    modulo torch-pickled modules which also work via torch).

    Returns ``{'params': ..., 'batch_stats': ...}``.
    """
    path = os.path.expanduser(path)
    if is_torch_checkpoint(path):
        from .models.torch_port import load_torch_checkpoint

        return load_torch_checkpoint(path, model_class)
    restored = restore_checkpoint(path)
    return {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }
