"""Small host-side helpers (paths, timing).

Mirrors the reference's grab-bag utilities that aren't tensor math:
``makedir`` (``ctunet/utilities.py:22-32``), ``tic``/``toc_eps`` epoch ETA
(``utilities.py:271-304``).
"""

from __future__ import annotations

import os
import timeit
from typing import Optional


def makedir(path: Optional[str] = None) -> Optional[str]:
    """Create the folder at ``path`` if missing; return the path."""
    if not path:
        return None
    os.makedirs(path, exist_ok=True)
    return path


def tic() -> float:
    """Start a wall-clock timer."""
    return timeit.default_timer()


def toc_eps(ep_time: float, n_epoch: int, epochs: int, print_out: bool = True) -> float:
    """Stop the timer and print estimated remaining training time."""
    ep_time = timeit.default_timer() - ep_time
    remaining = int(ep_time * (epochs + 1 - n_epoch))
    hours = remaining // 3600
    minutes = (remaining - hours * 3600) // 60
    if print_out:
        print(
            "({}%) Remaining time (HH:MM): {}:{}\n".format(
                int(100 * n_epoch / float(epochs)), hours, minutes
            )
        )
    return ep_time


def model_summary(model, variables, input_shape, *,
                  print_out: bool = True) -> str:
    """Parameter table + total count + estimated forward FLOPs.

    Implements the ``show_model_summary`` config key whose consumer the
    reference left commented out (``ctunet/pytorch/Model.py:354-358``:
    ``print(summary(...)); print(count_ops(...))``). Printed once at
    model initialization when the key is truthy.

    :param model: a flax module with ``apply``.
    :param variables: its variables dict (params + batch_stats).
    :param input_shape: full input shape including batch and channels.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    lines = []
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(variables.get("params", {}))[0]
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", str(getattr(p, "idx", p))) for p in path
        )
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        lines.append(f"  {name:<60s} {str(leaf.shape):>20s} {n:>12,d}")
    bn = sum(
        int(np.prod(l.shape)) if l.shape else 1
        for l in jax.tree_util.tree_leaves(variables.get("batch_stats", {}))
    )
    lines.append(f"  {'TOTAL trainable':<60s} {'':>20s} {total:>12,d}")
    if bn:
        lines.append(f"  {'batch-norm running stats':<60s} {'':>20s} {bn:>12,d}")

    try:
        # the net is fully convolutional: FLOPs scale linearly with voxel
        # count, so compile a small probe shape (fast) and scale to the
        # actual input instead of compiling the full volume just to print
        # a summary
        probe = (1, 32, 32, 32, input_shape[-1])
        x = jnp.zeros(probe, jnp.bfloat16)
        compiled = jax.jit(
            lambda v, x: model.apply(v, x, False)
        ).lower(variables, x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        scale = float(np.prod(input_shape[:-1])) / float(np.prod(probe[:-1]))
        lines.append(
            f"  forward FLOPs @ {tuple(input_shape)}: "
            f"{flops * scale / 1e9:.1f} G (scaled from a 32^3 probe)"
        )
    except Exception as e:  # cost analysis is best-effort, backend-dependent
        lines.append(f"  forward FLOPs: unavailable ({type(e).__name__})")

    out = "Model summary:\n" + "\n".join(lines)
    if print_out:
        print(out)
    return out


def view(tensor, save_path: Optional[str] = None):
    """Interactive volume peek (dev helper; ref ``utilities.py:314-315``).

    The reference calls ``sitk.Show`` (external viewer). Here: a
    matplotlib mid-slice montage (axial/coronal/sagittal) of the first
    channel/batch element. Accepts numpy or jax arrays in (D,H,W),
    (D,H,W,C) or (B,D,H,W,C) layout. Shows a window when a display is
    available, else writes a PNG next to the CWD (path returned).
    """
    import numpy as np

    vol = np.asarray(tensor)
    if vol.ndim == 5:
        vol = vol[0]
    if vol.ndim == 4:
        vol = vol[..., 0]
    if vol.ndim != 3:
        raise ValueError(f"view expects a 3D volume, got shape {vol.shape}")

    try:
        import matplotlib
        if save_path is not None or not os.environ.get("DISPLAY"):
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover - matplotlib always in image
        raise RuntimeError(f"view requires matplotlib ({e})")

    d, h, w = vol.shape
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (sl, title) in zip(axes, [
        (vol[d // 2], "axial"),
        (vol[:, h // 2], "coronal"),
        (vol[:, :, w // 2], "sagittal"),
    ]):
        ax.imshow(sl, cmap="gray", interpolation="nearest")
        ax.set_title(f"{title} (mid)")
        ax.axis("off")
    fig.tight_layout()
    if save_path is None and os.environ.get("DISPLAY"):
        plt.show()
        return None
    save_path = save_path or "view.png"
    fig.savefig(save_path, dpi=100)
    plt.close(fig)
    print(f"view: wrote {save_path}")
    return save_path
