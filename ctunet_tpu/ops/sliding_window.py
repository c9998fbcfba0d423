"""Sliding-window patch inference with Gaussian overlap blending.

A capability the reference lacks entirely (SURVEY.md §3.4: whole volumes go
through the net in one shot at batch 1) and the BASELINE.json north star
asks for: tile a large CT volume into overlapping patches, run the network
per patch, and blend overlaps with a Gaussian importance window.

TPU-native design: the patch grid is static (computed from the traced volume
shape), extraction/accumulation run inside one ``lax.scan`` over a start-
index array — a single compiled program regardless of patch count — with
``dynamic_slice`` reads and read-modify-write ``dynamic_update_slice``
accumulation in f32. With ``patch_batch`` K, each scan step runs K
independent patch forwards (batched on the XLA path); the grid pads to a
multiple of K with zero-blend-weight entries, keeping the result
bit-identical to the unbatched scan.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def patch_starts(size: int, patch: int, step: int) -> np.ndarray:
    """Start offsets covering [0, size-patch] inclusive with ~step spacing."""
    if size <= patch:
        return np.array([0], np.int32)
    n = int(np.ceil((size - patch) / step)) + 1
    return np.round(np.linspace(0, size - patch, n)).astype(np.int32)


def grid_starts(
    shape: Sequence[int], patch: Sequence[int], overlap: float
) -> np.ndarray:
    """All (z, y, x) patch starts for a volume shape."""
    steps = [max(1, int(p * (1.0 - overlap))) for p in patch]
    axes = [
        patch_starts(s, p, st) for s, p, st in zip(shape, patch, steps)
    ]
    return np.array(list(itertools.product(*axes)), np.int32).reshape(-1, 3)


def gaussian_window(patch: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """Separable 3D Gaussian importance window (center-weighted blending)."""
    ws = []
    for p in patch:
        c = (p - 1) / 2.0
        sigma = max(p * sigma_scale, 1.0)
        x = np.arange(p, dtype=np.float64)
        ws.append(np.exp(-0.5 * ((x - c) / sigma) ** 2))
    w = ws[0][:, None, None] * ws[1][None, :, None] * ws[2][None, None, :]
    w = w / w.max()
    return np.maximum(w, 1e-4).astype(np.float32)


def make_sliding_window_fn(
    model,
    patch_size=128,
    overlap: float = 0.5,
    atlas=None,
    compute_dtype=jnp.bfloat16,
    gaussian: bool = True,
    apply_fn=None,
    patch_batch: int = 1,
):
    """Build ``predict(variables, images)`` running tiled inference.

    ``images``: (B, D, H, W) float volumes, each dim >= patch (pad first).
    Returns the model's output structure with full-volume blended maps,
    channels-last f32.

    ``apply_fn``: optional per-patch forward ``(variables, x) -> out`` with
    ``x`` (K, pz, py, px, C) — e.g. the fused Pallas engine
    (``engine.build_predict``) so the serving path runs per patch; defaults
    to ``model.apply``.

    ``patch_batch``: patches per scan step. The K patch forwards inside a
    step carry no data dependency on each other (only the accumulator
    read-modify-writes are ordered), so the compiler overlaps their
    launches/layout work; with the XLA ``model.apply`` path the K patches
    additionally run as ONE batched forward (bigger matmuls on the deep
    levels). The grid pads to a multiple of K by repeating the last start
    with a ZERO blend weight — padded entries contribute nothing, so the
    result is bit-identical to ``patch_batch=1``.
    """
    if isinstance(patch_size, int):
        patch = (patch_size, patch_size, patch_size)
    else:
        patch = tuple(int(p) for p in patch_size)
    if apply_fn is None:
        def apply_fn(variables, x):
            return model.apply(variables, x, False)
    atlas_c = None if atlas is None else jnp.asarray(atlas, jnp.float32)
    win_np = (
        gaussian_window(patch) if gaussian
        else np.ones(patch, np.float32)
    )
    kb = max(1, int(patch_batch))

    @partial(jax.jit, static_argnames=())
    def _predict(variables, images, atlas_c):
        b, dz, dy, dx = images.shape
        starts = grid_starts((dz, dy, dx), patch, overlap)  # static
        n = starts.shape[0]
        n_pad = -(-n // kb) * kb
        flags = np.ones(n_pad, np.float32)
        if n_pad > n:
            flags[n:] = 0.0  # padded entries blend with zero weight
            starts = np.concatenate(
                [starts, np.repeat(starts[-1:], n_pad - n, axis=0)]
            )
        starts_dev = jnp.asarray(starts.reshape(-1, kb, 3), jnp.int32)
        flags_dev = jnp.asarray(flags.reshape(-1, kb))
        win = jnp.asarray(win_np)

        def run_one(vol):
            def slice_patch(start):
                pz, py, px = start[0], start[1], start[2]
                p_img = jax.lax.dynamic_slice(vol, (pz, py, px), patch)
                chans = [p_img]
                if atlas_c is not None:
                    chans.append(
                        jax.lax.dynamic_slice(atlas_c, (pz, py, px), patch)
                    )
                return jnp.stack(chans, axis=-1).astype(compute_dtype)

            def apply_patches(starts_k):  # (K, 3) -> tree of (K, ...) f32
                x = jnp.stack(
                    [slice_patch(starts_k[j]) for j in range(kb)]
                )
                out = apply_fn(variables, x)
                return jax.tree.map(lambda o: o.astype(jnp.float32), out)

            # Probe output structure with one step to size the accumulators.
            probe = jax.eval_shape(apply_patches, starts_dev[0])
            acc = jax.tree.map(
                lambda s: jnp.zeros((dz, dy, dx, s.shape[-1]), jnp.float32),
                probe,
            )
            wacc = jnp.zeros((dz, dy, dx), jnp.float32)

            def body(carry, step):
                starts_k, flags_k = step
                acc, wacc = carry
                out = apply_patches(starts_k)
                for j in range(kb):
                    pz, py, px = (
                        starts_k[j, 0], starts_k[j, 1], starts_k[j, 2]
                    )
                    win_j = win * flags_k[j]

                    def add(a, o):
                        cur = jax.lax.dynamic_slice(
                            a, (pz, py, px, 0), (*patch, o.shape[-1])
                        )
                        return jax.lax.dynamic_update_slice(
                            a, cur + o[j] * win_j[..., None],
                            (pz, py, px, 0),
                        )

                    acc = jax.tree.map(add, acc, out)
                    cur_w = jax.lax.dynamic_slice(
                        wacc, (pz, py, px), patch
                    )
                    wacc = jax.lax.dynamic_update_slice(
                        wacc, cur_w + win_j, (pz, py, px)
                    )
                return (acc, wacc), None

            (acc, wacc), _ = jax.lax.scan(
                body, (acc, wacc), (starts_dev, flags_dev)
            )
            return jax.tree.map(lambda a: a / wacc[..., None], acc)

        outs = [run_one(images[i]) for i in range(b)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def predict(variables, images):
        # The atlas rides as a jit ARGUMENT: closed-over it would be inlined
        # as an HLO constant (235 MB at 512-res — oversized the remote
        # compile request).
        return _predict(variables, images, atlas_c)

    return predict
