"""Pallas TPU kernel: stride-2 transposed conv + depth-to-space, fused.

The engine's einsum formulation of ConvTranspose(k2, s2) leaves XLA a
(z,a,y,b,x,c) interleave transpose that costs ~23 ms at full resolution —
14x off bandwidth, and XLA's best (a strided ``.at[::2].set`` variant
measures 2x worse; BASELINE.md). This kernel computes the transposed conv
as one matmul per (a, b) output parity and assembles the interleave with
tile-preserving reshapes only:

- input plane (Hh*Wh, Ci) @ (Ci, 2*Co) -> (Hh*Wh, 2*Co); splitting the
  leading dim to (Hh, Wh, 2Co) preserves tiling when Wh % 8 == 0;
- the b-parity rows assemble via a leading-dim scratch write
  ``acc[:, b] = ...`` and a leading-dims merge reshape (Hh,2,..)->(2Hh,..);
- the c-parity lands in the minor dim, i.e. the output IS the packed-by-2
  layout ``(2Dh, 2Hh, Wh, 2*Co)`` — unpacking to standard (or repacking for
  the next fused conv) is a pure XLA reshape.

Used by the engine when ``Wh % 8 == 0`` (the expensive full-res level);
smaller levels keep the einsum path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_matrices(kernel: np.ndarray, bias: np.ndarray):
    """flax transpose_kernel=True layout (2,2,2,O,I) -> per-(a,b) matmul
    weights (2,2, I, 2*O) with columns ordered (c, o), plus packed-2 bias.

    Matches the verified semantics of ``nn.ConvTranspose(transpose_kernel=
    True)`` (and ``engine._conv_transpose_k2s2``):
    out[2z+a, 2y+b, 2x+c, o] = sum_i x[z,y,x,i] * K[a,b,c,o,i] — no flip.
    """
    k = np.asarray(kernel, np.float32)
    out_c = k.shape[3]
    in_c = k.shape[4]
    mats = np.transpose(k, (0, 1, 4, 2, 3)).reshape(2, 2, in_c, 2 * out_c)
    pb = np.tile(np.asarray(bias, np.float32), 2)[None]  # (1, 2*O)
    return np.ascontiguousarray(mats), pb


def _kernel(x_ref, w_ref, b_ref, out_ref, acc, *, ht, wh, co2):
    xp = x_ref[0]  # (HT*Wh, Ci)
    for a in range(2):
        for b in range(2):
            m = jax.lax.dot_general(
                xp, w_ref[a, b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[0][None, :]
            acc[:, b] = m.reshape(ht, wh, co2)
        out_ref[a] = acc[:].reshape(2 * ht, wh, co2).astype(out_ref.dtype)


def _pick_h_tile(hh, wh, ci, co2, vmem_budget=8 * 2**20):
    lanes = lambda c: -(-c // 128) * 128
    for ht in sorted((t for t in range(1, hh + 1) if hh % t == 0),
                     reverse=True):
        if (ht * wh) % 8:
            continue
        need = (
            ht * wh * lanes(ci) * 2          # input block (bf16)
            + ht * 2 * wh * lanes(co2) * 4   # acc scratch (f32)
            + 2 * 2 * ht * wh * lanes(co2) * 2  # out block
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no H tile fits for Hh={hh}, Wh={wh}")


def conv_transpose_k2s2(
    x: jax.Array,
    mats: jax.Array,
    bias2: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """(Dh, Hh, Wh, Ci) -> packed-2 (2Dh, 2Hh, Wh, 2*Co). Wh % 8 == 0.

    k2s2 has no tap overlap, so H tiles need no halo; the grid is
    (Dh, Hh/HT)."""
    dh, hh, wh, ci = x.shape
    assert wh % 8 == 0, f"Wh={wh} must be a multiple of 8"
    co2 = mats.shape[-1]
    ht = _pick_h_tile(hh, wh, ci, co2)
    n_h = hh // ht
    xf = x.reshape(dh, hh * wh, ci)
    out = pl.pallas_call(
        functools.partial(_kernel, ht=ht, wh=wh, co2=co2),
        grid=(dh, n_h),
        in_specs=[
            pl.BlockSpec((1, ht * wh, ci), lambda z, h: (z, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, 2 * ht, wh, co2), lambda z, h: (z, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2 * dh, 2 * hh, wh, co2), x.dtype),
        scratch_shapes=[pltpu.VMEM((ht, 2, wh, co2), jnp.float32)],
        interpret=interpret,
    )(xf, mats.astype(x.dtype), bias2)
    return out


def unpack2(out: jax.Array, cout: int) -> jax.Array:
    """packed-2 (D, H, Wh, 2*Co) -> standard (D, H, 2*Wh, Co) (pure reshape)."""
    d, hh, wh, _ = out.shape
    return out.reshape(d, hh, wh * 2, cout)


# ---------------------------------------------------------------------------
# Dual-operand variant: ConvTranspose over a CONCAT input computed as a
# weight-split sum of two transposed convs, fused into ONE kernel. Replaces
# two kernel launches + a full-resolution XLA add (measured 5.1 + 5.1 +
# 12.3 ms at 224x304x304 -> one ~7 ms call).
# ---------------------------------------------------------------------------


def _kernel_dual(a_ref, b_ref, wa_ref, wb_ref, bias_ref, out_ref, acc, *,
                 ht, wh, co2):
    xa = a_ref[0]  # (HT*Wh, Ca)
    xb = b_ref[0]  # (HT*Wh, Cb)
    for a in range(2):
        for b in range(2):
            m = jax.lax.dot_general(
                xa, wa_ref[a, b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m + jax.lax.dot_general(
                xb, wb_ref[a, b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc[:, b] = (m + bias_ref[0][None, :]).reshape(ht, wh, co2)
        out_ref[a] = acc[:].reshape(2 * ht, wh, co2).astype(out_ref.dtype)


def conv_transpose_k2s2_dual(
    a: jax.Array,
    b: jax.Array,
    mats_a: jax.Array,
    mats_b: jax.Array,
    bias2: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """ConvT(k2,s2) of ``cat(a, b)`` -> packed-2 (2Dh, 2Hh, Wh, 2*Co).

    ``mats_a``/``mats_b``: :func:`build_matrices` of the kernel's first
    ``Ca`` / remaining ``Cb`` input-channel slices. Wh % 8 == 0.
    """
    dh, hh, wh, ca = a.shape
    assert b.shape[:3] == (dh, hh, wh), (a.shape, b.shape)
    assert wh % 8 == 0, f"Wh={wh} must be a multiple of 8"
    co2 = mats_a.shape[-1]
    cb = b.shape[3]
    ht = _pick_h_tile_dual(hh, wh, ca, cb, co2)
    n_h = hh // ht
    af = a.reshape(dh, hh * wh, ca)
    bf = b.reshape(dh, hh * wh, cb)
    out = pl.pallas_call(
        functools.partial(_kernel_dual, ht=ht, wh=wh, co2=co2),
        grid=(dh, n_h),
        in_specs=[
            pl.BlockSpec((1, ht * wh, ca), lambda z, h: (z, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht * wh, cb), lambda z, h: (z, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, 2 * ht, wh, co2), lambda z, h: (z, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2 * dh, 2 * hh, wh, co2), a.dtype),
        scratch_shapes=[pltpu.VMEM((ht, 2, wh, co2), jnp.float32)],
        interpret=interpret,
    )(af, bf, mats_a.astype(a.dtype), mats_b.astype(a.dtype), bias2)
    return out


def _pick_h_tile_dual(hh, wh, ca, cb, co2, vmem_budget=8 * 2**20):
    lanes = lambda c: -(-c // 128) * 128
    for ht in sorted((t for t in range(1, hh + 1) if hh % t == 0),
                     reverse=True):
        if (ht * wh) % 8:
            continue
        need = (
            ht * wh * (lanes(ca) + lanes(cb)) * 2
            + ht * 2 * wh * lanes(co2) * 4
            + 2 * 2 * ht * wh * lanes(co2) * 2
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no H tile fits for Hh={hh}, Wh={wh}")
