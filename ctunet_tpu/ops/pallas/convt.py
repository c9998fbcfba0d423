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
from typing import Optional, Tuple

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


# ---------------------------------------------------------------------------
# Chain-direct variant: ConvT(k2,s2) straight from the chained flat layout
# (ops/pallas/conv3d.py) into the chained flat layout of the next conv, at
# pack 2*pa (the pack the decoder's conv units want). The W-doubling lands
# in the LANES as a block-diagonal matmul (input lane (s, ci) -> output lane
# (2s + c-parity, co)), so the packed formulation is also ~pa x denser in
# useful MACs than the row-per-W form above, and there is zero XLA glue on
# either side.
# ---------------------------------------------------------------------------

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_chain_matrices(kernel: np.ndarray, bias: np.ndarray, pa: int):
    """flax transpose_kernel layout (2,2,2,O,I) -> block-diag per-(a,b)
    matrices (2, 2, Cin_p, Cout_p) for pack-``pa`` chained input, plus the
    pack-``2*pa`` bias row (1, Cout_p).

    M[a][b][s*Ci + c, (2s + cpar)*Co + o] = K[a, b, cpar, o, c].
    """
    k = np.asarray(kernel, np.float32)
    co, ci = k.shape[3], k.shape[4]
    cin_p = _round_up(pa * ci, LANE)
    cout_p = _round_up(2 * pa * co, LANE)
    m = np.zeros((2, 2, cin_p, cout_p), np.float32)
    for s in range(pa):
        for cpar in range(2):
            m[:, :,
              s * ci: (s + 1) * ci,
              (2 * s + cpar) * co: (2 * s + cpar + 1) * co,
              ] = np.transpose(k[:, :, cpar], (0, 1, 3, 2))
    pb = np.zeros((1, cout_p), np.float32)
    pb[0, : 2 * pa * co] = np.tile(np.asarray(bias, np.float32), 2 * pa)
    return m, pb


def _kernel_chain(a_hbm, b_hbm, ma_ref, mb_ref, bias_ref, out_hbm,
                  abuf, bbuf, acc, outbuf, zbuf, sem_a, sem_b, sem_o,
                  sem_z, *, ht, wpad, wp, n_h, hh, dh, rin, dual):
    z = pl.program_id(0)
    h = pl.program_id(1)
    y0 = h * ht

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _init():
        zbuf[:] = jnp.zeros_like(zbuf)

    cp_a = pltpu.make_async_copy(
        a_hbm.at[z + 1, pl.ds((1 + y0) * wpad, rin)], abuf, sem_a
    )
    cp_a.start()
    if dual:
        cp_b = pltpu.make_async_copy(
            b_hbm.at[z + 1, pl.ds((1 + y0) * wpad, rin)], bbuf, sem_b
        )
        cp_b.start()

    def _zero(plane, row0, nrows):
        cp = pltpu.make_async_copy(
            zbuf.at[pl.ds(0, nrows)],
            out_hbm.at[plane, pl.ds(row0, nrows)],
            sem_z,
        )
        cp.start()
        cp.wait()

    # Border upkeep while inputs stream in.
    for apar in range(2):
        @pl.when(h == 0)
        def _top(apar=apar):
            _zero(1 + 2 * z + apar, 0, wpad)

        @pl.when(h == n_h - 1)
        def _bottom(apar=apar):
            _zero(1 + 2 * z + apar, (2 * hh + 1) * wpad, wpad)

    @pl.when(z == 0)
    def _plane0():
        _zero(0, h * 2 * rin, 2 * rin)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, 2 * hh * wpad, 2 * wpad)

    @pl.when(z == dh - 1)
    def _planeD():
        _zero(2 * dh + 1, h * 2 * rin, 2 * rin)

    @pl.when(jnp.logical_and(z == dh - 1, h == 0))
    def _planeD_tail():
        _zero(2 * dh + 1, 2 * hh * wpad, 2 * wpad)

    cp_a.wait()
    if dual:
        cp_b.wait()

    col = jax.lax.broadcasted_iota(jnp.int32, (rin, 1), 0) % wpad
    xa = abuf[:]
    xb = bbuf[:] if dual else None
    for apar in range(2):
        for bpar in range(2):
            m = jax.lax.dot_general(
                xa, ma_ref[apar, bpar], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if dual:
                m = m + jax.lax.dot_general(
                    xb, mb_ref[apar, bpar], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            m = m + bias_ref[0][None, :]
            m = jnp.where(col < wp, m, 0.0)  # W-pad columns stay zero
            acc[bpar] = m
        # acc rows (bpar, yl, w') must interleave as (yl, bpar, w') in the
        # output plane; copy per-y row blocks (static loop).
        for yl in range(ht):
            outbuf[(2 * yl) * wpad: (2 * yl + 1) * wpad] = (
                acc[0, yl * wpad: (yl + 1) * wpad]
            ).astype(outbuf.dtype)
            outbuf[(2 * yl + 1) * wpad: (2 * yl + 2) * wpad] = (
                acc[1, yl * wpad: (yl + 1) * wpad]
            ).astype(outbuf.dtype)
        cp_o = pltpu.make_async_copy(
            outbuf,
            out_hbm.at[1 + 2 * z + apar,
                       pl.ds((1 + 2 * y0) * wpad, 2 * rin)],
            sem_o,
        )
        cp_o.start()
        cp_o.wait()


def conv_transpose_chain(
    a_chain: jax.Array,
    mats_a: jax.Array,
    bias2: jax.Array,
    hh: int,
    wp: int,
    b_chain: Optional[jax.Array] = None,
    mats_b: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """ConvT(k2,s2) of ``cat(a, b)``, chained layout in -> chained out.

    :param a_chain: (Dh+2, (Hh+2)*wpad, Cpa) at pack ``pa``.
    :param mats_a: (2, 2, Cpa, Cpo) from :func:`build_chain_matrices`.
    :param b_chain: optional second operand (same spatial chain, own lanes).
    :returns: (2Dh+2, (2Hh+2)*wpad, Cpo) chained layout at pack ``2*pa``.
    """
    dh2, rows, cpa = a_chain.shape
    dh = dh2 - 2
    wpad = rows // (hh + 2)
    assert wpad * (hh + 2) == rows and wpad % 8 == 0
    cpo = mats_a.shape[-1]
    dual = b_chain is not None
    cpb = b_chain.shape[-1] if dual else cpa

    ht = _pick_h_tile_chain(hh, wpad, cpa, cpb, cpo)
    n_h = hh // ht
    rin = ht * wpad

    kern = functools.partial(
        _kernel_chain, ht=ht, wpad=wpad, wp=wp, n_h=n_h, hh=hh, dh=dh,
        rin=rin, dual=dual,
    )
    b_in = b_chain if dual else a_chain  # placeholder ref when single
    mb_in = mats_b if dual else mats_a
    return pl.pallas_call(
        kern,
        grid=(dh, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (2 * dh + 2, (2 * hh + 2) * wpad, cpo), a_chain.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((rin, cpa), a_chain.dtype),
            pltpu.VMEM((rin, cpb), a_chain.dtype),
            pltpu.VMEM((2, rin, cpo), jnp.float32),
            pltpu.VMEM((2 * rin, cpo), a_chain.dtype),
            pltpu.VMEM((max(2 * rin, 2 * wpad), cpo), a_chain.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_chain, b_in, mats_a.astype(a_chain.dtype),
      mb_in.astype(a_chain.dtype), bias2)


def _pick_h_tile_chain(hh, wpad, cpa, cpb, cpo, vmem_budget=10 * 2**20):
    # ht also bounds the static interleave-copy loop, so cap it.
    for ht in sorted((t for t in range(1, min(hh, 16) + 1) if hh % t == 0),
                     reverse=True):
        rin = ht * wpad
        need = (
            rin * (cpa + cpb) * 2
            + 2 * rin * cpo * 4
            + 4 * rin * cpo * 2
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no chain H tile fits: H={hh}, wpad={wpad}")
