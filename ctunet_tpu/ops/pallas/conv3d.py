"""Pallas TPU kernel: fused 3x3x3 Conv3D + folded BatchNorm + ReLU.

Why: XLA's 3D convolution on TPU runs at ~0.6 TFLOP/s for the thin-channel
(7-56 ch) layers this U-Net family is made of (measured, BASELINE.md) — the
MXU's 128 lanes are idle on a 7-channel contraction, and layout copies eat
another ~25% of inference time. This kernel restructures the conv so the MXU
sees wide matmuls:

1. **Channel packing is free.** With channels-last minor ordering, viewing
   ``(D, H, W, C)`` as ``(D, H, W/p, p*C)`` is a pure ``reshape`` — no data
   movement. A k=3 conv on the packed tensor is algebraically a k=3 conv
   with *packed weights* ``Wp[dz, dy, t][r*C+ci, s*C+co] = w[dz, dy, dx, ci,
   co]`` where ``u = s+dx-1``, ``t = floor(u/p)``, ``r = u mod p`` (mostly
   zeros at t != 1). Packing by p=16 turns a 7-channel conv into a
   112-channel conv.

2. **Every tap is a contiguous matmul.** Each padded z-plane is stored with
   flattened spatial rows ``(h, w') -> h*(Wp+2) + w'``, so the shifted input
   window of tap ``(dy, t)`` is the rows ``[dy*(Wp+2)+t : ... + H*(Wp+2))``
   — a contiguous offset slice feeding a single
   ``(H*(Wp+2), Cin) @ (Cin, Cout)`` MXU matmul. 27 taps accumulate in an
   f32 VMEM scratch; folded-BN bias and ReLU apply on the way out.

3. **Grid = (depth, H-tiles)**, slabs of 3 padded z-planes DMA'd HBM->VMEM
   per step; H tiling bounds VMEM for channel-rich layers.

Measured on one TPU v5e chip at 224x304x304, 7->7 channels packed x16:
34 ms vs 87 ms for ``lax.conv_general_dilated`` on the same shapes (and the
fused bias+ReLU comes for free). Inference-path kernel; training uses the
XLA conv (a custom VJP is future work).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_weights(
    w: np.ndarray,
    pack: int,
    scale: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Pack (k,k,k,Cin,Cout) conv weights for a W-packed-by-``pack`` input.

    The packed-W tap index stays in {-1, 0, 1} as long as ``pack >= k//2``
    (k=3: any pack; k=5: pack >= 2), so the packed kernel is (k, k, 3).
    Optionally folds a per-output-channel BN scale. Returns
    (k*k*3, pack*Cin padded to 128, pack*Cout padded to 128) float32.
    """
    k = w.shape[0]
    assert w.shape[:3] == (k, k, k) and k % 2 == 1, f"odd k only, got {w.shape}"
    half = k // 2
    assert pack >= max(1, half), (
        f"pack={pack} too small for k={k} (packed taps would exceed 3)"
    )
    cin, cout = w.shape[3], w.shape[4]
    w = np.asarray(w, np.float32)
    if scale is not None:
        w = w * np.asarray(scale, np.float32)[None, None, None, None, :]
    cin_p = _round_up(pack * cin, LANE)
    cout_p = _round_up(pack * cout, LANE)
    out = np.zeros((k, k, 3, cin_p, cout_p), np.float32)
    for dx in range(k):
        for s in range(pack):
            u = s + dx - half
            t = (u + pack) // pack - 1  # floor(u / pack) for u >= -pack
            assert -1 <= t <= 1
            r = u - t * pack
            out[:, :, t + 1, r * cin : (r + 1) * cin, s * cout : (s + 1) * cout] = w[
                :, :, dx
            ]
    return out.reshape(k * k * 3, cin_p, cout_p)


def pack_bias(bias: np.ndarray, pack: int) -> np.ndarray:
    """Tile a (Cout,) bias across packed positions, padded to 128."""
    cout = bias.shape[0]
    cout_p = _round_up(pack * cout, LANE)
    out = np.zeros((1, cout_p), np.float32)
    out[0, : pack * cout] = np.tile(np.asarray(bias, np.float32), pack)
    return out


def fold_bn(bn_scale, bn_bias, bn_mean, bn_var, eps: float = 1e-5):
    """Fold BatchNorm into (scale per out-channel, bias) for the fused conv."""
    inv = np.asarray(bn_scale, np.float32) / np.sqrt(
        np.asarray(bn_var, np.float32) + eps
    )
    bias = np.asarray(bn_bias, np.float32) - np.asarray(bn_mean, np.float32) * inv
    return inv, bias


def _kernel(xp_hbm, w_ref, b_ref, out_ref, slab, acc0, acc1, sem, *, taps,
            rout, n_slab_rows, relu, kd):
    z = pl.program_id(0)
    h = pl.program_id(1)
    row0 = h * rout
    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(z, kd), pl.ds(row0, n_slab_rows)], slab, sem
    )
    cp.start()
    cp.wait()
    # Two independent accumulation chains keep the MXU issue pipeline full
    # (a single chain serializes each dot behind the previous VPU add).
    acc0[:] = jnp.zeros_like(acc0)
    acc1[:] = jnp.zeros_like(acc1)
    for i, (dz, off) in enumerate(taps):
        xs = slab[dz, off : off + rout, :]
        d = jax.lax.dot_general(
            xs, w_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if i % 2 == 0:
            acc0[:] += d
        else:
            acc1[:] += d
    res = acc0[:] + acc1[:] + b_ref[0][None, :]
    if relu:
        res = jnp.maximum(res, 0.0)
    out_ref[0] = res.astype(out_ref.dtype)


def conv3d_fused(
    x: jax.Array,
    packed_w: jax.Array,
    packed_b: jax.Array,
    pack: int,
    k: int = 3,
    relu: bool = True,
    h_tile: Optional[int] = None,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    packed_in: bool = False,
) -> jax.Array:
    """Fused Conv3D(odd k, SAME) + bias + ReLU on a single volume.

    :param x: (D, H, W, Cin) input, W divisible by ``pack`` — or, with
        ``packed_in``, an already-packed (D, H, W/pack, pack*Cin) tensor
        (zero-cost layout shared between chained kernels).
    :param packed_w: (k*k*3, Cin_p, Cout_p) from :func:`pack_weights`.
    :param packed_b: (1, Cout_p) from :func:`pack_bias` (BN-folded).
    :returns: PACKED (D, H, W/pack, Cout_p) output.
    """
    if packed_in:
        d, hh, wp, cin_pk = x.shape
        ww = wp * pack
        assert cin_pk % pack == 0
        cin = cin_pk // pack
    else:
        d, hh, ww, cin = x.shape
        assert ww % pack == 0, f"W={ww} not divisible by pack={pack}"
        wp = ww // pack
        cin_pk = pack * cin
    half = k // 2
    cin_p = packed_w.shape[1]
    cout_p = packed_w.shape[2]
    wp2 = wp + 2

    if h_tile is None:
        h_tile = _pick_h_tile(hh, wp2, cin_p, cout_p, k=k)
    assert hh % h_tile == 0, f"H={hh} not divisible by h_tile={h_tile}"
    n_h = hh // h_tile
    rout = h_tile * wp2
    assert (rout % 8) == 0, (
        f"h_tile*(W/pack+2)={rout} must be a multiple of 8"
    )
    n_slab_rows = _round_up((h_tile + 2 * half) * wp2 + 2, 8)

    # Pack (pure reshape), pad D/H by k//2 and packed-W by 1, pad channels
    # to Cin_p, and flatten (h, w') rows; add slack rows so the last tile's
    # DMA stays in range.
    xq = x if packed_in else x.reshape(d, hh, wp, cin_pk)
    hp = hh + 2 * half
    rows_full = _round_up(hp * wp2 + 2, 8) + n_slab_rows
    xq = jnp.pad(
        xq,
        ((half, half), (half, half), (1, 1), (0, cin_p - cin_pk)),
    )
    xq = xq.reshape(d + 2 * half, hp * wp2, cin_p)
    xq = jnp.pad(xq, ((0, 0), (0, rows_full - hp * wp2), (0, 0)))

    taps = tuple(
        (dz, dy * wp2 + t)
        for dz in range(k) for dy in range(k) for t in range(3)
    )
    kern = functools.partial(
        _kernel, taps=taps, rout=rout, n_slab_rows=n_slab_rows, relu=relu,
        kd=k,
    )
    out = pl.pallas_call(
        kern,
        grid=(d, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rout, cout_p), lambda z, h: (z, h, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, hh * wp2, cout_p), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((k, n_slab_rows, cin_p), x.dtype),
            pltpu.VMEM((rout, cout_p), jnp.float32),
            pltpu.VMEM((rout, cout_p), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xq, packed_w.astype(x.dtype), packed_b)

    # Unflatten rows and drop the 2 pad columns per row. The result is the
    # PACKED (D, H, W/pack, Cout_p) form — chain it into the next packed
    # consumer directly, or apply :func:`unpack_output`.
    return out.reshape(d, hh, wp2, cout_p)[:, :, :wp, :]


def unpack_output(out: jax.Array, pack: int, cout: int) -> jax.Array:
    """(D, H, W/p, Cout_p) -> (D, H, W, Cout) (pure reshape + channel trim)."""
    d, hh, wp, _ = out.shape
    return out[..., : pack * cout].reshape(d, hh, wp * pack, cout)


def _pick_h_tile(hh: int, wp2: int, cin_p: int, cout_p: int,
                 vmem_budget: int = 10 * 2**20, k: int = 3) -> int:
    """Largest H tile (multiple of 8, dividing H) fitting the VMEM budget."""
    for ht in sorted(
        {t for t in range(8, hh + 1, 8) if hh % t == 0}, reverse=True
    ):
        slab = k * _round_up((ht + 2 * (k // 2)) * wp2 + 2, 8) * cin_p * 2
        acc = 2 * ht * wp2 * cout_p * 4  # dual accumulators
        out_blk = ht * wp2 * cout_p * 2
        if slab + acc + out_blk <= vmem_budget:
            return ht
    raise ValueError(
        f"no H tile fits VMEM for H={hh}, wp2={wp2}, cin_p={cin_p}"
    )


def conv3d_k3(
    x: jax.Array,
    w: np.ndarray,
    bias: Optional[np.ndarray] = None,
    bn: Optional[Tuple] = None,
    pack: Optional[int] = None,
    relu: bool = True,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Convenience wrapper: raw weights in, volume out (k inferred from w).

    :param x: (D, H, W, Cin).
    :param w: (k,k,k,Cin,Cout) numpy conv weights (flax kernel layout).
    :param bias: optional (Cout,) conv bias.
    :param bn: optional (scale, bias, mean, var) to fold.
    :param pack: W packing factor; default: largest p in {16,8,4,2,1}
        dividing W with p*Cin <= 512 (and p >= k//2).
    """
    k = int(w.shape[0])
    cin, cout = w.shape[3], w.shape[4]
    ww = x.shape[2]
    if pack is None:
        pack = choose_pack(ww, cin, k=k)
    scale = None
    b = np.zeros(cout, np.float32) if bias is None else np.asarray(bias)
    if bn is not None:
        inv, bn_b = fold_bn(*bn)
        scale = inv
        b = b * inv + bn_b
    pw = jnp.asarray(pack_weights(np.asarray(w), pack, scale))
    pb = jnp.asarray(pack_bias(b, pack))
    out = conv3d_fused(
        x, pw, pb, pack, k=k, relu=relu, interpret=interpret,
        out_dtype=out_dtype,
    )
    return unpack_output(out, pack, cout)


# ---------------------------------------------------------------------------
# Chained (flat-layout) kernel: conv -> conv with ZERO XLA glue between.
#
# Round-1 profiling showed ~45 ms/volume of pure layout copies, pads and
# reshapes BETWEEN the fused conv kernels (each call re-padded and
# re-flattened its input). The chained kernel consumes and produces one
# canonical flat layout, with the halo zeros maintained IN-KERNEL:
#
#   L(D, H, wp, C; pack) = (D+2, (H+2)*wpad, Cp) where
#     wpad = round_up(wp + 1, 8), Cp = round_up(pack*C, 128),
#     valid (z, h, w') at [z+1, (1+h)*wpad + w', :pack*C], w' in [0, wp).
#
# There is no LEFT W-pad column: the zeroed right-pad columns [wp, wpad) of
# the PREVIOUS flat row provide the left-neighbor zeros (row-major
# adjacency), and the leading H-pad row covers the first row's left
# neighbor. Border planes/rows are zeroed by designated grid iterations, so
# a chain of convs needs no XLA pad/copy at all.
# ---------------------------------------------------------------------------


def chain_dims(wp: int, c: int, pack: int) -> Tuple[int, int]:
    """(wpad, Cp) of the chained layout for a (.., wp, pack*c) volume."""
    return _round_up(wp + 1, 8), _round_up(pack * c, LANE)


def to_chain(x_packed: jax.Array, pack: int, fill=0) -> jax.Array:
    """Standard packed (D, H, wp, pack*C[+pad]) -> chained flat layout.

    ``fill`` sets the halo/pad value: 0 for the bf16 engine, -128 for the
    zero-point int8 engine (where stored q = a/s - 128, so "activation
    zero" is q = -128)."""
    d, hh, wp, cpk = x_packed.shape
    wpad = _round_up(wp + 1, 8)
    cp = _round_up(cpk, LANE)
    x = jnp.pad(
        x_packed,
        ((1, 1), (1, 1), (0, wpad - wp), (0, cp - cpk)),
        constant_values=fill,
    )
    return x.reshape(d + 2, (hh + 2) * wpad, cp)


def from_chain(
    y: jax.Array, hh: int, wp: int, cout_pk: Optional[int] = None
) -> jax.Array:
    """Chained flat layout -> standard packed (D, H, wp, cout_pk)."""
    dp2, rows, cp = y.shape
    wpad = rows // (hh + 2)
    y = y.reshape(dp2, hh + 2, wpad, cp)[1:-1, 1:-1, :wp, :]
    return y if cout_pk is None else y[..., :cout_pk]


def repack_chain(
    xc: jax.Array, hh: int, wp_from: int, pack_from: int, c: int,
    pack_to: int, fill=0,
) -> jax.Array:
    """Re-lay a chained volume from ``pack_from`` to ``pack_to`` (same W).

    Pure XLA reshapes (a pack block holds ``pack`` consecutive W voxels,
    so splitting/merging blocks is a contiguous reshape). Used by the
    engines' pack-exhausted tail (5-block models): after the standard-
    space pool halves ``wp``, the first decoder upconv overshoots the
    skips' pack ladder by 2x — one repack re-aligns it so every later
    level rides the efficient pack-16 regime.
    """
    W = wp_from * pack_from
    assert W % pack_to == 0, (wp_from, pack_from, pack_to)
    wp_to = W // pack_to
    xp = from_chain(xc, hh, wp_from, pack_from * c)
    d_, hh_ = xp.shape[0], xp.shape[1]
    xp = xp.reshape(d_, hh_, wp_to, pack_to * c)
    return to_chain(xp, pack_to, fill=fill)


def _chain_kernel(x_hbm, w_ref, b_ref, out_hbm, slab, acc, outbuf, zbuf,
                  sem_in, sem_out, sem_z, *, taps, rout, dma_rows, relu,
                  wp, wpad, ht, n_h, hh, d):
    z = pl.program_id(0)
    h = pl.program_id(1)
    h0 = h * ht

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _init():
        slab[:, 0:8, :] = jnp.zeros_like(slab[:, 0:8, :])
        zbuf[:] = jnp.zeros_like(zbuf)

    cp_in = pltpu.make_async_copy(
        x_hbm.at[pl.ds(z, 3), pl.ds(h0 * wpad, dma_rows)],
        slab.at[:, pl.ds(8, dma_rows)],
        sem_in,
    )
    cp_in.start()

    # Border upkeep (zeros) while the slab loads: top/bottom H-pad rows of
    # this output plane, and chunks of the D-pad planes 0 and D+1.
    r_total = (hh + 2) * wpad

    def _zero(plane, row0, nrows):
        cp = pltpu.make_async_copy(
            zbuf.at[pl.ds(0, nrows)],
            out_hbm.at[plane, pl.ds(row0, nrows)],
            sem_z,
        )
        cp.start()
        cp.wait()

    @pl.when(h == 0)
    def _top():
        _zero(z + 1, 0, wpad)

    @pl.when(h == n_h - 1)
    def _bottom():
        _zero(z + 1, (hh + 1) * wpad, wpad)

    @pl.when(z == 0)
    def _plane0():
        _zero(0, h * rout, rout)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, hh * wpad, 2 * wpad)

    @pl.when(z == d - 1)
    def _planeD():
        _zero(d + 1, h * rout, rout)

    @pl.when(jnp.logical_and(z == d - 1, h == 0))
    def _planeD_tail():
        _zero(d + 1, hh * wpad, 2 * wpad)

    cp_in.wait()

    # Two independent accumulation chains keep the MXU issue pipeline full
    # (a single chain serializes each dot behind the previous VPU add).
    acc[0] = jnp.zeros_like(acc[0])
    acc[1] = jnp.zeros_like(acc[1])
    for i, (dz, off) in enumerate(taps):
        xs = slab[dz, off: off + rout, :]
        dres = jax.lax.dot_general(
            xs, w_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[i % 2] += dres
    res = acc[0] + acc[1] + b_ref[0][None, :]
    if relu:
        res = jnp.maximum(res, 0.0)
    # Zero the W-pad columns [wp, wpad) so the next chained conv sees a
    # correct left/right halo.
    col = jax.lax.broadcasted_iota(jnp.int32, (rout, 1), 0) % wpad
    res = jnp.where(col < wp, res, 0.0)
    outbuf[:] = res.astype(outbuf.dtype)

    cp_out = pltpu.make_async_copy(
        outbuf,
        out_hbm.at[z + 1, pl.ds((1 + h0) * wpad, rout)],
        sem_out,
    )
    cp_out.start()
    cp_out.wait()


def conv3d_chain(
    x: jax.Array,
    packed_w: jax.Array,
    packed_b: jax.Array,
    hh: int,
    wp: int,
    relu: bool = True,
    h_tile: Optional[int] = None,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    ring: bool = True,
    sparse_gh: Optional[int] = None,
) -> jax.Array:
    """Fused Conv3D(k=3, SAME)+bias+ReLU, chained-flat in AND out.

    :param x: (D+2, (H+2)*wpad, Cin_p) chained layout (:func:`to_chain`).
    :param packed_w: (27, Cin_p, Cout_p) from :func:`pack_weights`.
    :param packed_b: (1, Cout_p) from :func:`pack_bias`.
    :param ring: z-innermost grid with a 4-slot plane ring cache (each input
        plane window DMA'd once, prefetched a step ahead) and double-
        buffered output DMAs; ``False`` = the simpler 3-plane-slab form
        (re-reads input 3x in z, serial DMAs).
    :param sparse_gh: constant-region short-circuit group height (ring form
        only): 0/None = off, -1 = auto (largest divisor of the h-tile with
        ~<=512-row groups), else an explicit divisor of the h-tile. Empty
        row-groups skip their matmuls exactly (see
        :func:`_chain_kernel_ring`).
    :returns: (D+2, (H+2)*wpad, Cout_p) chained layout, borders zeroed.
    """
    dp2, rows, cin_p = x.shape
    d = dp2 - 2
    wpad = rows // (hh + 2)
    assert wpad * (hh + 2) == rows and wpad % 8 == 0, (wpad, hh, rows)
    assert wp < wpad
    cout_p = packed_w.shape[2]

    if h_tile is None:
        h_tile = _pick_chain_h_tile(hh, wpad, cin_p, cout_p, ring=ring)
    assert hh % h_tile == 0
    ht = h_tile
    n_h = hh // ht
    rout = ht * wpad
    dma_rows = (ht + 2) * wpad
    n_slab = dma_rows + 16

    taps = tuple(
        (dz, dy * wpad + t + 7)
        for dz in range(3) for dy in range(3) for t in range(3)
    )
    common = dict(
        taps=taps, rout=rout, dma_rows=dma_rows, relu=relu,
        wp=wp, wpad=wpad, ht=ht, n_h=n_h, hh=hh, d=d,
    )
    if ring:
        gh = _resolve_sparse_gh(sparse_gh, ht, wpad)
        common["gh"] = gh
        kern = functools.partial(_chain_kernel_ring, **common)
        grid = (n_h, d)
        scratch = [
            pltpu.VMEM((4, n_slab, cin_p), x.dtype),
            pltpu.VMEM((2, rout, cout_p), jnp.float32),
            pltpu.VMEM((2, rout, cout_p), out_dtype),
            pltpu.VMEM((max(rout, 2 * wpad), cout_p), out_dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kern = functools.partial(_chain_kernel, **common)
        grid = (d, n_h)
        scratch = [
            pltpu.VMEM((3, n_slab, cin_p), x.dtype),
            pltpu.VMEM((2, rout, cout_p), jnp.float32),
            pltpu.VMEM((rout, cout_p), out_dtype),
            pltpu.VMEM((max(rout, 2 * wpad), cout_p), out_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((dp2, rows, cout_p), out_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, packed_w.astype(x.dtype), packed_b)


def _resolve_sparse_gh(sparse_gh: Optional[int], ht: int, wpad: int) -> int:
    """Resolve the short-circuit group height: 0/None off, -1 auto, else an
    explicit divisor of ``ht`` (``ht`` itself = tile-level skip).

    MEASURED NET LOSS at every granularity on v5e hardware — keep OFF for
    production (see BASELINE.md "Constant-region short-circuit"):
    fine groups (gh=19, 52% skip rate on a real skull) lose to per-group
    scalar-branch stalls + MXU fill/drain on the tiny rep-row matmuls;
    tile-level (auto, 13.8% skip rate) loses because the row-constancy
    check itself re-reads the whole 3-plane slab through the VPU
    (bf16 66.3 -> 68.0 ms/volume, int8 44.5 -> 48.4 on the 224x304x304
    headline config; identical on dense noise). Retained as a bit-exact,
    tested experiment (tests/test_sparse_chain.py).

    Auto picks TILE-level (gh = ht): one data-dependent branch per grid
    step, the cheaper of the measured shapes."""
    if not sparse_gh:
        return 0
    if sparse_gh > 0:
        assert ht % sparse_gh == 0, (ht, sparse_gh)
        return sparse_gh
    return ht


def _pick_chain_h_tile(hh: int, wpad: int, cin_p: int, cout_p: int,
                       vmem_budget: int = 12 * 2**20,
                       ring: bool = True) -> int:
    """Largest divisor of H whose scratch set fits the VMEM budget."""
    n_slab = 4 if ring else 3
    n_out = 2 if ring else 1
    for ht in sorted((t for t in range(1, hh + 1) if hh % t == 0),
                     reverse=True):
        rout = ht * wpad
        need = (
            n_slab * ((ht + 2) * wpad + 16) * cin_p * 2   # slab ring
            + 2 * rout * cout_p * 4                        # f32 acc x2
            + (n_out + 1) * rout * cout_p * 2              # outbufs + zbuf
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no chain H tile fits: H={hh}, wpad={wpad}")


def _chain_kernel_ring(x_hbm, w_ref, b_ref, out_hbm, slab, acc, outbuf, zbuf,
                       sem_in, sem_out, sem_z, *, taps, rout, dma_rows, relu,
                       wp, wpad, ht, n_h, hh, d, gh=0):
    """Ring-cached, double-buffered chain conv (grid (n_h, d), z innermost).

    A 4-slot plane ring means each input plane's row window is DMA'd ONCE
    per h-tile (the 3-plane slab form re-read everything 3x), prefetched one
    z ahead of use; output DMAs double-buffer against compute.

    ``gh`` > 0 enables the **constant-region short-circuit**: the h-tile is
    processed in groups of ``gh`` output rows, and a group whose 3-plane
    input window is ROW-CONSTANT (every H-row of the window identical —
    true wherever the volume is empty/far from any foreground, ~half of a
    CT skull at this granularity) computes only its FIRST output row and
    broadcasts it, skipping (gh-1)/gh of the 27 tap matmuls. Exact by
    construction: per-row MXU dot results are independent of the other
    rows, the first row is computed with real tap reads, and every other
    row of a row-constant window reads bit-identical operands (the one
    cross-row wrap column any row sees outside its 3 rows is a W-pad
    column, row-constant whenever the check passes). Volume borders fail
    the check (zero halo rows differ from the interior constant) and take
    the full path, as does any group containing foreground.
    """
    h = pl.program_id(0)
    z = pl.program_id(1)
    h0 = h * ht
    row_src = h0 * wpad

    @pl.when(jnp.logical_and(h == 0, z == 0))
    def _init():
        slab[:, 0:8, :] = jnp.zeros_like(slab[:, 0:8, :])
        zbuf[:] = jnp.zeros_like(zbuf)

    def _in_copy(q):
        return pltpu.make_async_copy(
            x_hbm.at[q, pl.ds(row_src, dma_rows)],
            slab.at[q % 4, pl.ds(8, dma_rows)],
            sem_in.at[q % 4],
        )

    @pl.when(z == 0)
    def _prefill():
        _in_copy(0).start()
        _in_copy(1).start()
        _in_copy(2).start()
        _in_copy(0).wait()
        _in_copy(1).wait()

    @pl.when(z + 3 <= d + 1)
    def _prefetch():
        _in_copy(z + 3).start()

    # Border upkeep while input streams (same designated iterations as the
    # slab kernel; h outer / z inner covers the same (z, h) pairs).
    def _zero(plane, row0, nrows):
        cp = pltpu.make_async_copy(
            zbuf.at[pl.ds(0, nrows)],
            out_hbm.at[plane, pl.ds(row0, nrows)],
            sem_z,
        )
        cp.start()
        cp.wait()

    @pl.when(h == 0)
    def _top():
        _zero(z + 1, 0, wpad)

    @pl.when(h == n_h - 1)
    def _bottom():
        _zero(z + 1, (hh + 1) * wpad, wpad)

    @pl.when(z == 0)
    def _plane0():
        _zero(0, h * rout, rout)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, hh * wpad, 2 * wpad)

    @pl.when(z == d - 1)
    def _planeD():
        _zero(d + 1, h * rout, rout)

    @pl.when(jnp.logical_and(z == d - 1, h == 0))
    def _planeD_tail():
        _zero(d + 1, hh * wpad, 2 * wpad)

    _in_copy(z + 2).wait()

    par = (h * d + z) % 2  # global iteration parity (robust to odd/1 d)

    def _out_copy(p):
        return pltpu.make_async_copy(
            outbuf.at[p],
            out_hbm.at[z + 1, pl.ds((1 + h0) * wpad, rout)],
            sem_out.at[p],
        )

    # Reclaim this parity's buffer (the DMA issued two z-steps ago; all out
    # tiles have identical sizes, so the wait's byte count is exact).
    @pl.when(h * d + z >= 2)
    def _reclaim():
        _out_copy(par).wait()

    def _epilogue(a, nrows):
        res = a + b_ref[0][None, :]
        if relu:
            res = jnp.maximum(res, 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) % wpad
        return jnp.where(col < wp, res, 0.0)

    def _taps(g0, nrows):
        a0 = a1 = None
        for i, (dz, off) in enumerate(taps):
            xs = slab[(z + dz) % 4, pl.ds(off + g0, nrows), :]
            dres = jax.lax.dot_general(
                xs, w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if i % 2 == 0:
                a0 = dres if a0 is None else a0 + dres
            else:
                a1 = dres if a1 is None else a1 + dres
        return a0 + a1

    if not gh:
        acc[0] = jnp.zeros_like(acc[0])
        acc[1] = jnp.zeros_like(acc[1])
        for i, (dz, off) in enumerate(taps):
            xs = slab[(z + dz) % 4, pl.ds(off, rout), :]
            dres = jax.lax.dot_general(
                xs, w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc[i % 2] += dres
        outbuf[par] = _epilogue(acc[0] + acc[1], rout).astype(outbuf.dtype)
    else:
        for g in range(ht // gh):
            g0 = g * gh * wpad
            grows = gh * wpad
            # row-constancy as a float mismatch reduction: Mosaic can't
            # relayout i1 vectors for an all() scalar reduce, but an f32
            # max-of-abs-diff lowers cleanly; bf16 -> f32 is exact, so
            # mism == 0 <=> every H-row of the window is bit-identical
            # (NaN activations make mism NaN -> full path, still exact)
            mism = None
            for dz in range(3):
                w = slab[
                    (z + dz) % 4, pl.ds(8 + g0, (gh + 2) * wpad), :
                ].astype(jnp.float32)
                dmax = jnp.max(jnp.abs(w[wpad:] - w[:-wpad]))
                mism = dmax if mism is None else jnp.maximum(mism, dmax)
            is_const = mism == 0.0

            @pl.when(is_const)
            def _const(g0=g0, grows=grows):
                row = _epilogue(_taps(g0, wpad), wpad)
                outbuf[par, pl.ds(g0, grows)] = jnp.broadcast_to(
                    row[None], (gh, wpad, row.shape[-1])
                ).reshape(grows, -1).astype(outbuf.dtype)

            @pl.when(jnp.logical_not(is_const))
            def _full(g0=g0, grows=grows):
                outbuf[par, pl.ds(g0, grows)] = _epilogue(
                    _taps(g0, grows), grows
                ).astype(outbuf.dtype)
    _out_copy(par).start()

    @pl.when(jnp.logical_and(h == n_h - 1, z == d - 1))
    def _drain():
        _out_copy(par).wait()

        @pl.when(n_h * d >= 2)
        def _drain_other():
            _out_copy(1 - par).wait()


# ---------------------------------------------------------------------------
# SPLIT-TAP chain conv: the round-3 restructure that removes the W-packed
# scheme's structural-zero MACs (VERDICT r2 item 1).
#
# In the 27-tap form, each (dz, dy) pair costs THREE 128-wide matmuls
# (t in {-1, 0, 1}), but the t = +-1 matrices carry exactly ONE nonzero
# (Cin x Cout) block each — the W-block-boundary taps (s_out = 0 with
# dx = 0, and s_out = pack-1 with dx = 2). At pack 16 / 7 channels the MXU
# spends ~2/3 of its cycles multiplying structural zeros.
#
# The split form keeps the SAME chain layout and slab ring and reorganizes
# the dots:
#   - 9 MAIN dots (one per (dz, dy)): the t = 0 matrices, whose operand is
#     the raw slab at row offset dy*wpad + 8 — no data movement at all;
#   - 3 CORRECTION dots (one per dz): the 18 boundary blocks gathered into
#     a (rout, 6*Cin)-lane buffer whose lanes stack (dy, side, channel).
#     The buffer is built ONCE per arriving plane with 6 narrow lane-shift
#     copies (left side: previous flat row's last packed position; right:
#     next flat row's first — the same flat-row adjacency the t taps used).
# Total MXU tile-rows per grid step: 9*ceil(p*Cin/128) + 3*ceil(6*Cin/128)
# vs 27*ceil(p*Cin/128): 12 vs 27 at the full-res levels (2.25x), 15-18 at
# the deep levels. Bit-exact in int8 (integer adds are associative); bf16
# differs only in f32 accumulation order.
# ---------------------------------------------------------------------------


def pack_weights_split(
    w: np.ndarray,
    pack: int,
    scale: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Split-tap packing of (3,3,3,Cin,Cout) conv weights (k=3 only).

    Returns ``(main, corr)``:

    - ``main`` (9, round_up(pack*Cin, 128), round_up(pack*Cout, 128)),
      indexed ``dz*3 + dy``: the in-block taps — rows (s_in, ci) with
      ``s_in = s_out + dx - 1`` in [0, pack).
    - ``corr`` (3, round_up(6*Cin, 128), Cout_p), indexed ``dz``: the
      W-block-boundary taps — rows ((dy, side, ci)) where side 0 holds
      ``w[dz, dy, 0]`` feeding output position 0 (left neighbor lives in
      the previous flat row) and side 1 holds ``w[dz, dy, 2]`` feeding
      position pack-1 (next flat row). The kernel builds the matching
      gathered operand with MXU permutation dots (:func:`corr_perms`).
    """
    assert w.shape[:3] == (3, 3, 3), f"split packing is k=3 only: {w.shape}"
    cin, cout = w.shape[3], w.shape[4]
    w = np.asarray(w, np.float32)
    if scale is not None:
        w = w * np.asarray(scale, np.float32)[None, None, None, None, :]
    kp = _round_up(pack * cin, LANE)
    kc = _round_up(6 * cin, LANE)
    cout_p = _round_up(pack * cout, LANE)
    main = np.zeros((9, kp, cout_p), np.float32)
    corr = np.zeros((3, kc, cout_p), np.float32)
    for dz in range(3):
        for dy in range(3):
            m = main[dz * 3 + dy]
            for s in range(pack):
                for dx in range(3):
                    si = s + dx - 1
                    if 0 <= si < pack:
                        m[si * cin:(si + 1) * cin,
                          s * cout:(s + 1) * cout] += w[dz, dy, dx]
            corr[dz][(2 * dy) * cin:(2 * dy + 1) * cin,
                     0:cout] += w[dz, dy, 0]
            corr[dz][(2 * dy + 1) * cin:(2 * dy + 2) * cin,
                     (pack - 1) * cout: pack * cout] += w[dz, dy, 2]
    return main, corr


def corr_perms(pack: int, cw: int, cin_p: int) -> np.ndarray:
    """(6, cin_p, round_up(6*cw, 128)) 0/1 permutation matrices, indexed
    ``2*dy + side``: the MXU boundary gather for the split kernel.

    ``slab_row @ perms[2*dy+0]`` lifts the row's LAST packed position
    (lanes (pack-1)*cw..pack*cw) into corr-buffer lanes (2*dy)*cw..;
    ``perms[2*dy+1]`` lifts the FIRST position into (2*dy+1)*cw... —
    applied to the slab at row offsets base(dy)-1 / base(dy)+1 they
    assemble exactly the gathered boundary operand ``pack_weights_split``'s
    ``corr`` matrices contract with. Permutations are exact in int32 (int8
    path) and reproduce the operand bf16 values exactly (0/1 weights), so
    the MXU build is bit-identical to a copy-based gather.
    """
    kc = _round_up(6 * cw, LANE)
    p = np.zeros((6, cin_p, kc), np.float32)
    for dy in range(3):
        for c in range(cw):
            p[2 * dy, (pack - 1) * cw + c, (2 * dy) * cw + c] = 1.0
            p[2 * dy + 1, c, (2 * dy + 1) * cw + c] = 1.0
    return p


def _chain_kernel_ring_split(x_hbm, wm_ref, wc_ref, p_ref, s_ref, b_ref,
                             out_hbm, slab, cbuf, acc, outbuf, zbuf, sem_in,
                             sem_out, sem_z, *, rout, dma_rows, relu, wp,
                             wpad, ht, n_h, hh, d, cw, pack, quant, zp):
    """Split-tap ring kernel (grid (n_h, d), z innermost): 9 main dots on
    the raw slab + 3 correction dots on the per-plane gathered boundary
    buffer. ``quant`` selects int8/int32 MXU + requant epilogue; ``zp``
    the zero-point variant (see ``_chain_kernel_ring_q``).

    The boundary gather runs ON THE MXU: six permutation dots per
    arriving plane (:func:`corr_perms`) lift the row-shifted edge
    positions into the compact 6*cw-lane corr buffer — the round-3 fix
    for the first split form, whose VPU gather (per-8-row lane-rotate
    copies, ~3.5 us/plane) cost about what the dropped dots saved, and
    for the DMA gather attempt, which Mosaic rejects (sub-128-lane DMA
    slices). Bit-identical to a copy gather in both dtypes (0/1 weights).
    18 MXU tile-row units per step (9 main + 6 build + 3 corr) vs the
    full form's 27."""
    h = pl.program_id(0)
    z = pl.program_id(1)
    h0 = h * ht
    row_src = h0 * wpad
    fill = (jnp.int8(-128) if zp else jnp.int8(0)) if quant else 0

    @pl.when(jnp.logical_and(h == 0, z == 0))
    def _init():
        slab[:, 0:8, :] = jnp.full_like(slab[:, 0:8, :], fill)
        zbuf[:] = jnp.full_like(zbuf, fill)

    def _in_copy(q):
        return pltpu.make_async_copy(
            x_hbm.at[q, pl.ds(row_src, dma_rows)],
            slab.at[q % 4, pl.ds(8, dma_rows)],
            sem_in.at[q % 4],
        )

    gather_dt = jnp.int32 if quant else jnp.float32

    def _build_c(q):
        """MXU boundary gather of plane ``q`` (once per arrival; the
        buffer is reused by the 3 grid steps the plane participates in).
        Six permutation dots on row-shifted slab views; the int32/f32
        result is cast back to the slab dtype exactly (0/1 weights)."""
        g = None
        for dy in range(3):
            base = 8 + dy * wpad
            for side, roff in ((0, -1), (1, 1)):
                xs = slab[q % 4, pl.ds(base + roff, rout), :]
                dres = jax.lax.dot_general(
                    xs, p_ref[2 * dy + side], (((1,), (0,)), ((), ())),
                    preferred_element_type=gather_dt,
                )
                g = dres if g is None else g + dres
        cbuf[q % 4] = g.astype(cbuf.dtype)

    @pl.when(z == 0)
    def _prefill():
        _in_copy(0).start()
        _in_copy(1).start()
        _in_copy(2).start()
        _in_copy(0).wait()
        _build_c(0)
        _in_copy(1).wait()
        _build_c(1)

    @pl.when(z + 3 <= d + 1)
    def _prefetch():
        _in_copy(z + 3).start()

    def _zero(plane, row0, nrows):
        cp = pltpu.make_async_copy(
            zbuf.at[pl.ds(0, nrows)],
            out_hbm.at[plane, pl.ds(row0, nrows)], sem_z,
        )
        cp.start()
        cp.wait()

    @pl.when(h == 0)
    def _top():
        _zero(z + 1, 0, wpad)

    @pl.when(h == n_h - 1)
    def _bottom():
        _zero(z + 1, (hh + 1) * wpad, wpad)

    @pl.when(z == 0)
    def _plane0():
        _zero(0, h * rout, rout)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, hh * wpad, 2 * wpad)

    @pl.when(z == d - 1)
    def _planeD():
        _zero(d + 1, h * rout, rout)

    @pl.when(jnp.logical_and(z == d - 1, h == 0))
    def _planeD_tail():
        _zero(d + 1, hh * wpad, 2 * wpad)

    _in_copy(z + 2).wait()
    _build_c(z + 2)

    par = (h * d + z) % 2

    def _out_copy(p):
        return pltpu.make_async_copy(
            outbuf.at[p],
            out_hbm.at[z + 1, pl.ds((1 + h0) * wpad, rout)],
            sem_out.at[p],
        )

    @pl.when(h * d + z >= 2)
    def _reclaim():
        _out_copy(par).wait()

    acc_dt = jnp.int32 if quant else jnp.float32
    acc[0] = jnp.zeros_like(acc[0])
    acc[1] = jnp.zeros_like(acc[1])
    n = 0
    # all 9 main dots first: they overlap the in-flight boundary-gather
    # DMAs of the plane that arrived this step
    for dz in range(3):
        for dy in range(3):
            xs = slab[(z + dz) % 4, pl.ds(dy * wpad + 8, rout), :]
            dres = jax.lax.dot_general(
                xs, wm_ref[dz * 3 + dy], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt,
            )
            acc[n % 2] += dres
            n += 1
    for dz in range(3):
        xc = cbuf[(z + dz) % 4, 0:rout, :]
        dres = jax.lax.dot_general(
            xc, wc_ref[dz], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dt,
        )
        acc[n % 2] += dres
        n += 1
    col = jax.lax.broadcasted_iota(jnp.int32, (rout, 1), 0) % wpad
    if quant:
        res = (acc[0] + acc[1]).astype(jnp.float32)
        res = res * s_ref[0][None, :] + b_ref[0][None, :]
        if relu:
            res = jnp.maximum(res, 0.0)
        else:
            res = jnp.maximum(res, -127.0)
        if zp:
            res = jnp.minimum(res, 255.0) - 128.0
        else:
            res = jnp.minimum(res, 127.0)
        res = jnp.where(col < wp, res, -128.0 if zp else 0.0)
        outbuf[par] = jnp.round(res).astype(jnp.int8)
    else:
        res = acc[0] + acc[1] + b_ref[0][None, :]
        if relu:
            res = jnp.maximum(res, 0.0)
        res = jnp.where(col < wp, res, 0.0)
        outbuf[par] = res.astype(outbuf.dtype)
    _out_copy(par).start()

    @pl.when(jnp.logical_and(h == n_h - 1, z == d - 1))
    def _drain():
        _out_copy(par).wait()

        @pl.when(n_h * d >= 2)
        def _drain_other():
            _out_copy(1 - par).wait()


def conv3d_chain_split(
    x: jax.Array,
    w_main: jax.Array,
    w_corr: jax.Array,
    packed_b: jax.Array,
    hh: int,
    wp: int,
    pack: int,
    cw: int,
    relu: bool = True,
    h_tile: Optional[int] = None,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    scale: Optional[jax.Array] = None,
    zp: bool = False,
) -> jax.Array:
    """Split-tap fused Conv3D(k=3, SAME)+bias+ReLU, chained in AND out.

    bf16 when ``scale`` is None; int8 (requant epilogue, optional ``zp``
    zero-point mode) when ``scale``/``packed_b`` carry the quantization
    algebra exactly as :func:`conv3d_chain_q` takes them.

    :param x: (D+2, (H+2)*wpad, Cin_p) chained layout.
    :param w_main: (9, Kp, Cout_p) from :func:`pack_weights_split`.
    :param w_corr: (3, Kc, Cout_p) from :func:`pack_weights_split`.
    :param pack: W packing factor of the layout; ``cw`` channels per packed
        position (incl. any ones lane).
    :returns: (D+2, (H+2)*wpad, Cout_p) chained layout, borders filled.
    """
    quant = scale is not None
    if quant:
        assert x.dtype == jnp.int8 and w_main.dtype == jnp.int8
    assert not zp or quant
    dp2, rows, cin_p = x.shape
    d = dp2 - 2
    wpad = rows // (hh + 2)
    assert wpad * (hh + 2) == rows and wpad % 8 == 0, (wpad, hh, rows)
    assert wp < wpad and pack * cw <= cin_p, (wp, wpad, pack, cw, cin_p)
    kc_p = w_corr.shape[-2]
    cout_p = w_main.shape[2]

    if h_tile is None:
        h_tile = _pick_chain_h_tile_split(
            hh, wpad, cin_p, kc_p, cout_p, quant
        )
    assert hh % h_tile == 0
    ht = h_tile
    n_h = hh // ht
    rout = ht * wpad
    dma_rows = (ht + 2) * wpad
    n_slab = dma_rows + 16
    with jax.ensure_compile_time_eval():
        p_np = corr_perms(pack, cw, cin_p)
        perms = (jnp.asarray(p_np.astype(np.int8)) if quant
                 else jnp.asarray(p_np, x.dtype))

    kern = functools.partial(
        _chain_kernel_ring_split, rout=rout, dma_rows=dma_rows, relu=relu,
        wp=wp, wpad=wpad, ht=ht, n_h=n_h, hh=hh, d=d, cw=cw, pack=pack,
        quant=quant, zp=zp,
    )
    io_dt = jnp.int8 if quant else x.dtype
    s_in = scale if quant else jnp.ones((1, cout_p), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(n_h, d),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (dp2, rows, cout_p), io_dt if quant else out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((4, n_slab, cin_p), x.dtype),
            pltpu.VMEM((4, rout, kc_p), x.dtype),
            pltpu.VMEM(
                (2, rout, cout_p), jnp.int32 if quant else jnp.float32
            ),
            pltpu.VMEM((2, rout, cout_p), io_dt if quant else out_dtype),
            pltpu.VMEM(
                (max(rout, 2 * wpad), cout_p), io_dt if quant else out_dtype
            ),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, w_main if quant else w_main.astype(x.dtype),
      w_corr if quant else w_corr.astype(x.dtype),
      perms, s_in, packed_b)


def _pick_chain_h_tile_split(hh: int, wpad: int, cin_p: int, kc_p: int,
                             cout_p: int, quant: bool,
                             vmem_budget: int = 12 * 2**20) -> int:
    """Largest divisor of H whose split-tap scratch set fits VMEM."""
    b_in = 1 if quant else 2
    b_out = 1 if quant else 2
    weights = (9 * cin_p + 3 * kc_p + 6 * cin_p * kc_p // cout_p) * cout_p
    for ht in sorted((t for t in range(1, hh + 1) if hh % t == 0),
                     reverse=True):
        rout = ht * wpad
        need = (
            4 * ((ht + 2) * wpad + 16) * cin_p * b_in   # slab ring
            + 4 * rout * kc_p * b_in                     # corr ring
            + 2 * rout * cout_p * 4                      # acc x2
            + rout * kc_p * 4                            # MXU-gather temp
            + 3 * rout * cout_p * b_out                  # outbufs + zbuf
            + weights * b_in                             # wm + wc + perms
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no split chain H tile fits: H={hh}, wpad={wpad}")


# ---------------------------------------------------------------------------
# DMA-STACKED chain conv ("v3"): the VPU-add-bound fix.
#
# Measured on v5e (tools/_mb_conv.py): the int8 27-tap kernel runs at
# ~8.25 MXU rows/cycle (69% of the 12 rows/cycle int8 nominal), and the
# split-tap form (12 dots + 6 lane-rotating gather copies) is NOT faster —
# the bottleneck is the VPU, not MXU tile-rows: every dot output costs an
# (rout, 128) i32 accumulator add (~456 VPU cycles), 27 of them ~= 12.3k
# cycles/step ~= the whole measured step time; the gather's lane rotates
# cost about what the dropped dots saved.
#
# v3 removes VPU work instead of MXU work:
# - the ring slot holds a DY-STACKED slab S[r, dy*128 + lane] =
#   x[row + dy*wpad, lane], filled by THREE row-shifted DMAs per plane
#   (no VPU copies; 3x HBM re-read of the plane, ~1.4 MB/step, hidden
#   behind the prefetch);
# - per grid step: 9 dots (3 dz x 3 row-offsets of S): offset 0 carries
#   the in-block taps for all dy at once (K = 3*128), offsets -1/+1 carry
#   the W-block-boundary taps (the previous/next flat row IS the W
#   neighbor) — so 9 accumulator adds instead of 27 and ZERO gather
#   copies. MXU tile-rows stay at 27/step; with the VPU off the critical
#   path the MXU runs at its int8 rate.
# ---------------------------------------------------------------------------


def pack_weights_stacked(
    w: np.ndarray,
    pack: int,
    scale: Optional[np.ndarray] = None,
) -> np.ndarray:
    """dy-stacked packing for the v3 kernel (k=3, ``pack*Cin <= 128``).

    Returns (3, 3, 3*128, Cout_p) indexed [dz][off] where ``off`` is the
    S-row offset + 1 (0 = previous flat row -> left-boundary taps dx=0;
    1 = centered -> in-block taps; 2 = next row -> right-boundary dx=2),
    and rows are (dy, s_in*Cin + ci) across the three 128-lane dy blocks.
    """
    assert w.shape[:3] == (3, 3, 3), f"k=3 only: {w.shape}"
    cin, cout = w.shape[3], w.shape[4]
    assert pack * cin <= LANE, (pack, cin)
    w = np.asarray(w, np.float32)
    if scale is not None:
        w = w * np.asarray(scale, np.float32)[None, None, None, None, :]
    cout_p = _round_up(pack * cout, LANE)
    out = np.zeros((3, 3, 3 * LANE, cout_p), np.float32)
    for dz in range(3):
        for dy in range(3):
            base = dy * LANE
            # off=1 (centered): in-block taps
            for s in range(pack):
                for dx in range(3):
                    si = s + dx - 1
                    if 0 <= si < pack:
                        out[dz, 1,
                            base + si * cin: base + (si + 1) * cin,
                            s * cout:(s + 1) * cout] += w[dz, dy, dx]
            # off=0 (S row r-1 = previous flat row): left neighbor of
            # position 0 is the previous group's LAST position
            out[dz, 0,
                base + (pack - 1) * cin: base + pack * cin,
                0:cout] += w[dz, dy, 0]
            # off=2 (next flat row): right neighbor of position pack-1
            out[dz, 2, base: base + cin,
                (pack - 1) * cout: pack * cout] += w[dz, dy, 2]
    return out


def _chain_kernel_ring_v3(x_hbm, w_ref, s_ref, b_ref, out_hbm, slab, acc,
                          outbuf, zbuf, sem_in, sem_out, sem_z, *, rout,
                          dma_rows, relu, wp, wpad, ht, n_h, hh, d, quant,
                          zp):
    """dy-stacked ring kernel (see module comment above): ring slots are
    (rows, 3*128) filled by 3 row-shifted DMAs; 9 dots per step."""
    h = pl.program_id(0)
    z = pl.program_id(1)
    h0 = h * ht
    row_src = h0 * wpad
    fill = (jnp.int8(-128) if zp else jnp.int8(0)) if quant else 0

    @pl.when(jnp.logical_and(h == 0, z == 0))
    def _init():
        slab[:, 0:8, :] = jnp.full_like(slab[:, 0:8, :], fill)

        zbuf[:] = jnp.full_like(zbuf, fill)

    # Three row-shifted copies of the SAME plane fill the dy lane blocks.
    # Mosaic requires 8-row-aligned DMA offsets, so the window starts a
    # full vreg-row early: slab row s (s >= 8) of lane block dy holds
    # x[row_src + dy*wpad - 8 + (s - 8)]; tap (dy, off in {0,1,2}) then
    # reads slab rows [15 + off, + rout) — read offsets are unaligned,
    # which IS supported (the 27-tap kernel reads at 7 + ...).
    # At h == 0, dy == 0 the window's first 8 x rows don't exist: the DMA
    # shifts one vreg-row down and rows [8, 16) take the fill explicitly
    # (only row 15 = x[-1] is ever read — semantically a W-pad column,
    # whose value IS fill).
    def _in_copy(q, dy):
        src0 = row_src + dy * wpad - 8
        return pltpu.make_async_copy(
            x_hbm.at[q, pl.ds(src0, dma_rows)],
            slab.at[q % 4, pl.ds(8, dma_rows),
                    pl.ds(dy * LANE, LANE)],
            sem_in.at[(q % 4) * 3 + dy],
        )

    def _in_copy_first(q):
        return pltpu.make_async_copy(
            x_hbm.at[q, pl.ds(0, dma_rows - 8)],
            slab.at[q % 4, pl.ds(16, dma_rows - 8), pl.ds(0, LANE)],
            sem_in.at[(q % 4) * 3],
        )

    def _start(q):
        @pl.when(h == 0)
        def _a():
            _in_copy_first(q).start()

        @pl.when(h != 0)
        def _b():
            _in_copy(q, 0).start()

        _in_copy(q, 1).start()
        _in_copy(q, 2).start()

    def _wait(q):
        @pl.when(h == 0)
        def _a():
            _in_copy_first(q).wait()
            slab[q % 4, 8:16, 0:LANE] = jnp.full_like(
                slab[q % 4, 8:16, 0:LANE], fill
            )

        @pl.when(h != 0)
        def _b():
            _in_copy(q, 0).wait()

        _in_copy(q, 1).wait()
        _in_copy(q, 2).wait()

    @pl.when(z == 0)
    def _prefill():
        _start(0)
        _start(1)
        _start(2)
        _wait(0)
        _wait(1)

    @pl.when(z + 3 <= d + 1)
    def _prefetch():
        _start(z + 3)

    def _zero(plane, row0, nrows):
        cp = pltpu.make_async_copy(
            zbuf.at[pl.ds(0, nrows)],
            out_hbm.at[plane, pl.ds(row0, nrows)], sem_z,
        )
        cp.start()
        cp.wait()

    @pl.when(h == 0)
    def _top():
        _zero(z + 1, 0, wpad)

    @pl.when(h == n_h - 1)
    def _bottom():
        _zero(z + 1, (hh + 1) * wpad, wpad)

    @pl.when(z == 0)
    def _plane0():
        _zero(0, h * rout, rout)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, hh * wpad, 2 * wpad)

    @pl.when(z == d - 1)
    def _planeD():
        _zero(d + 1, h * rout, rout)

    @pl.when(jnp.logical_and(z == d - 1, h == 0))
    def _planeD_tail():
        _zero(d + 1, hh * wpad, 2 * wpad)

    _wait(z + 2)

    par = (h * d + z) % 2

    def _out_copy(p):
        return pltpu.make_async_copy(
            outbuf.at[p],
            out_hbm.at[z + 1, pl.ds((1 + h0) * wpad, rout)],
            sem_out.at[p],
        )

    @pl.when(h * d + z >= 2)
    def _reclaim():
        _out_copy(par).wait()

    acc_dt = jnp.int32 if quant else jnp.float32
    acc[0] = jnp.zeros_like(acc[0])
    acc[1] = jnp.zeros_like(acc[1])
    n = 0
    for dz in range(3):
        for off in range(3):
            xs = slab[(z + dz) % 4, pl.ds(15 + off, rout), :]
            dres = jax.lax.dot_general(
                xs, w_ref[dz * 3 + off], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt,
            )
            acc[n % 2] += dres
            n += 1
    col = jax.lax.broadcasted_iota(jnp.int32, (rout, 1), 0) % wpad
    if quant:
        res = (acc[0] + acc[1]).astype(jnp.float32)
        res = res * s_ref[0][None, :] + b_ref[0][None, :]
        if relu:
            res = jnp.maximum(res, 0.0)
        else:
            res = jnp.maximum(res, -127.0)
        if zp:
            res = jnp.minimum(res, 255.0) - 128.0
        else:
            res = jnp.minimum(res, 127.0)
        res = jnp.where(col < wp, res, -128.0 if zp else 0.0)
        outbuf[par] = jnp.round(res).astype(jnp.int8)
    else:
        res = acc[0] + acc[1] + b_ref[0][None, :]
        if relu:
            res = jnp.maximum(res, 0.0)
        res = jnp.where(col < wp, res, 0.0)
        outbuf[par] = res.astype(outbuf.dtype)
    _out_copy(par).start()

    @pl.when(jnp.logical_and(h == n_h - 1, z == d - 1))
    def _drain():
        _out_copy(par).wait()

        @pl.when(n_h * d >= 2)
        def _drain_other():
            _out_copy(1 - par).wait()


def conv3d_chain_v3(
    x: jax.Array,
    w_stacked: jax.Array,
    packed_b: jax.Array,
    hh: int,
    wp: int,
    relu: bool = True,
    h_tile: Optional[int] = None,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    scale: Optional[jax.Array] = None,
    zp: bool = False,
) -> jax.Array:
    """dy-stacked fused Conv3D(k=3, SAME)+bias+ReLU, chained in AND out.

    Requires a single-lane-block layout (``pack * Cin <= 128``, i.e.
    Cin_p == 128). bf16 when ``scale`` is None; int8 requant otherwise
    (same contract as :func:`conv3d_chain_q`).

    :param w_stacked: (3, 3, 384, Cout_p) from
        :func:`pack_weights_stacked`.
    """
    quant = scale is not None
    if quant:
        assert x.dtype == jnp.int8 and w_stacked.dtype == jnp.int8
    assert not zp or quant
    dp2, rows, cin_p = x.shape
    d = dp2 - 2
    wpad = rows // (hh + 2)
    assert wpad * (hh + 2) == rows and wpad % 8 == 0, (wpad, hh, rows)
    assert wp < wpad and cin_p == LANE, (wp, wpad, cin_p)
    cout_p = w_stacked.shape[-1]

    if h_tile is None:
        h_tile = _pick_chain_h_tile_v3(hh, wpad, cout_p, quant)
    assert hh % h_tile == 0
    ht = h_tile
    n_h = hh // ht
    rout = ht * wpad
    # per-dy DMA window: slab rows [8, 8 + rout + 8) <- x rows
    # [row_src + dy*wpad - 8, + rout + 8) — 8-aligned on both ends, and
    # the top lands exactly on the plane's last row for the last tile
    # (dy = 2). The one read past the window (off=2, j=rout-1, slab row
    # rout+16) stays slack garbage and only feeds the always-masked
    # w' = wpad-1 output row.
    dma_rows = rout + 8
    n_slab = dma_rows + 16

    kern = functools.partial(
        _chain_kernel_ring_v3, rout=rout, dma_rows=dma_rows, relu=relu,
        wp=wp, wpad=wpad, ht=ht, n_h=n_h, hh=hh, d=d, quant=quant, zp=zp,
    )
    io_dt = jnp.int8 if quant else x.dtype
    s_in = scale if quant else jnp.ones((1, cout_p), jnp.float32)
    w_flat = w_stacked.reshape(9, 3 * LANE, cout_p)
    return pl.pallas_call(
        kern,
        grid=(n_h, d),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (dp2, rows, cout_p), io_dt if quant else out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((4, n_slab, 3 * LANE), x.dtype),
            pltpu.VMEM(
                (2, rout, cout_p), jnp.int32 if quant else jnp.float32
            ),
            pltpu.VMEM((2, rout, cout_p), io_dt if quant else out_dtype),
            pltpu.VMEM(
                (max(rout, 2 * wpad), cout_p), io_dt if quant else out_dtype
            ),
            pltpu.SemaphoreType.DMA((12,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, w_flat if quant else w_flat.astype(x.dtype), s_in, packed_b)


def _pick_chain_h_tile_v3(hh: int, wpad: int, cout_p: int, quant: bool,
                          vmem_budget: int = 12 * 2**20) -> int:
    b_io = 1 if quant else 2
    for ht in sorted((t for t in range(1, hh + 1) if hh % t == 0),
                     reverse=True):
        rout = ht * wpad
        need = (
            4 * (rout + 24) * 3 * LANE * b_io  # dy-stacked ring
            + 2 * rout * cout_p * 4
            + 3 * rout * cout_p * b_io
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no v3 chain H tile fits: H={hh}, wpad={wpad}")


# ---------------------------------------------------------------------------
# int8 chain conv: same ring-cached kernel with int8 operands on the MXU
# (v5e: 394 int8 TOPS vs 197 bf16 TFLOP/s), int32 accumulation, and fused
# dequant+requant — out_q = round(clamp(relu(acc * scale + bias), 0, 127)).
# ``scale``/``bias`` carry the whole quantization algebra per output lane
# (input scale folds into the weights per input channel at build time).
# ---------------------------------------------------------------------------


def _chain_kernel_ring_q(x_hbm, w_ref, s_ref, b_ref, out_hbm, slab, acc,
                         outbuf, zbuf, sem_in, sem_out, sem_z, *, taps, rout,
                         dma_rows, relu, wp, wpad, ht, n_h, hh, d, zp, gh=0):
    """int8 variant of :func:`_chain_kernel_ring` (quantized serving path).

    ``gh``: constant-region short-circuit group height (see the bf16
    kernel's docstring) — int8 equality makes the row-constancy check
    exact by definition.

    ``zp``: zero-point mode — stored q = a/s - 128 so post-ReLU
    activations use all 255 levels of the s8 range instead of [0, 127]
    (double resolution at identical speed). "Activation zero" is then
    q = -128: halo planes/rows, W-pad columns, and the slab's left-halo
    init all hold -128, and the requant epilogue clamps to [0, 255]
    before shifting by -128. The zero-point correction term
    (128 * sum_i W_eff[i,o] * s_in[i]) is folded into ``b_ref`` by the
    builder (engine_q._quant_conv), keeping the shift exact."""
    h = pl.program_id(0)
    z = pl.program_id(1)
    h0 = h * ht
    row_src = h0 * wpad
    fill = jnp.int8(-128) if zp else jnp.int8(0)

    @pl.when(jnp.logical_and(h == 0, z == 0))
    def _init():
        slab[:, 0:8, :] = jnp.full_like(slab[:, 0:8, :], fill)
        zbuf[:] = jnp.full_like(zbuf, fill)

    def _in_copy(q):
        return pltpu.make_async_copy(
            x_hbm.at[q, pl.ds(row_src, dma_rows)],
            slab.at[q % 4, pl.ds(8, dma_rows)],
            sem_in.at[q % 4],
        )

    @pl.when(z == 0)
    def _prefill():
        _in_copy(0).start()
        _in_copy(1).start()
        _in_copy(2).start()
        _in_copy(0).wait()
        _in_copy(1).wait()

    @pl.when(z + 3 <= d + 1)
    def _prefetch():
        _in_copy(z + 3).start()

    def _zero(plane, row0, nrows):
        cp = pltpu.make_async_copy(
            zbuf.at[pl.ds(0, nrows)],
            out_hbm.at[plane, pl.ds(row0, nrows)], sem_z,
        )
        cp.start()
        cp.wait()

    @pl.when(h == 0)
    def _top():
        _zero(z + 1, 0, wpad)

    @pl.when(h == n_h - 1)
    def _bottom():
        _zero(z + 1, (hh + 1) * wpad, wpad)

    @pl.when(z == 0)
    def _plane0():
        _zero(0, h * rout, rout)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, hh * wpad, 2 * wpad)

    @pl.when(z == d - 1)
    def _planeD():
        _zero(d + 1, h * rout, rout)

    @pl.when(jnp.logical_and(z == d - 1, h == 0))
    def _planeD_tail():
        _zero(d + 1, hh * wpad, 2 * wpad)

    _in_copy(z + 2).wait()

    par = (h * d + z) % 2

    def _out_copy(p):
        return pltpu.make_async_copy(
            outbuf.at[p],
            out_hbm.at[z + 1, pl.ds((1 + h0) * wpad, rout)],
            sem_out.at[p],
        )

    @pl.when(h * d + z >= 2)
    def _reclaim():
        _out_copy(par).wait()

    def _epilogue(a, nrows):
        res = a.astype(jnp.float32)
        res = res * s_ref[0][None, :] + b_ref[0][None, :]
        if relu:
            res = jnp.maximum(res, 0.0)
        else:
            # without the ReLU lower bound a large negative requantized
            # value would wrap on the int8 cast below — clamp symmetrically
            res = jnp.maximum(res, -127.0)
        if zp:
            res = jnp.minimum(res, 255.0) - 128.0
        else:
            res = jnp.minimum(res, 127.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) % wpad
        res = jnp.where(col < wp, res, -128.0 if zp else 0.0)
        return jnp.round(res).astype(jnp.int8)

    def _taps(g0, nrows):
        a0 = a1 = None
        for i, (dz, off) in enumerate(taps):
            xs = slab[(z + dz) % 4, pl.ds(off + g0, nrows), :]
            dres = jax.lax.dot_general(
                xs, w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if i % 2 == 0:
                a0 = dres if a0 is None else a0 + dres
            else:
                a1 = dres if a1 is None else a1 + dres
        return a0 + a1

    if not gh:
        acc[0] = jnp.zeros_like(acc[0])
        acc[1] = jnp.zeros_like(acc[1])
        for i, (dz, off) in enumerate(taps):
            xs = slab[(z + dz) % 4, pl.ds(off, rout), :]
            dres = jax.lax.dot_general(
                xs, w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc[i % 2] += dres
        outbuf[par] = _epilogue(acc[0] + acc[1], rout)
    else:
        for g in range(ht // gh):
            g0 = g * gh * wpad
            grows = gh * wpad
            # i32 mismatch reduction instead of an i1 all() — see the
            # bf16 kernel; int8 equality is exact in i32 subtraction
            mism = None
            for dz in range(3):
                w = slab[
                    (z + dz) % 4, pl.ds(8 + g0, (gh + 2) * wpad), :
                ].astype(jnp.int32)
                dmax = jnp.max(jnp.abs(w[wpad:] - w[:-wpad]))
                mism = dmax if mism is None else jnp.maximum(mism, dmax)
            is_const = mism == 0

            @pl.when(is_const)
            def _const(g0=g0, grows=grows):
                row = _epilogue(_taps(g0, wpad), wpad)
                outbuf[par, pl.ds(g0, grows)] = jnp.broadcast_to(
                    row[None], (gh, wpad, row.shape[-1])
                ).reshape(grows, -1)

            @pl.when(jnp.logical_not(is_const))
            def _full(g0=g0, grows=grows):
                outbuf[par, pl.ds(g0, grows)] = _epilogue(
                    _taps(g0, grows), grows
                )
    _out_copy(par).start()

    @pl.when(jnp.logical_and(h == n_h - 1, z == d - 1))
    def _drain():
        _out_copy(par).wait()

        @pl.when(n_h * d >= 2)
        def _drain_other():
            _out_copy(1 - par).wait()


def conv3d_chain_q(
    x: jax.Array,
    packed_w: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    hh: int,
    wp: int,
    relu: bool = True,
    h_tile: Optional[int] = None,
    interpret: bool = False,
    zp: bool = False,
    sparse_gh: Optional[int] = None,
) -> jax.Array:
    """Quantized chain conv: int8 in, int8 out, int32 MXU accumulation.

    :param x: (D+2, (H+2)*wpad, Cin_p) chained layout, **int8**.
    :param packed_w: (27, Cin_p, Cout_p) **int8** packed weights
        (:func:`pack_weights` output quantized per output lane, with the
        per-input-lane activation scale folded in before rounding).
    :param scale: (1, Cout_p) f32 — dequant*requant factor per output lane.
    :param bias: (1, Cout_p) f32 — BN-folded bias in requantized units
        (in zp mode: including the zero-point correction).
    :param zp: zero-point mode (q = a/s - 128, 255 activation levels);
        borders fill with -128 instead of 0. Requires ``relu``.
    :returns: (D+2, (H+2)*wpad, Cout_p) chained layout, int8, borders
        filled with the mode's zero.
    """
    assert x.dtype == jnp.int8 and packed_w.dtype == jnp.int8
    assert relu or not zp, "zp mode represents post-ReLU activations"
    dp2, rows, cin_p = x.shape
    d = dp2 - 2
    wpad = rows // (hh + 2)
    assert wpad * (hh + 2) == rows and wpad % 8 == 0, (wpad, hh, rows)
    assert wp < wpad
    cout_p = packed_w.shape[2]

    if h_tile is None:
        h_tile = _pick_chain_h_tile_q(hh, wpad, cin_p, cout_p)
    assert hh % h_tile == 0
    ht = h_tile
    n_h = hh // ht
    rout = ht * wpad
    dma_rows = (ht + 2) * wpad
    n_slab = dma_rows + 16

    taps = tuple(
        (dz, dy * wpad + t + 7)
        for dz in range(3) for dy in range(3) for t in range(3)
    )
    kern = functools.partial(
        _chain_kernel_ring_q, taps=taps, rout=rout, dma_rows=dma_rows,
        relu=relu, wp=wp, wpad=wpad, ht=ht, n_h=n_h, hh=hh, d=d, zp=zp,
        gh=_resolve_sparse_gh(sparse_gh, ht, wpad),
    )
    return pl.pallas_call(
        kern,
        grid=(n_h, d),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((dp2, rows, cout_p), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((4, n_slab, cin_p), jnp.int8),
            pltpu.VMEM((2, rout, cout_p), jnp.int32),
            pltpu.VMEM((2, rout, cout_p), jnp.int8),
            pltpu.VMEM((max(rout, 2 * wpad), cout_p), jnp.int8),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, packed_w, scale, bias)


def _pick_chain_h_tile_q(hh: int, wpad: int, cin_p: int, cout_p: int,
                         vmem_budget: int = 12 * 2**20) -> int:
    """Largest divisor of H whose int8 scratch set fits the VMEM budget."""
    for ht in sorted((t for t in range(1, hh + 1) if hh % t == 0),
                     reverse=True):
        rout = ht * wpad
        need = (
            4 * ((ht + 2) * wpad + 16) * cin_p          # int8 slab ring
            + 2 * rout * cout_p * 4                      # int32 acc x2
            + 3 * rout * cout_p                          # int8 outbufs + zbuf
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no chain H tile fits: H={hh}, wpad={wpad}")


# ---------------------------------------------------------------------------
# MaxPool(2) chained layout -> chained layout (pack halves, W/pack grid and
# wpad unchanged). W-pairs are adjacent packed lanes, H-pairs adjacent rows,
# D-pairs adjacent planes; the input's zero borders pool to zero borders, so
# the output halo only needs the usual designated-iteration zero writes.
# ---------------------------------------------------------------------------


def _pool_kernel(x_hbm, sel_e, sel_o, out_hbm, slab, outbuf, zbuf, sem_in,
                 sem_out, sem_z, *, ht, wpad, pack, cout, n_h, hh2, d2, rin,
                 rout, fill):
    z = pl.program_id(0)
    h = pl.program_id(1)
    y0 = h * ht  # output-row tile start (output H = hh2)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _init():
        zbuf[:] = jnp.full_like(zbuf, fill)

    cp_in = pltpu.make_async_copy(
        x_hbm.at[pl.ds(1 + 2 * z, 2), pl.ds((1 + 2 * y0) * wpad, rin)],
        slab, sem_in,
    )
    cp_in.start()

    def _zero(plane, row0, nrows):
        cp = pltpu.make_async_copy(
            zbuf.at[pl.ds(0, nrows)],
            out_hbm.at[plane, pl.ds(row0, nrows)], sem_z,
        )
        cp.start()
        cp.wait()

    @pl.when(h == 0)
    def _top():
        _zero(z + 1, 0, wpad)

    @pl.when(h == n_h - 1)
    def _bottom():
        _zero(z + 1, (hh2 + 1) * wpad, wpad)

    @pl.when(z == 0)
    def _plane0():
        _zero(0, h * rout, rout)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, hh2 * wpad, 2 * wpad)

    @pl.when(z == d2 - 1)
    def _planeD():
        _zero(d2 + 1, h * rout, rout)

    @pl.when(jnp.logical_and(z == d2 - 1, h == 0))
    def _planeD_tail():
        _zero(d2 + 1, hh2 * wpad, 2 * wpad)

    cp_in.wait()

    # int8 vector max is unsupported by Mosaic (arith.maxsi on vector<i8>);
    # widen to int32 for the reductions — exact. D- and H-pair maxes are
    # single full-width vector passes; the W-pair max + lane compaction
    # runs as TWO 0/1 selection matmuls on the (otherwise idle) MXU —
    # out = max(m @ Sel_even, m @ Sel_odd) — replacing the old per-row
    # 8-lane-wide copy loop that left the VPU at 1/16 lane utilization
    # (the pool was the 4th-hottest op of the int8 engine at 2.94 ms;
    # this form is DMA-bound). Exact: the selected values round-trip
    # through the matmul unchanged (int8 x {0,1} in int32; bf16 x 1.0).
    cdt = jnp.int32 if slab.dtype == jnp.int8 else slab.dtype
    m = jnp.maximum(slab[0].astype(cdt), slab[1].astype(cdt))  # D-pair
    cp = m.shape[-1]
    m = jnp.max(m.reshape(ht, 2, wpad, cp), axis=1)            # H-pair
    mq = m.reshape(rout, cp).astype(slab.dtype)
    acc_dt = jnp.int32 if slab.dtype == jnp.int8 else jnp.float32
    a = jax.lax.dot_general(
        mq, sel_e[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dt,
    )
    b = jax.lax.dot_general(
        mq, sel_o[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dt,
    )
    outbuf[:] = jnp.maximum(a, b).astype(outbuf.dtype)

    cp_out = pltpu.make_async_copy(
        outbuf, out_hbm.at[z + 1, pl.ds((1 + y0) * wpad, rout)], sem_out
    )
    cp_out.start()
    cp_out.wait()


def maxpool2_chain(
    x: jax.Array,
    hh: int,
    wp: int,
    pack: int,
    cout: int,
    interpret: bool = False,
    fill: int = 0,
) -> jax.Array:
    """MaxPool(2) on a chained-layout volume; returns the next level's
    chained layout at pack ``pack // 2`` (requires pack >= 2).

    ``fill`` is the halo value of the OUTPUT borders (the input's own
    borders pool through max unchanged): 0 for the bf16 engine, -128 for
    the zero-point int8 engine."""
    dp2, rows, cp_ = x.shape
    d = dp2 - 2
    wpad = rows // (hh + 2)
    assert pack >= 2 and d % 2 == 0 and hh % 2 == 0
    d2, hh2 = d // 2, hh // 2
    cpo = _round_up((pack // 2) * cout, LANE)

    ht = _pick_pool_h_tile(hh2, wpad, cp_, cpo)
    n_h = hh2 // ht
    rin = 2 * ht * wpad
    rout = ht * wpad

    # 0/1 selection matrices for the W-pair max-compaction matmuls:
    # Sel_even[2s*cout + c, s*cout + c] = 1, Sel_odd shifts by cout.
    half = pack // 2
    sel = np.zeros((2, cp_, cpo), np.float32)
    for s in range(half):
        for c in range(cout):
            sel[0, (2 * s) * cout + c, s * cout + c] = 1.0
            sel[1, (2 * s + 1) * cout + c, s * cout + c] = 1.0
    with jax.ensure_compile_time_eval():
        sel_j = jnp.asarray(
            sel.astype(np.int8 if x.dtype == jnp.int8 else np.float32)
        ).astype(x.dtype)

    kern = functools.partial(
        _pool_kernel, ht=ht, wpad=wpad, pack=pack, cout=cout, n_h=n_h,
        hh2=hh2, d2=d2, rin=rin, rout=rout, fill=fill,
    )
    return pl.pallas_call(
        kern,
        grid=(d2, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (d2 + 2, (hh2 + 2) * wpad, cpo), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rin, cp_), x.dtype),
            pltpu.VMEM((rout, cpo), x.dtype),
            pltpu.VMEM((max(rout, 2 * wpad), cpo), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, sel_j[0], sel_j[1])


def _pick_pool_h_tile(hh2, wpad, cp_in, cpo, vmem_budget=8 * 2**20):
    for ht in sorted((t for t in range(1, min(hh2, 16) + 1) if hh2 % t == 0),
                     reverse=True):
        need = (
            2 * 2 * ht * wpad * cp_in * 2
            + 2 * ht * wpad * cpo * 2
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no pool H tile fits: H/2={hh2}, wpad={wpad}")


def choose_pack(ww: int, cin: int, max_lanes: int = 512, k: int = 3) -> int:
    """Largest pack in {16,8,4,2,1} dividing W with pack*Cin <= limit and
    pack >= k//2 (packed-tap constraint).

    16 is a measured ceiling, not a kernel limit (``pack_weights`` takes
    any pack): pack 32 made the 512-res engine 1.65x SLOWER — i_size=4
    channel counts round up to two 128-lane blocks per matmul operand
    (BASELINE.md round 4). 5-block models instead run the pack-exhausted
    tail (pack-1 convs, one standard-space pool, a decoder repack)."""
    min_pack = max(1, k // 2)
    for p in (16, 8, 4, 2, 1):
        if p < min_pack:
            break
        if ww % p == 0 and _round_up(p * cin, LANE) <= max_lanes:
            return p
    raise ValueError(
        f"no legal pack for W={ww}, Cin={cin}, k={k}"
    )
