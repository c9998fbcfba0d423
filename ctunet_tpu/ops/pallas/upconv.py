"""Fused upsample+conv Pallas kernel: ConvT(k2,s2) ∘ Conv3D(k3)+BN+ReLU.

The decoder's dominant cost was the pair [chain convT] -> [28->7 full-res
chain conv]: the conv's W-packing inflates its FLOPs 16x at full
resolution (37.7 ms of a 97.5 ms volume). Composing the two linear ops
into ONE fractionally-strided kernel evaluates the conv at HALF resolution
inputs: each full-res output voxel draws 2 taps/dim (2^3 total) from the
half-res operands, cutting useful MACs ~3.4x and kernel time ~4x.

Construction is by IMPULSE-RESPONSE EXTRACTION (``composite_response``):
the composite of convT(transpose-kernel layout, incl. weight-split dual
operands) and the BN-folded conv is shift-invariant w.r.t. input shifts by
one (output shifts by two), so per-channel unit impulses fully determine
the 4^3-support response R[r], r in [-1,2]^3; out[v] = sum_u R[v-2u] in[u].
For out parity alpha per dim, the nonzero taps are u = ceil(v/2)-1+delta,
delta in {0,1} — exactly 2 per dim.

The convT BIAS rides as an extra input channel of the first operand that
is constant 1 inside the volume and 0 in the halo (SAME-conv semantics at
borders come out exactly); the engine gets that channel FOR FREE by giving
the producing conv kernel an extra output channel with zero weights and
bias 1 (ReLU(1)=1).

The kernel mirrors ``conv3d_chain``'s tap-slice structure with kd=ky=2 and
per-output-row-parity weight matrices (interleaved like
``conv_transpose_chain``): chain layout in (2 operands, half res, pack p)
-> chain layout out (full res, pack 2p).
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


def augment_upconv_kernel(kk: np.ndarray, bb: np.ndarray,
                          ca: Optional[int] = None):
    """Append the convT bias as a ones-driven input column — the shared
    augmented-kernel layout consumed by :func:`composite_response`.

    Single-operand (``ca=None``): ``[k | bias-col]``. Dual-operand
    (operand a has ``ca`` real channels followed by operand b):
    ``[k_a | bias-col | k_b | zero-col]`` — each operand carries a ones
    lane, the first regenerates the convT bias, the second contributes
    nothing. Returns ``(kT_aug, ci_split)`` with ``ci_split`` the lane
    index where operand b starts (None for single-operand). The engine
    build (``engine_q._quant_upconv``) and the rounding simulator
    (``quant_opt``) both use this so their composite lane layouts can
    never drift apart.
    """
    kk = np.asarray(kk, np.float32)
    bcol = np.broadcast_to(
        np.asarray(bb, np.float32)[None, None, None, :, None],
        kk.shape[:4] + (1,),
    ).copy()
    if ca is None:
        return np.concatenate([kk, bcol], -1), None
    zcol = np.zeros_like(bcol)
    kT_aug = np.concatenate(
        [kk[..., :ca], bcol, kk[..., ca:], zcol], -1
    )
    return kT_aug, ca + 1


def composite_response(
    kT: np.ndarray,
    w0: np.ndarray,
    scale0: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Composite responses R[rz, ry, rx, ci, co] (r in [-1,2] -> index r+1).

    :param kT: convT weights, flax transpose_kernel layout (2,2,2,Ct,Cin)
        over the FULL concat input (operand split happens at pack time).
        The convT BIAS must already be appended as the last input-channel
        column, constant across the (2,2,2) taps — callers then feed that
        channel as the ones-field (see module docstring).
    :param w0: conv weights (3,3,3,Ct,Co); ``scale0`` optional BN fold.
    """
    kT = np.asarray(kT, np.float64)
    w0 = np.asarray(w0, np.float64)
    if scale0 is not None:
        w0 = w0 * np.asarray(scale0, np.float64)[None, None, None, None, :]
    ct, cin = kT.shape[3], kT.shape[4]
    co = w0.shape[4]
    # R[r] = sum_{a,b,c,d3} kT[a,b,c,:,ci] * w0[d3,:,co] with
    # r = (a,b,c) + 1 - d3  (convT out at 2u+a; conv taps v+d3-1 = 2u+a
    # -> r = v-2u = a - d3 + 1 per dim).
    R = np.zeros((4, 4, 4, cin, co), np.float64)
    for az in range(2):
        for ay in range(2):
            for ax in range(2):
                for dz in range(3):
                    for dy in range(3):
                        for dx in range(3):
                            rz = az - dz + 1
                            ry = ay - dy + 1
                            rx = ax - dx + 1
                            R[rz + 1, ry + 1, rx + 1] += np.einsum(
                                "ti,to->io", kT[az, ay, ax], w0[dz, dy, dx]
                            )
    return R.astype(np.float32)


def _r_index(alpha: int, delta: int) -> int:
    """r = v - 2u for out parity ``alpha`` and tap ``delta``
    (u = ceil(v/2) - 1 + delta); returns r+1 (R array index)."""
    v = 2 + alpha  # any representative with v % 2 == alpha
    u = -(-v // 2) - 1 + delta
    return v - 2 * u + 1


def build_upconv_matrices(
    R: np.ndarray,
    pin: int,
    ci_split: Optional[int] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Packed per-parity matrices from the composite response.

    :param R: (4,4,4,Cin,Co) from :func:`composite_response`.
    :param pin: input pack; output pack is 2*pin.
    :param ci_split: channels of the FIRST operand (incl. the ones
        channel); remaining channels form the second operand's matrices.
        None = single operand.
    :returns: ``mats_a`` (2,2,12, Cin_p, Cout_p) indexed
        [alpha_z][beta_y][(dz*2+dy)*3 + (t+1)], and ``mats_b`` or None.
        Tap semantics match ``conv3d_chain``: input row slice offset
        ``dy*wpad + t`` relative to the out row's base input row
        (u_y = ceil(y/2)-1), plane offset ``dz``.
    """
    cin, co = R.shape[3], R.shape[4]
    pout = 2 * pin
    splits = [(0, cin if ci_split is None else ci_split)]
    if ci_split is not None:
        splits.append((ci_split, cin - ci_split))
    outs = []
    for c0, cw in splits:
        cin_p = _round_up(pin * cw, LANE)
        cout_p = _round_up(pout * co, LANE)
        m = np.zeros((2, 2, 12, cin_p, cout_p), np.float32)
        for alpha in range(2):      # out z parity
            for beta in range(2):   # out y parity
                for dz in range(2):
                    for dy in range(2):
                        rz = _r_index(alpha, dz)
                        ry = _r_index(beta, dy)
                        for s_out in range(pout):
                            # x taps: u_x = ceil(x/2)-1+dx, x == s_out mod
                            # 2p block; fold block crossing into t.
                            for dx in range(2):
                                u_x = -(-s_out // 2) - 1 + dx
                                rx = s_out - 2 * u_x + 1
                                t = u_x // pin  # -1, 0 (or 1: impossible)
                                s_in = u_x - t * pin
                                tap = (dz * 2 + dy) * 3 + (t + 1)
                                m[alpha, beta, tap,
                                  s_in * cw: (s_in + 1) * cw,
                                  s_out * co: (s_out + 1) * co,
                                  ] += R[rz, ry, rx, c0: c0 + cw, :]
        outs.append(m)
    return outs[0], (outs[1] if ci_split is not None else None)


def build_upconv_matrices_split(
    R: np.ndarray,
    pin: int,
    ci_split: Optional[int] = None,
):
    """Split-tap packing of the composite response (see
    ``conv3d.pack_weights_split`` — same restructure for the fused
    upsample+conv: the t = +-1 tap matrices of :func:`build_upconv_matrices`
    carry exactly ONE nonzero block each, namely u_x = -1 (s_out = 0,
    dx = 0) and u_x = pin (s_out = 2*pin - 1, dx = 1)).

    :returns: per operand a tuple ``(main, corr)``:
        ``main`` (2, 2, 4, round_up(pin*cw, 128), Cout_p) indexed
        ``[alpha][beta][dz*2+dy]`` — in-block taps, operand = the raw
        half-res slab at row offset (beta+dy)*wpad + 8;
        ``corr`` (2, 2, 2, round_up(4*cw, 128), Cout_p) indexed
        ``[alpha][beta][dz]`` — boundary taps, rows ((dy, side, c)),
        operand = the PER-PLANE gathered boundary buffer (built once per
        arriving plane by the kernel's MXU permutation dots,
        :func:`upconv_corr_perms`) at row offset beta*wpad.
        Single-operand: second element is None.
    """
    cin, co = R.shape[3], R.shape[4]
    pout = 2 * pin
    splits = [(0, cin if ci_split is None else ci_split)]
    if ci_split is not None:
        splits.append((ci_split, cin - ci_split))
    outs = []
    for c0, cw in splits:
        kp = _round_up(pin * cw, LANE)
        kc = _round_up(4 * cw, LANE)
        cout_p = _round_up(pout * co, LANE)
        main = np.zeros((2, 2, 4, kp, cout_p), np.float32)
        corr = np.zeros((2, 2, 2, kc, cout_p), np.float32)
        for alpha in range(2):
            for beta in range(2):
                for dz in range(2):
                    for dy in range(2):
                        rz = _r_index(alpha, dz)
                        ry = _r_index(beta, dy)
                        for s_out in range(pout):
                            for dx in range(2):
                                u_x = -(-s_out // 2) - 1 + dx
                                rx = s_out - 2 * u_x + 1
                                blk = R[rz, ry, rx, c0: c0 + cw, :]
                                if 0 <= u_x < pin:
                                    main[alpha, beta, dz * 2 + dy,
                                         u_x * cw:(u_x + 1) * cw,
                                         s_out * co:(s_out + 1) * co,
                                         ] += blk
                                else:
                                    side = 0 if u_x == -1 else 1
                                    i0 = dy * 2 + side
                                    corr[alpha, beta, dz,
                                         i0 * cw:(i0 + 1) * cw,
                                         s_out * co:(s_out + 1) * co,
                                         ] += blk
        outs.append((main, corr))
    return outs[0], (outs[1] if ci_split is not None else None)


def upconv_corr_perms(pin: int, cw: int, cin_p: int) -> np.ndarray:
    """(4, cin_p, round_up(4*cw, 128)) 0/1 permutation matrices, indexed
    ``2*dy + side`` — the MXU boundary gather for the split upconv kernel
    (same construction as ``conv3d.corr_perms``, k=2 edition): applied to
    a plane's slab at row offsets base(dy)-1 / base(dy)+1 they assemble
    the per-plane boundary operand the ``corr`` matrices contract with.
    """
    kc = _round_up(4 * cw, LANE)
    p = np.zeros((4, cin_p, kc), np.float32)
    for dy in range(2):
        for c in range(cw):
            p[2 * dy, (pin - 1) * cw + c, (2 * dy) * cw + c] = 1.0
            p[2 * dy + 1, c, (2 * dy + 1) * cw + c] = 1.0
    return p


def _upconv_kernel_split(a_hbm, b_hbm, ma_ref, mb_ref, ca_ref, cb_ref,
                         pa_ref, pb_ref, s_ref, bias_ref, out_hbm, slab_a,
                         slab_b, cbuf_a, cbuf_b, acc, outbuf, zbuf, sem_a,
                         sem_b, sem_out, sem_z, *, rout, dma_rows, wp, wpad,
                         ht, n_h, hh2, d2, dual, quant, zp, cw_a, cw_b, pin):
    """Ring-cached split-tap fused upsample+conv (grid (n_h, d2), output
    plane z innermost).

    Round-3 rewrite of the serial form, which re-DMA'd its 2-plane input
    window every step, gathered the boundary buffer with VPU lane-rotate
    copies every step, and start+WAITed its output DMA in-step. Here:

    - a 4-slot INPUT PLANE RING per operand: output planes z = 2q-1, 2q
      share input plane q, so each plane's window is DMA'd once per
      h-tile and prefetched two steps ahead;
    - the boundary gather runs ON THE MXU (4 permutation dots per operand
      per ARRIVING plane — ``upconv_corr_perms``), its result reused by
      the two (z, dz) steps the plane participates in;
    - output DMAs are double-buffered (reclaimed two steps later).

    Per step and operand: 8 main dots (2 beta x (dz, dy)) + 2 corr dots
    (beta x dz) on the per-plane gathered buffers.
    """
    h = pl.program_id(0)
    z = pl.program_id(1)
    h0 = h * ht
    p = (z + 1) // 2  # first input plane of this output plane's pair
    fill = jnp.int8(-128) if zp else 0
    crows = rout + wpad
    dh = d2 // 2
    gather_dt = jnp.int32 if quant else jnp.float32

    @pl.when(jnp.logical_and(h == 0, z == 0))
    def _init():
        slab_a[:, 0:8, :] = jnp.full_like(slab_a[:, 0:8, :], fill)
        if dual:
            slab_b[:, 0:8, :] = jnp.full_like(slab_b[:, 0:8, :], fill)
        zbuf[:] = jnp.full_like(zbuf, fill)

    def _in_copy_a(q):
        return pltpu.make_async_copy(
            a_hbm.at[q, pl.ds(h0 * wpad, dma_rows)],
            slab_a.at[q % 4, pl.ds(8, dma_rows)], sem_a.at[q % 4],
        )

    def _in_copy_b(q):
        return pltpu.make_async_copy(
            b_hbm.at[q, pl.ds(h0 * wpad, dma_rows)],
            slab_b.at[q % 4, pl.ds(8, dma_rows)], sem_b.at[q % 4],
        )

    def _start(q):
        _in_copy_a(q).start()
        if dual:
            _in_copy_b(q).start()

    def _wait(q):
        _in_copy_a(q).wait()
        if dual:
            _in_copy_b(q).wait()

    def _build_one(cbuf, slab, p_ref, q):
        g = None
        for dy in range(2):
            base = 8 + dy * wpad
            for side, roff in ((0, -1), (1, 1)):
                xs = slab[q % 4, pl.ds(base + roff, crows), :]
                dres = jax.lax.dot_general(
                    xs, p_ref[2 * dy + side], (((1,), (0,)), ((), ())),
                    preferred_element_type=gather_dt,
                )
                g = dres if g is None else g + dres
        cbuf[q % 4] = g.astype(cbuf.dtype)

    def _build_c(q):
        _build_one(cbuf_a, slab_a, pa_ref, q)
        if dual:
            _build_one(cbuf_b, slab_b, pb_ref, q)

    @pl.when(z == 0)
    def _prefill():
        _start(0)
        _start(1)
        if dh + 1 >= 2:  # static: input has dh+2 planes
            _start(2)
        _wait(0)
        _build_c(0)
        _wait(1)
        _build_c(1)

    # a NEW input plane ((z+3)//2) enters at every odd z; prefetch the
    # plane two steps ahead of its own entry
    @pl.when(jnp.logical_and(z % 2 == 1, (z + 5) // 2 <= dh + 1))
    def _prefetch():
        _start((z + 5) // 2)

    @pl.when(jnp.logical_and(z % 2 == 1, (z + 3) // 2 <= dh + 1))
    def _arrive():
        _wait((z + 3) // 2)
        _build_c((z + 3) // 2)

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
        _zero(0, h * 2 * rout, 2 * rout)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, hh2 * wpad, 2 * wpad)

    @pl.when(z == d2 - 1)
    def _planeD():
        _zero(d2 + 1, h * 2 * rout, 2 * rout)

    @pl.when(jnp.logical_and(z == d2 - 1, h == 0))
    def _planeD_tail():
        _zero(d2 + 1, hh2 * wpad, 2 * wpad)

    par = (h * d2 + z) % 2

    def _out_copy(pbuf):
        return pltpu.make_async_copy(
            outbuf.at[pbuf],
            out_hbm.at[z + 1, pl.ds((1 + 2 * h0) * wpad, 2 * rout)],
            sem_out.at[pbuf],
        )

    @pl.when(h * d2 + z >= 2)
    def _reclaim():
        _out_copy(par).wait()

    alpha = z % 2
    acc_dt = jnp.int32 if quant else jnp.float32
    col = jax.lax.broadcasted_iota(jnp.int32, (rout, 1), 0) % wpad
    for beta in range(2):
        acc0 = jnp.zeros((rout, acc.shape[-1]), acc_dt)
        for dz in range(2):
            for dy in range(2):
                off = (beta + dy) * wpad + 8
                idx = (alpha * 2 + beta) * 4 + dz * 2 + dy
                xa = slab_a[(p + dz) % 4, pl.ds(off, rout), :]
                acc0 = acc0 + jax.lax.dot_general(
                    xa, ma_ref[idx], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt,
                )
                if dual:
                    xb = slab_b[(p + dz) % 4, pl.ds(off, rout), :]
                    acc0 = acc0 + jax.lax.dot_general(
                        xb, mb_ref[idx], (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_dt,
                    )
        for dz in range(2):
            cidx = (alpha * 2 + beta) * 2 + dz
            acc0 = acc0 + jax.lax.dot_general(
                cbuf_a[(p + dz) % 4, pl.ds(beta * wpad, rout), :],
                ca_ref[cidx],
                (((1,), (0,)), ((), ())), preferred_element_type=acc_dt,
            )
            if dual:
                acc0 = acc0 + jax.lax.dot_general(
                    cbuf_b[(p + dz) % 4, pl.ds(beta * wpad, rout), :],
                    cb_ref[cidx],
                    (((1,), (0,)), ((), ())), preferred_element_type=acc_dt,
                )
        if quant and zp:
            b_row = bias_ref[pl.ds(alpha * 2 + beta, 1)]
            res = acc0.astype(jnp.float32) * s_ref[0][None, :]
            res = jnp.maximum(res + b_row, 0.0)
            res = jnp.round(jnp.minimum(res, 255.0)) - 128.0
            res = jnp.where(col < wp, res, -128.0)
        elif quant:
            res = acc0.astype(jnp.float32) * s_ref[0][None, :]
            res = jnp.maximum(res + bias_ref[0][None, :], 0.0)
            res = jnp.round(jnp.minimum(res, 127.0))
            res = jnp.where(col < wp, res, 0.0)
        else:
            res = jnp.maximum(acc0 + bias_ref[0][None, :], 0.0)
            res = jnp.where(col < wp, res, 0.0)
        acc[beta] = res
    for vl in range(ht):
        outbuf[par, (2 * vl) * wpad: (2 * vl + 1) * wpad] = (
            acc[0, vl * wpad: (vl + 1) * wpad]
        ).astype(outbuf.dtype)
        outbuf[par, (2 * vl + 1) * wpad: (2 * vl + 2) * wpad] = (
            acc[1, vl * wpad: (vl + 1) * wpad]
        ).astype(outbuf.dtype)
    _out_copy(par).start()

    @pl.when(jnp.logical_and(h == n_h - 1, z == d2 - 1))
    def _drain():
        _out_copy(par).wait()

        @pl.when(n_h * d2 >= 2)
        def _drain_other():
            _out_copy(1 - par).wait()


def upconv_fused_chain_split(
    a_chain: jax.Array,
    split_a,
    bias2: jax.Array,
    hh: int,
    wp: int,
    pin: int,
    cw_a: int,
    b_chain: Optional[jax.Array] = None,
    split_b=None,
    cw_b: int = 0,
    scale2: Optional[jax.Array] = None,
    interpret: bool = False,
    zp: bool = False,
) -> jax.Array:
    """Split-tap fused ConvT(k2,s2)+Conv3(k3)+bias+ReLU (chain -> chain).

    Same contract as :func:`upconv_fused_chain` but taking the
    ``(main, corr)`` packs from :func:`build_upconv_matrices_split` plus
    the static pack/width info (``pin``, per-operand channel counts).
    """
    dh2, rows, cpa = a_chain.shape
    dh = dh2 - 2
    wpad = rows // (hh + 2)
    assert wpad * (hh + 2) == rows and wpad % 8 == 0
    ma, ca = split_a
    cpo = ma.shape[-1]
    dual = b_chain is not None
    cpb = b_chain.shape[-1] if dual else cpa
    quant = scale2 is not None
    assert quant or not zp
    if quant:
        assert a_chain.dtype == jnp.int8 and ma.dtype == jnp.int8
        assert bias2.shape[0] == (4 if zp else 1), bias2.shape

    kc_a = ca.shape[-2]
    mb, cb = split_b if dual else (ma, ca)
    kc_b = cb.shape[-2]

    ht = _pick_h_tile_split(
        hh, wpad, cpa + (cpb if dual else 0), kc_a + (kc_b if dual else 0),
        cpo, quant,
    )
    n_h = hh // ht
    rout = ht * wpad
    dma_rows = (ht + 2) * wpad
    n_slab = dma_rows + 16

    kern = functools.partial(
        _upconv_kernel_split, rout=rout, dma_rows=dma_rows, wp=wp,
        wpad=wpad, ht=ht, n_h=n_h, hh2=2 * hh, d2=2 * dh, dual=dual,
        quant=quant, zp=zp, cw_a=cw_a, cw_b=cw_b if dual else cw_a,
        pin=pin,
    )
    b_in = b_chain if dual else a_chain
    ma_in = ma.reshape(16, ma.shape[-2], cpo)
    ca_in = ca.reshape(8, kc_a, cpo)
    mb_in = mb.reshape(16, mb.shape[-2], mb.shape[-1])
    cb_in = cb.reshape(8, kc_b, cb.shape[-1])
    with jax.ensure_compile_time_eval():
        np_pdt = np.int8 if quant else np.float32
        pa_in = jnp.asarray(
            upconv_corr_perms(pin, cw_a, cpa).astype(np_pdt))
        pb_in = jnp.asarray(upconv_corr_perms(
            pin, cw_b if dual else cw_a, cpb).astype(np_pdt))
    if not quant:
        ma_in = ma_in.astype(a_chain.dtype)
        ca_in = ca_in.astype(a_chain.dtype)
        mb_in = mb_in.astype(a_chain.dtype)
        cb_in = cb_in.astype(a_chain.dtype)
        pa_in = pa_in.astype(a_chain.dtype)
        pb_in = pb_in.astype(a_chain.dtype)
    s_in = scale2 if quant else jnp.ones((1, cpo), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(n_h, 2 * dh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (2 * dh + 2, (2 * hh + 2) * wpad, cpo), a_chain.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((4, n_slab, cpa), a_chain.dtype),
            pltpu.VMEM((4, n_slab, cpb), a_chain.dtype),
            pltpu.VMEM((4, rout + wpad, kc_a), a_chain.dtype),
            pltpu.VMEM((4, rout + wpad, kc_b), a_chain.dtype),
            pltpu.VMEM((2, rout, cpo), jnp.float32),
            pltpu.VMEM((2, 2 * rout, cpo), a_chain.dtype),
            pltpu.VMEM((max(2 * rout, 2 * wpad), cpo), a_chain.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_chain, b_in, ma_in, mb_in, ca_in, cb_in, pa_in, pb_in, s_in, bias2)


def _pick_h_tile_split(hh, wpad, cin_total, kc_total, cpo, quant,
                       vmem_budget=10 * 2**20):
    b_io = 1 if quant else 2
    for ht in sorted((t for t in range(1, min(hh, 16) + 1) if hh % t == 0),
                     reverse=True):
        rout = ht * wpad
        need = (
            4 * ((ht + 2) * wpad + 16) * cin_total * b_io  # plane rings
            + 4 * (rout + wpad) * kc_total * b_io           # corr rings
            + 2 * rout * cpo * 4                            # acc
            + 6 * rout * cpo * b_io                         # outbufs + zbuf
            + (16 * 128 + 8 * 128 + 4 * 128) * cpo * b_io   # weights+perms
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no split upconv H tile fits: H={hh}, wpad={wpad}")


def stack_upconv_matrices(m: np.ndarray) -> np.ndarray:
    """Rearrange full-form upconv matrices for the v3 (DMA-stacked)
    kernel: (2, 2, 12, Kp, Cpo) with Kp == 128 -> (2, 2, 3, 512, Cpo)
    indexed [alpha][beta][t], rows ((dz*2+dy) lane block, pin*cw lane).

    Same restructure as ``conv3d.pack_weights_stacked``: the kernel's
    ring slots hold a (dz, dy)-stacked operand filled by 4 row-shifted
    DMAs, so each (beta, t) needs ONE dot over all four (dz, dy) pairs —
    12 accumulator adds per grid step instead of 48 (the upconv kernel
    is VPU-add-bound on v5e, like the chain conv; see conv3d.py).
    """
    assert m.shape[3] == LANE, f"v3 needs a single-lane-block K: {m.shape}"
    cpo = m.shape[-1]
    out = np.zeros((2, 2, 3, 4 * LANE, cpo), m.dtype)
    for alpha in range(2):
        for beta in range(2):
            for g in range(4):  # dz*2+dy
                for t in range(3):
                    out[alpha, beta, t, g * LANE:(g + 1) * LANE] = (
                        m[alpha, beta, g * 3 + t]
                    )
    return out


def _upconv_kernel_v3(a_hbm, b_hbm, ma_ref, mb_ref, s_ref, bias_ref,
                      out_hbm, slab_a, slab_b, acc, outbuf, zbuf, sem_a,
                      sem_b, sem_out, sem_z, *, rout, dma_rows, wp, wpad,
                      ht, n_h, hh2, d2, dual, quant, zp):
    """DMA-stacked upconv kernel: ring-less (slab re-DMA'd per step, as
    the full-form kernel), operands (dz, dy)-stacked in lanes by 4 DMAs
    per operand; per beta, one dot per t per operand (K = 512)."""
    z = pl.program_id(0)   # out plane in [0, 2*Dh)
    h = pl.program_id(1)
    h0 = h * ht
    pin_plane = (z + 1) // 2
    fill = jnp.int8(-128) if zp else 0

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _init():
        slab_a[0:8, :] = jnp.full_like(slab_a[0:8, :], fill)
        if dual:
            slab_b[0:8, :] = jnp.full_like(slab_b[0:8, :], fill)
        zbuf[:] = jnp.full_like(zbuf, fill)

    # Slab row s (s >= 8), lane block g = dz*2+dy holds x[pin_plane+dz,
    # h0*wpad + dy*wpad - 8 + (s - 8)] — the -8 keeps DMA offsets 8-row
    # aligned (Mosaic requirement); reads for (beta, t) then slice rows
    # [15 + beta*wpad + t, + rout) (read offsets may be unaligned). At
    # (h == 0, dy == 0) the window's first 8 x rows don't exist: the DMA
    # shifts one vreg-row down and rows [8, 16) take the fill (only row
    # 15 = x[-1] is ever read — semantically a W-pad column = fill). The
    # top end lands on the plane's last row; the slack rows the
    # (beta=1, t>=1, j=rout-1) reads touch only feed the always-masked
    # w' = wpad-1 output row.
    def _dma(hbm, slab, sem, g, dz, dy):
        src0 = h0 * wpad + dy * wpad - 8
        return pltpu.make_async_copy(
            hbm.at[pin_plane + dz, pl.ds(src0, dma_rows)],
            slab.at[pl.ds(8, dma_rows), pl.ds(g * 128, 128)],
            sem.at[g],
        )

    def _dma_first(hbm, slab, sem, g, dz):
        return pltpu.make_async_copy(
            hbm.at[pin_plane + dz, pl.ds(0, dma_rows - 8)],
            slab.at[pl.ds(16, dma_rows - 8), pl.ds(g * 128, 128)],
            sem.at[g],
        )

    def _start(hbm, slab, sem):
        for dz in range(2):
            for dy in range(2):
                g = dz * 2 + dy
                if dy == 0:
                    @pl.when(h == 0)
                    def _a(g=g, dz=dz):
                        _dma_first(hbm, slab, sem, g, dz).start()

                    @pl.when(h != 0)
                    def _b(g=g, dz=dz, dy=dy):
                        _dma(hbm, slab, sem, g, dz, dy).start()
                else:
                    _dma(hbm, slab, sem, g, dz, dy).start()

    def _wait(hbm, slab, sem):
        for dz in range(2):
            for dy in range(2):
                g = dz * 2 + dy
                if dy == 0:
                    @pl.when(h == 0)
                    def _a(g=g, dz=dz):
                        _dma_first(hbm, slab, sem, g, dz).wait()
                        slab[8:16, pl.ds(g * 128, 128)] = jnp.full_like(
                            slab[8:16, pl.ds(g * 128, 128)], fill
                        )

                    @pl.when(h != 0)
                    def _b(g=g, dz=dz, dy=dy):
                        _dma(hbm, slab, sem, g, dz, dy).wait()
                else:
                    _dma(hbm, slab, sem, g, dz, dy).wait()

    _start(a_hbm, slab_a, sem_a)
    if dual:
        _start(b_hbm, slab_b, sem_b)

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
        _zero(0, h * 2 * rout, 2 * rout)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, hh2 * wpad, 2 * wpad)

    @pl.when(z == d2 - 1)
    def _planeD():
        _zero(d2 + 1, h * 2 * rout, 2 * rout)

    @pl.when(jnp.logical_and(z == d2 - 1, h == 0))
    def _planeD_tail():
        _zero(d2 + 1, hh2 * wpad, 2 * wpad)

    _wait(a_hbm, slab_a, sem_a)
    if dual:
        _wait(b_hbm, slab_b, sem_b)

    alpha = z % 2
    acc_dt = jnp.int32 if quant else jnp.float32
    col = jax.lax.broadcasted_iota(jnp.int32, (rout, 1), 0) % wpad
    for beta in range(2):
        acc0 = jnp.zeros((rout, acc.shape[-1]), acc_dt)
        for t in range(3):
            off = 15 + beta * wpad + t
            idx = (alpha * 2 + beta) * 3 + t
            xa = slab_a[pl.ds(off, rout), :]
            acc0 = acc0 + jax.lax.dot_general(
                xa, ma_ref[idx], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt,
            )
            if dual:
                xb = slab_b[pl.ds(off, rout), :]
                acc0 = acc0 + jax.lax.dot_general(
                    xb, mb_ref[idx], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt,
                )
        if quant and zp:
            b_row = bias_ref[pl.ds(alpha * 2 + beta, 1)]
            res = acc0.astype(jnp.float32) * s_ref[0][None, :]
            res = jnp.maximum(res + b_row, 0.0)
            res = jnp.round(jnp.minimum(res, 255.0)) - 128.0
            res = jnp.where(col < wp, res, -128.0)
        elif quant:
            res = acc0.astype(jnp.float32) * s_ref[0][None, :]
            res = jnp.maximum(res + bias_ref[0][None, :], 0.0)
            res = jnp.round(jnp.minimum(res, 127.0))
            res = jnp.where(col < wp, res, 0.0)
        else:
            res = jnp.maximum(acc0 + bias_ref[0][None, :], 0.0)
            res = jnp.where(col < wp, res, 0.0)
        acc[beta] = res
    for vl in range(ht):
        outbuf[(2 * vl) * wpad: (2 * vl + 1) * wpad] = (
            acc[0, vl * wpad: (vl + 1) * wpad]
        ).astype(outbuf.dtype)
        outbuf[(2 * vl + 1) * wpad: (2 * vl + 2) * wpad] = (
            acc[1, vl * wpad: (vl + 1) * wpad]
        ).astype(outbuf.dtype)
    cp_o = pltpu.make_async_copy(
        outbuf,
        out_hbm.at[z + 1, pl.ds((1 + 2 * h0) * wpad, 2 * rout)],
        sem_out,
    )
    cp_o.start()
    cp_o.wait()


def upconv_fused_chain_v3(
    a_chain: jax.Array,
    mats_a: jax.Array,
    bias2: jax.Array,
    hh: int,
    wp: int,
    b_chain: Optional[jax.Array] = None,
    mats_b: Optional[jax.Array] = None,
    scale2: Optional[jax.Array] = None,
    interpret: bool = False,
    zp: bool = False,
) -> jax.Array:
    """DMA-stacked fused ConvT(k2,s2)+Conv3(k3)+bias+ReLU (chain->chain).

    Same contract as :func:`upconv_fused_chain` but with
    :func:`stack_upconv_matrices` weights ((2, 2, 3, 512, Cpo)); requires
    the operands' packed width to be a single 128-lane block.
    """
    dh2, rows, cpa = a_chain.shape
    dh = dh2 - 2
    wpad = rows // (hh + 2)
    assert wpad * (hh + 2) == rows and wpad % 8 == 0
    assert cpa == LANE, cpa
    cpo = mats_a.shape[-1]
    dual = b_chain is not None
    quant = scale2 is not None
    assert quant or not zp
    if quant:
        assert a_chain.dtype == jnp.int8 and mats_a.dtype == jnp.int8
        assert bias2.shape[0] == (4 if zp else 1), bias2.shape

    ht = _pick_h_tile_v3(hh, wpad, 2 if dual else 1, cpo, quant)
    n_h = hh // ht
    rout = ht * wpad
    dma_rows = rout + wpad + 8
    n_slab = dma_rows + 16

    kern = functools.partial(
        _upconv_kernel_v3, rout=rout, dma_rows=dma_rows, wp=wp, wpad=wpad,
        ht=ht, n_h=n_h, hh2=2 * hh, d2=2 * dh, dual=dual, quant=quant,
        zp=zp,
    )
    b_in = b_chain if dual else a_chain
    mb_in = mats_b if dual else mats_a
    ma_in = mats_a.reshape(12, 4 * LANE, cpo)
    mb_in = mb_in.reshape(12, 4 * LANE, mb_in.shape[-1])
    if not quant:
        ma_in = ma_in.astype(a_chain.dtype)
        mb_in = mb_in.astype(a_chain.dtype)
    s_in = scale2 if quant else jnp.ones((1, cpo), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(2 * dh, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (2 * dh + 2, (2 * hh + 2) * wpad, cpo), a_chain.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((n_slab, 4 * LANE), a_chain.dtype),
            pltpu.VMEM((n_slab, 4 * LANE), a_chain.dtype),
            pltpu.VMEM((2, rout, cpo), jnp.float32),
            pltpu.VMEM((2 * rout, cpo), a_chain.dtype),
            pltpu.VMEM((max(2 * rout, 2 * wpad), cpo), a_chain.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_chain, b_in, ma_in, mb_in, s_in, bias2)


def _pick_h_tile_v3(hh, wpad, n_ops, cpo, quant, vmem_budget=10 * 2**20):
    b_io = 1 if quant else 2
    for ht in sorted((t for t in range(1, min(hh, 16) + 1) if hh % t == 0),
                     reverse=True):
        rout = ht * wpad
        need = (
            2 * (rout + wpad + 17) * 4 * LANE * b_io   # stacked slabs
            + 2 * rout * cpo * 4
            + 4 * rout * cpo * b_io
            + 2 * 12 * 4 * LANE * cpo * b_io           # weight tensors
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no v3 upconv H tile fits: H={hh}, wpad={wpad}")


def pack_out_bias(bias: np.ndarray, pout: int) -> np.ndarray:
    cout_p = _round_up(pout * bias.shape[0], LANE)
    out = np.zeros((1, cout_p), np.float32)
    out[0, : pout * bias.shape[0]] = np.tile(
        np.asarray(bias, np.float32), pout
    )
    return out


def _upconv_kernel(a_hbm, b_hbm, ma_ref, mb_ref, s_ref, bias_ref, out_hbm,
                   slab_a, slab_b, acc, outbuf, zbuf, sem_a, sem_b,
                   sem_out, sem_z, *, rout, dma_rows, wp, wpad, ht, n_h,
                   hh2, d2, dual, quant, zp):
    """``zp``: zero-point int8 mode (stored q = a/s - 128; see
    conv3d._chain_kernel_ring_q). ``bias_ref`` is then (4, Cpo) — one row
    per output (z, y) parity pair, because the zero-point correction
    128*sum(M_float) runs over the composite taps REACHABLE at that
    parity (r = v - 2u has the parity of v), which differ between even
    and odd output planes/rows."""
    z = pl.program_id(0)   # out plane in [0, 2*Dh)
    h = pl.program_id(1)
    h0 = h * ht
    pin_plane = (z + 1) // 2  # ceil(z/2): first chain plane of the window
    fill = jnp.int8(-128) if zp else 0

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _init():
        slab_a[:, 0:8, :] = jnp.full_like(slab_a[:, 0:8, :], fill)
        if dual:
            slab_b[:, 0:8, :] = jnp.full_like(slab_b[:, 0:8, :], fill)
        zbuf[:] = jnp.full_like(zbuf, fill)

    cp_a = pltpu.make_async_copy(
        a_hbm.at[pl.ds(pin_plane, 2), pl.ds(h0 * wpad, dma_rows)],
        slab_a.at[:, pl.ds(8, dma_rows)], sem_a,
    )
    cp_a.start()
    if dual:
        cp_b = pltpu.make_async_copy(
            b_hbm.at[pl.ds(pin_plane, 2), pl.ds(h0 * wpad, dma_rows)],
            slab_b.at[:, pl.ds(8, dma_rows)], sem_b,
        )
        cp_b.start()

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
        _zero(0, h * 2 * rout, 2 * rout)

    @pl.when(jnp.logical_and(z == 0, h == 0))
    def _plane0_tail():
        _zero(0, hh2 * wpad, 2 * wpad)

    @pl.when(z == d2 - 1)
    def _planeD():
        _zero(d2 + 1, h * 2 * rout, 2 * rout)

    @pl.when(jnp.logical_and(z == d2 - 1, h == 0))
    def _planeD_tail():
        _zero(d2 + 1, hh2 * wpad, 2 * wpad)

    cp_a.wait()
    if dual:
        cp_b.wait()

    alpha = z % 2  # out-plane parity selects the weight set (traced)
    acc_dt = jnp.int32 if quant else jnp.float32
    col = jax.lax.broadcasted_iota(jnp.int32, (rout, 1), 0) % wpad
    for beta in range(2):
        acc0 = jnp.zeros((rout, acc.shape[-1]), acc_dt)
        for dz in range(2):
            for dy in range(2):
                for t in range(3):
                    off = (beta + dy) * wpad + (t - 1) + 8
                    tap = (dz * 2 + dy) * 3 + t
                    idx = (alpha * 2 + beta) * 12 + tap  # flat weight index
                    xa = slab_a[dz, pl.ds(off, rout), :]
                    acc0 = acc0 + jax.lax.dot_general(
                        xa, ma_ref[idx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_dt,
                    )
                    if dual:
                        xb = slab_b[dz, pl.ds(off, rout), :]
                        acc0 = acc0 + jax.lax.dot_general(
                            xb, mb_ref[idx],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=acc_dt,
                        )
        if quant and zp:
            b_row = bias_ref[pl.ds(alpha * 2 + beta, 1)]  # (1, Cpo)
            res = acc0.astype(jnp.float32) * s_ref[0][None, :]
            res = jnp.maximum(res + b_row, 0.0)
            res = jnp.round(jnp.minimum(res, 255.0)) - 128.0
            res = jnp.where(col < wp, res, -128.0)
        elif quant:
            res = acc0.astype(jnp.float32) * s_ref[0][None, :]
            res = jnp.maximum(res + bias_ref[0][None, :], 0.0)
            res = jnp.round(jnp.minimum(res, 127.0))
            res = jnp.where(col < wp, res, 0.0)
        else:
            res = jnp.maximum(acc0 + bias_ref[0][None, :], 0.0)
            res = jnp.where(col < wp, res, 0.0)
        acc[beta] = res
    # interleave (vl, beta, x') -> out rows (2vl+beta)*wpad + x'
    for vl in range(ht):
        outbuf[(2 * vl) * wpad: (2 * vl + 1) * wpad] = (
            acc[0, vl * wpad: (vl + 1) * wpad]
        ).astype(outbuf.dtype)
        outbuf[(2 * vl + 1) * wpad: (2 * vl + 2) * wpad] = (
            acc[1, vl * wpad: (vl + 1) * wpad]
        ).astype(outbuf.dtype)
    cp_o = pltpu.make_async_copy(
        outbuf,
        out_hbm.at[z + 1, pl.ds((1 + 2 * h0) * wpad, 2 * rout)],
        sem_out,
    )
    cp_o.start()
    cp_o.wait()


def upconv_fused_chain(
    a_chain: jax.Array,
    mats_a: jax.Array,
    bias2: jax.Array,
    hh: int,
    wp: int,
    b_chain: Optional[jax.Array] = None,
    mats_b: Optional[jax.Array] = None,
    scale2: Optional[jax.Array] = None,
    interpret: bool = False,
    zp: bool = False,
) -> jax.Array:
    """Fused ConvT(k2,s2)+Conv3(k3)+bias+ReLU, chain in -> chain out.

    :param a_chain: (Dh+2, (Hh+2)*wpad, Cpa) at pack ``pin`` (first
        operand, INCLUDING the ones channel carrying the convT bias).
    :param mats_a: (2, 2, 12, Cpa, Cpo) from :func:`build_upconv_matrices`.
    :param bias2: (1, Cpo) conv bias (BN-folded) tiled per packed
        position — or (4, Cpo) per-output-parity rows in ``zp`` mode.
    :param scale2: (1, Cpo) f32 — int8 serving path: operands/matrices are
        int8, MXU accumulates int32, and the output is requantized as
        ``round(clamp(relu(acc * scale2 + bias2), 0, 127))`` int8.
    :param zp: zero-point int8 mode (see conv3d.conv3d_chain_q): 255
        activation levels, borders filled with -128, and ``bias2`` rows
        carry the per-parity zero-point corrections. Requires ``scale2``.
    :returns: (2Dh+2, (2Hh+2)*wpad, Cpo) chain at pack ``2*pin``.
    """
    dh2, rows, cpa = a_chain.shape
    dh = dh2 - 2
    wpad = rows // (hh + 2)
    assert wpad * (hh + 2) == rows and wpad % 8 == 0
    cpo = mats_a.shape[-1]
    dual = b_chain is not None
    cpb = b_chain.shape[-1] if dual else cpa
    quant = scale2 is not None
    assert quant or not zp
    if quant:
        assert a_chain.dtype == jnp.int8 and mats_a.dtype == jnp.int8
        assert bias2.shape[0] == (4 if zp else 1), bias2.shape

    ht = _pick_h_tile(hh, wpad, cpa + (cpb if dual else 0), cpo)
    n_h = hh // ht
    rout = ht * wpad
    dma_rows = (ht + 2) * wpad
    n_slab = dma_rows + 16

    kern = functools.partial(
        _upconv_kernel, rout=rout, dma_rows=dma_rows, wp=wp, wpad=wpad,
        ht=ht, n_h=n_h, hh2=2 * hh, d2=2 * dh, dual=dual, quant=quant,
        zp=zp,
    )
    b_in = b_chain if dual else a_chain
    mb_in = mats_b if dual else mats_a
    mats_a = mats_a.reshape(48, mats_a.shape[-2], cpo)
    mb_in = mb_in.reshape(48, mb_in.shape[-2], mb_in.shape[-1])
    s_in = (
        scale2 if quant else jnp.ones((1, cpo), jnp.float32)
    )
    return pl.pallas_call(
        kern,
        grid=(2 * dh, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (2 * dh + 2, (2 * hh + 2) * wpad, cpo), a_chain.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_slab, cpa), a_chain.dtype),
            pltpu.VMEM((2, n_slab, cpb), a_chain.dtype),
            pltpu.VMEM((2, rout, cpo), jnp.float32),
            pltpu.VMEM((2 * rout, cpo), a_chain.dtype),
            pltpu.VMEM((max(2 * rout, 2 * wpad), cpo), a_chain.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_chain, b_in, mats_a if quant else mats_a.astype(a_chain.dtype),
      mb_in if quant else mb_in.astype(a_chain.dtype), s_in, bias2)


def _pick_h_tile(hh, wpad, cin_total, cpo, vmem_budget=10 * 2**20):
    for ht in sorted((t for t in range(1, min(hh, 16) + 1) if hh % t == 0),
                     reverse=True):
        rout = ht * wpad
        need = (
            2 * ((ht + 2) * wpad + 16) * cin_total * 2
            + 2 * rout * cpo * 4
            + 4 * rout * cpo * 2
            + 2 * 2 * 12 * 128 * cpo * 2  # weight tensors
        )
        if need <= vmem_budget:
            return ht
    raise ValueError(f"no upconv H tile fits: H={hh}, wpad={wpad}")
