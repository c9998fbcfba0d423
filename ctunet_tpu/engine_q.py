"""int8 quantized serving engine: the chained U-Net forward on the int8 MXU.

The v5e MXU runs int8 matmuls at 2x its bf16 rate (394 TOPS vs 197
TFLOP/s); the chained-flat engine is MXU-bound at full resolution
(BASELINE.md), so serving the whole U-Net body in int8 buys ~1.5x measured
per conv. This module builds that path with post-training quantization:

- **Calibration**: one eager bf16 forward over a representative volume via
  :func:`ctunet_tpu.engine.build_predict` (``jit=False``), with the
  ``halo_fn`` hook recording per-lane maxima of every produced chained
  tensor. Scales are per CHANNEL (lane maxima reduced over packed
  positions) — pooling max-combines packed positions of the same channel,
  so positions must share a scale for int8 max to be exact.
- **Symmetric per-channel quantization**: activations ``q = round(x / s)``
  with ``s = max_c / 127`` (post-ReLU activations are >= 0; the halo zeros
  map to int8 zero exactly). Weights fold the BN scale and the per-input-
  channel activation scale, then quantize per output channel with
  ``K = 127 / max|W_s|``; the kernels requantize in-epilogue as
  ``round(clamp(relu(acc * scale + bias), 0, 127))`` where
  ``scale = 1/(K * s_out)`` and ``bias = b_eff / s_out``.
- The ones-channel convention survives quantization for free: the ones
  channel records max 1 -> scale 1/127 -> q = 127 exactly, and the fused
  requant bias regenerates it every conv.
- The head dequantizes by folding the per-lane scales into its constant
  block-diagonal matrices (no dequantized tensor is materialized); sigmoid/
  softmax run in f32 as in the bf16 engine.

Scope: the generic UNet family on even-sized pool levels, including the
pack-exhausted tail of 5-block models (one standard-space int8 pool + a
decoder repack — same branch structure as the bf16 engine, so e.g.
UNetSPSmall at 224x512x512 serves fully int8). Anything else raises
ValueError; callers fall back to the bf16 engine. Reference behavior being
reproduced: the inference forward of ``ctunet/pytorch/models.py:226-261``
(quantization itself has no reference counterpart — the reference serves
f32 on CPU).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import engine
from .ops.pallas import conv3d as pc
from .ops.pallas import upconv as uc

_EPS = 1e-8
# Zero-point activation quantization: post-ReLU activations are >= 0, so
# the stored int8 value is q = a/s - 128 — all 255 levels of the s8 range
# instead of [0, 127] (one extra bit of resolution at identical kernel
# speed; the MXU consumes s8 either way). "Activation zero" is q = -128:
# every halo/pad fill is -128 (kernels' ``zp`` mode) and each consumer
# folds the exact correction 128 * sum_i(W_eff[i,o] * s_in[i]) into its
# requant bias. Weights stay symmetric [-127, 127].
_QMAX = 255.0
_Q1 = np.float32(1.0 / _QMAX)  # scale of an exact ones channel (q = 127)


def calibrate(
    model_class: str,
    variables: Dict[str, Any],
    calib_volume: jax.Array,
    interpret: bool = False,
    quantile: float = 1.0,
) -> List[np.ndarray]:
    """Run one eager bf16 engine forward, recording per-lane maxima of
    every produced chained tensor (in production order).

    :param calib_volume: (D, H, W, Cin) representative input (NOT batched),
        or (K, D, H, W, Cin): K samples whose per-lane maxima are combined
        elementwise (grid-sample calibration for patch serving — a single
        central patch clips border patches, ADVICE r2; pass a sample of
        grid patches instead).
    :param quantile: 1.0 (default) records plain maxima; < 1.0 records
        the per-lane |t| quantile instead (clipped calibration;
        out-of-range activations saturate at the requant clamp). MEASURED:
        on this model family clipping HURTS — a 10k-step checkpoint's
        flap-mask parity fell from 0.935 (max) to 0.894 (q=0.9995),
        because the largest activations carry real signal rather than
        being spurious outliers (BASELINE.md parity table). The knob
        stays for other weight regimes; default to max calibration.
        Chain tensors carry halo/pad zeros (~20% of rows) which only
        lower the quantile slightly.
    """
    calib_volume = jnp.asarray(calib_volume)
    if calib_volume.ndim == 5:
        combined: List[np.ndarray] = []
        for i in range(calib_volume.shape[0]):
            recs = calibrate(model_class, variables, calib_volume[i],
                             interpret=interpret, quantile=quantile)
            if not combined:
                combined = recs
            else:
                combined = [np.maximum(a, b)
                            for a, b in zip(combined, recs)]
        return combined
    records: List[np.ndarray] = []

    def rec(t):
        a = jnp.abs(t).astype(jnp.float32)
        mx = jnp.max(a, axis=(0, 1))
        if quantile >= 1.0:
            r = mx
        else:
            q = jnp.quantile(a.reshape(-1, a.shape[-1]), quantile, axis=0)
            # floor at max/64: a lane that is mostly zeros (sparse
            # activations) would otherwise collapse its quantile to ~0
            # and saturate every real value; 64x caps the clip at 6 bits
            # of range reduction
            r = jnp.maximum(q, mx / 64.0)
        records.append(np.asarray(r))
        return t

    fwd = engine.build_predict(
        model_class, variables, compute_dtype=jnp.bfloat16,
        interpret=interpret, halo_fn=rec, jit=False,
    )
    out = fwd(jnp.asarray(calib_volume))
    jax.block_until_ready(out)
    return records


def _chan_scales(rec: np.ndarray, pack: int, cstride: int) -> np.ndarray:
    """Per-channel scales from a per-lane max record: reduce the maxima over
    packed positions, then s = max/255 (zero-point activation range)."""
    lanes = rec[: pack * cstride].reshape(pack, cstride)
    mx = np.maximum(lanes.max(axis=0), _EPS)
    return (mx / _QMAX).astype(np.float32)


def _quant_conv(unit, s_in: np.ndarray, s_out: np.ndarray, pack: int,
                override: Optional[Dict[str, np.ndarray]] = None,
                split: bool = True):
    """int8 packed weights + requant scale/bias for one Conv+BN+ReLU unit.

    ``s_in``/``s_out`` are per-channel activation scales INCLUDING the ones
    channels (the unit is packed with ones_in=True, ones_out=True).

    Zero-point algebra: the input lanes hold q = a/s_in - 128, so the
    engine's pre-activation is ``(acc + 128*sum_i(q_w[i,o]))/k + b_eff``
    — the shift correction folds into the requant bias. It MUST be
    computed from the QUANTIZED weights ``q_w`` (not the float ``w_s``):
    with a float-weight correction the residual weight-rounding error is
    ``sum(delta * q)``, and since post-ReLU CT volumes are mostly
    zero-activation voxels sitting at q = -128, every empty voxel would
    inherit a constant per-channel offset -128*sum(delta) — measured as
    a flap-parity collapse (0.96 -> 0.83). With the q_w-based correction
    the shift is exact integer algebra and the rounding error stays
    proportional to the signal, exactly like the symmetric engine. The
    kernel then emits round(clamp(., 0, 255)) - 128."""
    w, scale, bias = unit._aug(True, True)  # (3,3,3,Cin+1,Cout+1), BN fold
    w_eff = w * scale[None, None, None, None, :]
    w_s = w_eff * s_in.astype(np.float32)[None, None, None, :, None]
    amax = np.abs(w_s).max(axis=(0, 1, 2, 3))
    k = np.where(amax > 0, 127.0 / np.maximum(amax, _EPS), 1.0)
    q_w = np.clip(np.round(w_s * k[None, None, None, None, :]), -127, 127)
    if override is not None:
        # AdaQuant (quant_opt.optimize_rounding): calibration-optimized
        # integer weights + float bias delta for the REAL channels. The
        # ones lanes keep their engine-computed values; the zero-point
        # correction below recomputes from the overridden q_w, so the
        # exact empty-voxel integer algebra is preserved.
        ci, co = override["q"].shape[3], override["q"].shape[4]
        q_w[..., :ci, :co] = override["q"]
        k[:co] = override["k"]
        bias = bias.copy()
        bias[:co] = bias[:co] + override["db"]
    corr = 128.0 * q_w.sum(axis=(0, 1, 2, 3)) / k  # exact zp correction
    scale_ref = (1.0 / (k * s_out)).astype(np.float32)
    bias_ref = ((bias + corr) / s_out).astype(np.float32)
    ps = jnp.asarray(pc.pack_bias(scale_ref, pack))
    pb = jnp.asarray(pc.pack_bias(bias_ref, pack))
    if split:
        # split-tap form (9 main + 3 correction dots; see
        # pc.pack_weights_split) — bit-identical int8 algebra, ~2x fewer
        # MXU tile-rows per conv. The zp correction above sums the RAW
        # quantized taps, so it is packing-invariant.
        wm, wc = pc.pack_weights_split(q_w, pack)
        return (jnp.asarray(wm.astype(np.int8)),
                jnp.asarray(wc.astype(np.int8)), ps, pb)
    pw8 = jnp.asarray(pc.pack_weights(q_w, pack).astype(np.int8))
    return pw8, ps, pb


def _quant_upconv(up_raw, unit0, ca: Optional[int], s_a: np.ndarray,
                  s_b: Optional[np.ndarray], s_out: np.ndarray, pa: int,
                  override: Optional[Dict[str, np.ndarray]] = None,
                  split: bool = True):
    """int8 composite upsample+conv matrices (mirrors
    ``engine._get_upconv_mats`` with quantization).

    :param ca: real channels of operand a (None = single-operand level 0).
    :param s_a: per-channel scales of operand a INCLUDING its ones channel.
    :param s_b: scales of operand b including its ones channel, or None.
    :param s_out: per-channel scales of the output (incl. ones).
    """
    kk, bb = up_raw
    kT_aug, ci_split = uc.augment_upconv_kernel(kk, bb, ca)
    s_in = s_a if ca is None else np.concatenate([s_a, s_b])
    w0a, s0a, b0a = unit0._aug(False, True)
    r = uc.composite_response(kT_aug, w0a, s0a)
    r_s = r * s_in.astype(np.float32)[None, None, None, :, None]
    amax = np.abs(r_s).max(axis=(0, 1, 2, 3))
    k = np.where(amax > 0, 127.0 / np.maximum(amax, _EPS), 1.0)
    r_q = np.clip(np.round(r_s * k[None, None, None, None, :]), -127, 127)
    b0a = b0a.copy()
    if override is not None:
        # AdaQuant composite override (quant_opt): optimized integers +
        # bias delta for the REAL output channels; the ones-regen column
        # keeps its engine-computed values. The parity zero-point bias
        # below recomputes from the overridden integers (exact algebra).
        co = override["q"].shape[-1]
        r_q[..., :co] = override["q"]
        k[:co] = override["k"]
        b0a[:co] = b0a[:co] + override["db"]
    scale_ref = (1.0 / (k * s_out)).astype(np.float32)
    # Zero-point correction per OUTPUT PARITY: input lanes hold
    # q = a/s_in - 128, so each output voxel owes 128 * sum(M_q)/k over
    # the composite taps its (z, y) parity reaches (r = v - 2u keeps the
    # parity of v, so even/odd output planes see disjoint halves of R).
    # The column sums MUST come from the QUANTIZED matrices (see
    # _quant_conv: a float-matrix correction leaves every zero-activation
    # voxel with a -128*sum(delta) offset). In requant units the
    # correction is 128 * colsum(M_q) * scale_ref, folded into a
    # (4, Cpo) bias — the kernel selects the row by output parity.
    # Packing is a rearrangement of the same quantized taps, so the
    # colsum is identical between the full and split forms per parity.
    if split:
        sa, sb = uc.build_upconv_matrices_split(r_q, pa, ci_split)
        colsum_q = sa[0].sum(axis=(2, 3)) + sa[1].sum(axis=(2, 3))
        if sb is not None:
            colsum_q = (colsum_q + sb[0].sum(axis=(2, 3))
                        + sb[1].sum(axis=(2, 3)))
    else:
        ma, mb = uc.build_upconv_matrices(r_q, pa, ci_split)
        colsum_q = ma.sum(axis=(2, 3))  # (2, 2, Cpo), integer-valued
        if mb is not None:
            colsum_q = colsum_q + mb.sum(axis=(2, 3))
    scale_lane = uc.pack_out_bias(scale_ref, 2 * pa)[0]
    base = uc.pack_out_bias((b0a / s_out).astype(np.float32), 2 * pa)[0]
    bias4 = np.stack([
        (base + 128.0 * colsum_q[a, b] * scale_lane).astype(np.float32)
        for a in range(2) for b in range(2)
    ])
    s2 = jnp.asarray(uc.pack_out_bias(scale_ref, 2 * pa))
    b4 = jnp.asarray(bias4)
    if split:
        cin_aug = kT_aug.shape[-1]
        cw_a = cin_aug if ci_split is None else ci_split
        cw_b = 0 if ci_split is None else cin_aug - ci_split
        return (
            (jnp.asarray(sa[0].astype(np.int8)),
             jnp.asarray(sa[1].astype(np.int8))),
            None if sb is None else
            (jnp.asarray(sb[0].astype(np.int8)),
             jnp.asarray(sb[1].astype(np.int8))),
            s2, b4, cw_a, cw_b,
        )
    return (
        jnp.asarray(ma.astype(np.int8)),
        None if mb is None else jnp.asarray(mb.astype(np.int8)),
        s2, b4,
    )


def build_predict_q(
    model_class: str,
    variables: Dict[str, Any],
    calib_volume: jax.Array,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    jit: bool = True,
    calib_quantile: float = 1.0,
    bf16_tail: int = 0,
    bf16_head: float = 0,
    round_opt: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
    export_scales: Optional[Dict[str, Any]] = None,
    import_scales: Optional[Dict[str, Any]] = None,
    sparse: int = 0,
    split_taps: bool = True,
):
    """Build a jitted int8 ``predict(images)`` for (B, D, H, W, C) inputs.

    Calibrates on ``calib_volume`` ((D, H, W, C), same shape as serving
    inputs), then quantizes every chained kernel. Raises ``ValueError``
    when the graph leaves the fully-chainable regime (odd level sizes or
    exhausted packs) — callers fall back to ``engine.build_predict``.
    ``calib_quantile < 1`` switches to clipped (quantile) calibration —
    see :func:`calibrate`.

    ``bf16_tail``: number of FINAL decoder blocks (upconv + second unit)
    served in bf16 inside the otherwise-int8 chain — the
    mixed-precision tail. PTQ's mask-parity loss concentrates in the
    full-resolution decode layers that place the sliver-thin flap
    boundary; dequantizing the chain once (one per-lane multiply —
    int8 lanes are exact in bf16) and running the last block(s) with
    the bf16 engine's fused kernels recovers it while the encoder and
    deep decoder keep the int8 MXU rate. 0 = fully int8 (fastest);
    ``n_blocks`` = int8 encoder + bf16 decoder. A ``.5`` fraction adds
    a HALF block: that block's fused upsample+conv (its expensive full
    -res matmuls) stays int8 and only its second unit + head go bf16.

    ``bf16_head``: number of LEADING encoder blocks served in bf16 — the
    mixed-precision head. The per-unit sensitivity sweep
    (tools/int8_sensitivity.py, BASELINE.md) shows the residual PTQ
    parity loss concentrates in the FIRST encoder block's activation
    quantization (its post-ReLU outputs have the widest dynamic range
    relative to the flap-boundary signal), which no decoder-side
    precision split can recover. The head serves those units with the
    bf16 engine's fused kernels and quantizes the chain ONCE at the
    switch (one per-lane affine + round; bf16 halo zeros land exactly on
    the zero-point -128, the ones lane on +127). ``.5`` fractions switch
    mid-block (e.g. 0.5 = only d0.0 bf16). A block-i bf16 skip is
    quantized at its consumption site when the consuming decoder upconv
    is int8, but reaches the final 1x1 head UNQUANTIZED — the skip's
    head contribution is where the sliver-thin flap boundary is decided.

    ``round_opt``: per-unit AdaQuant weight overrides from
    :func:`ctunet_tpu.quant_opt.optimize_rounding` — calibration-
    optimized integer weights replacing round-to-nearest, for the plain
    conv units (tags ``d{i}.{j}``/``u{idx}.1``) and the fused
    upsample+conv composite responses (``u{idx}.0``).

    ``export_scales``: pass a dict to have the build fill it with the
    calibrated per-channel activation scales (``{"entry": s, tag:
    (s_in, s_out), ...}``, ones lanes included) — the optimizer consumes
    these so its folding matches this build bit-for-bit.

    ``import_scales``: the inverse — a dict in the exact ``export_scales``
    format supplying every tag's activation scales, skipping the
    calibration forward entirely. Use it to rebuild with externally
    refined scales (``quant_opt.optimize_rounding(learn_scales=True)``)
    or to reuse a previous build's calibration (per-channel scales are
    content-, not shape-, dependent).
    """
    cfg = engine.ENGINE_CONFIGS[model_class]
    if cfg["family"] != "generic":
        raise ValueError("int8 engine supports the generic UNet family only")
    # split-tap kernels (the default) have no constant-region short-circuit
    # variant; the sparse experiment rides the full 27-tap form
    use_split = split_taps and not sparse
    n_blocks = cfg["n_blocks"]
    tail_f = max(0.0, min(float(bf16_tail), float(n_blocks)))
    full_tail = int(tail_f)
    half_tail = (tail_f - full_tail) >= 0.5 and full_tail < n_blocks
    switch = n_blocks - full_tail  # first decoder idx fully bf16
    # with half_tail, block (switch-1) runs its upconv int8 and its
    # second unit bf16 (dequant happens between them)
    # bf16 head: number of leading encoder UNITS served bf16 (2 per
    # block; .5 fractions switch after the block's first unit)
    head_units = int(round(max(0.0, min(float(bf16_head),
                                        float(n_blocks))) * 2))
    head = cfg["head"]
    params = variables["params"]["unet"]
    stats = variables["batch_stats"]["unet"]

    d_units = [
        [engine._FusedUnit(params[f"d{i}"][f"unit{j}"],
                           stats[f"d{i}"][f"unit{j}"], interpret,
                           sparse=sparse)
         for j in range(2)]
        for i in range(n_blocks)
    ]
    u_units = [
        [engine._FusedUnit(params[f"u{i}"][f"unit{j}"],
                           stats[f"u{i}"][f"unit{j}"], interpret,
                           sparse=sparse)
         for j in range(2)]
        for i in range(n_blocks)
    ]
    up_raw = [
        (engine._np(params[f"u{i}"]["upconv"]["kernel"]),
         engine._np(params[f"u{i}"]["upconv"]["bias"]))
        for i in range(n_blocks)
    ]
    lc_k = engine._np(params["last_conv"]["kernel"])[0, 0, 0]  # (Ca+Cb, O)
    lc_b = engine._np(params["last_conv"]["bias"])

    # (K, D, H, W, C) = grid-sample calibration: K samples, maxima
    # combined in ``calibrate`` (all samples share the serving shape)
    d, hh0, ww, cin0 = (int(s) for s in calib_volume.shape[-4:])

    # ---- static plan: packs/shapes per step (raises if unsupported) -----
    # Mirrors the bf16 engine's branch structure: chain pooling while the
    # pack allows (p >= 2), ONE standard-space pool per pack exhaustion
    # (p == 1, wp halves), and a decoder repack that re-aligns the pack
    # ladder with the skips (5-block models, e.g. UNetSPSmall at 512).
    p0 = pc.choose_pack(ww, cin0 + 1)
    plan_enc = []  # per level: (pack, H, wp, pool kind)
    dd, dh, p, wp = d, hh0, p0, ww // p0
    for i in range(n_blocks):
        if not (dd % 2 == 0 and dh % 2 == 0):
            raise ValueError(
                f"int8 engine needs chainable pooling at level {i} "
                f"(D={dd}, H={dh}); falling back to bf16"
            )
        if p >= 2:
            plan_enc.append((p, dh, wp, "chain"))
            p //= 2
        elif wp % 2 == 0:
            plan_enc.append((p, dh, wp, "std"))
            wp //= 2
        else:
            raise ValueError(
                f"int8 engine needs chainable pooling at level {i} "
                f"(pack={p}, wp={wp}); falling back to bf16"
            )
        dd, dh = dd // 2, dh // 2

    # decoder plan: (repack target (pack, wp) or None, pack at upconv)
    plan_dec = []
    pa, dh_dec, wp_dec = p, dh, wp
    for idx in range(n_blocks):
        i = n_blocks - 1 - idx
        repack_to = None
        if idx > 0:
            bp, bdh, bwp = plan_enc[i + 1][:3]
            if (bp, bwp) != (pa, wp_dec):
                if bdh == dh_dec and bp * bwp == pa * wp_dec:
                    repack_to = (bp, bwp)
                    pa, wp_dec = bp, bwp
                else:
                    raise ValueError(
                        f"int8 engine: decoder/skip layout mismatch at "
                        f"idx {idx}; falling back to bf16"
                    )
        plan_dec.append((repack_to, pa))
        pa *= 2
        dh_dec *= 2

    # ---- calibration ----------------------------------------------------
    records = None
    if import_scales is None:
        records = calibrate(
            model_class, variables, calib_volume, interpret,
            quantile=calib_quantile,
        )
    cursor = {"i": 0}

    def next_rec() -> np.ndarray:
        rec = records[cursor["i"]]
        cursor["i"] += 1
        return rec

    def tag_scales(tag: str, pack: int, c: int) -> np.ndarray:
        """Per-channel output scales (incl. ones lane) for one produced
        tensor: from the calibration record stream, or the caller's
        ``import_scales`` (export format; tuples carry (s_in, s_out))."""
        if records is None:
            v = import_scales[tag]
            s = np.array(v[1] if isinstance(v, tuple) else v, np.float32)
            assert s.shape == (c,), (tag, s.shape, c)
            return s
        return _chan_scales(next_rec(), pack, c)

    # entry scales: data channels calibrated from the input itself
    if records is None:
        s_entry = np.array(import_scales["entry"], np.float32)
        assert s_entry.shape == (cin0 + 1,)
    else:
        s_entry = np.concatenate(
            [_chan_scales(next_rec(), p0, cin0 + 1)[:cin0], [_Q1]]
        ).astype(np.float32)

    # encoder: quantize convs, track per-channel scales through pools.
    # Units t < head_units run bf16 (no quantized weights needed); their
    # per-unit output scales are kept for the bf16->int8 switch affine.
    enc_q = []
    enc_s = []  # per block: (s_u0, s_u1) output scales incl. ones
    skips_s = []
    s_cur = s_entry
    ropt = round_opt or {}
    if export_scales is not None:
        export_scales["entry"] = s_entry
    for i in range(n_blocks):
        p = plan_enc[i][0]
        c0 = d_units[i][0].cout + 1
        s_u0 = tag_scales(f"d{i}.0", p, c0)
        s_u0[-1] = _Q1
        q0 = (None if 2 * i < head_units
              else _quant_conv(d_units[i][0], s_cur, s_u0, p,
                               ropt.get(f"d{i}.0"), split=use_split))
        c1 = d_units[i][1].cout + 1
        s_u1 = tag_scales(f"d{i}.1", p, c1)
        s_u1[-1] = _Q1
        q1 = (None if 2 * i + 1 < head_units
              else _quant_conv(d_units[i][1], s_u0, s_u1, p,
                               ropt.get(f"d{i}.1"), split=use_split))
        if export_scales is not None:
            export_scales[f"d{i}.0"] = (s_cur, s_u0)
            export_scales[f"d{i}.1"] = (s_u0, s_u1)
        enc_q.append((q0, q1))
        enc_s.append((s_u0, s_u1))
        skips_s.append(s_u1)
        if records is not None:
            next_rec()  # pool output: scales unchanged
        s_cur = s_u1

    # decoder: fused upsample+conv then second unit; per-channel scales
    # are invariant to repacks (packed positions of a channel share one
    # scale by construction), so only the pack bookkeeping follows plan_dec
    dec_q = []
    s_a_list = []  # channel scales of a_chain ENTERING each decoder idx
    s_up_list = []  # scales of each upconv+unit0 OUTPUT (half-tail dequant)
    s_a = s_cur  # bottleneck = pooled d{n-1}.unit1
    for idx in range(n_blocks):
        i = n_blocks - 1 - idx
        s_a_list.append(s_a)
        pa = plan_dec[idx][1]
        ca = None if idx == 0 else u_units[idx - 1][1].cout
        s_b = None if idx == 0 else skips_s[i + 1]
        c_up = u_units[idx][0].cout + 1
        s_up = tag_scales(f"u{idx}.0", 2 * pa, c_up)
        s_up[-1] = _Q1
        s_up_list.append(s_up)
        c1 = u_units[idx][1].cout + 1
        s_u1 = tag_scales(f"u{idx}.1", 2 * pa, c1)
        s_u1[-1] = _Q1
        if export_scales is not None:
            export_scales[f"u{idx}.0"] = s_up
            export_scales[f"u{idx}.1"] = (s_up, s_u1)
        if idx < switch:
            qu = _quant_upconv(
                up_raw[idx], u_units[idx][0], ca, s_a, s_b, s_up, pa,
                ropt.get(f"u{idx}.0"), split=use_split,
            )
            if half_tail and idx == switch - 1:
                q1 = None  # half tail: unit1 served bf16
            else:
                q1 = _quant_conv(u_units[idx][1], s_up, s_u1, 2 * pa,
                                 ropt.get(f"u{idx}.1"), split=use_split)
            dec_q.append((qu, q1))
        else:
            dec_q.append(None)  # served bf16 (mixed-precision tail)
        s_a = s_u1
    if records is not None:
        assert cursor["i"] == len(records), (cursor["i"], len(records))

    # ---- bf16 tail assets: the bf16 engine's fused upconv matrices for
    # the tail blocks (identical math to engine._get_upconv_mats; split-
    # tap form, matching the bf16 engine's default)
    bf16_up: Dict[int, Any] = {}
    for idx in range(switch, n_blocks):
        kk, bb = up_raw[idx]
        ca = None if idx == 0 else u_units[idx - 1][1].cout
        kT_aug, ci_split = uc.augment_upconv_kernel(kk, bb, ca)
        w0a, s0a, b0a = u_units[idx][0]._aug(False, True)
        r = uc.composite_response(kT_aug, w0a, s0a)
        sa, sb = uc.build_upconv_matrices_split(
            r, plan_dec[idx][1], ci_split
        )
        cin_aug = kT_aug.shape[-1]
        bf16_up[idx] = (
            (jnp.asarray(sa[0]), jnp.asarray(sa[1])),
            None if sb is None else (jnp.asarray(sb[0]),
                                     jnp.asarray(sb[1])),
            jnp.asarray(uc.pack_out_bias(b0a, 2 * plan_dec[idx][1])),
            cin_aug if ci_split is None else ci_split,
            0 if ci_split is None else cin_aug - ci_split,
        )

    def _dequant_vec(s_chan: np.ndarray, pack: int, cp: int):
        """Per-lane dequant AFFINE (v, off) for a zero-point chained int8
        tensor: a = q*v + off with off = 128*v. Real lanes recover
        a = (q+128)*s; halo positions (q = -128) dequant to exactly 0 as
        the bf16 kernels require; pad lanes get v = off = 0."""
        v = np.pad(np.tile(s_chan.astype(np.float32), pack),
                   (0, cp - pack * s_chan.size))
        return jnp.asarray(v), jnp.asarray(128.0 * v)

    def _quant_vec(s_chan: np.ndarray, pack: int, cp: int):
        """Per-lane INVERSE scales for the bf16->int8 switch (the exact
        inverse of :func:`_dequant_vec`): q = round(clip(x*inv, 0, 255))
        - 128. bf16 halo zeros land on the zero point -128 exactly, the
        ones lane (s = 1/255) on +127 exactly; pad lanes get inv = 0 ->
        q = -128 (the int8 chain's fill)."""
        inv = np.pad(
            np.tile((1.0 / s_chan).astype(np.float32), pack),
            (0, cp - pack * s_chan.size),
        )
        return jnp.asarray(inv)

    def _to_int8(xc: jax.Array, inv: jax.Array) -> jax.Array:
        return (
            jnp.round(jnp.clip(xc.astype(jnp.float32) * inv, 0.0, 255.0))
            - 128.0
        ).astype(jnp.int8)

    # ---- head: fold dequant scales into the block-diag matrices ---------
    ca_f = u_units[-1][1].cout
    cb_f = d_units[0][1].cout
    pf = plan_enc[0][0]
    s_lane_a = np.tile(s_a, pf)
    s_lane_b = np.tile(skips_s[0], pf)
    eye = np.eye(pf, dtype=np.float32)
    zrow = np.zeros((1, lc_k.shape[1]), np.float32)
    m_a = np.kron(eye, np.concatenate([lc_k[:ca_f], zrow]))
    m_b = np.kron(eye, np.concatenate([lc_k[ca_f: ca_f + cb_f], zrow]))
    bias3 = np.tile(lc_b, pf)
    if tail_f == 0:
        # fully-int8 chain: fold the dequant scales of BOTH head operands
        # and their zero-point corrections (a = (q+128)*s, so each int8
        # operand owes 128 * colsum(s*m) to the head bias)
        m_a = m_a * s_lane_a[:, None]
        bias3 = bias3 + 128.0 * m_a.sum(axis=0)
    if head_units < 2:
        # the b operand (encoder level-0 skip) is int8: fold its dequant.
        # With a bf16 head covering block 0 the skip reaches the final
        # 1x1 UNQUANTIZED (the flap boundary's most direct input).
        m_b = m_b * s_lane_b[:, None]
        bias3 = bias3 + 128.0 * m_b.sum(axis=0)
    m_full = np.kron(eye, np.asarray(
        [[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]], np.float32))
    m_flap = np.kron(eye, np.asarray(
        [[0.0, 0.0], [-1.0, 1.0], [0.0, 0.0]], np.float32))
    b_flap = np.tile(np.asarray([1.0, 0.0], np.float32), pf)
    head_c = tuple(
        jnp.asarray(m) for m in (m_a, m_b, bias3, m_full, m_flap, b_flap)
    )

    inv_s_entry = jnp.asarray(
        np.concatenate([1.0 / s_entry[:cin0], [0.0]]).astype(np.float32)
    )

    def _head_q(apk, bpk, hh: int, ww_out: int):
        m_a, m_b, bias3, m_full, m_flap, b_flap = head_c
        dt = jnp.float32
        lc = (
            apk.astype(dt) @ m_a.astype(dt)
            + bpk.astype(dt) @ m_b.astype(dt)
            + bias3.astype(dt)
        )
        out = jax.nn.sigmoid(lc)
        if head is None:
            d_, h_, wp_ = out.shape[:3]
            return out.astype(compute_dtype).reshape(d_, h_, ww_out, 3)
        full = out @ m_full
        fl = out @ m_flap + b_flap
        d_, h_, wp_ = full.shape[:3]
        full = full.reshape(d_, h_, ww_out, 2)
        fl = fl.reshape(d_, h_, ww_out, 2)
        if head == "double_softmax":
            return jax.nn.softmax(full, -1), jax.nn.softmax(fl, -1)
        return full.astype(compute_dtype), fl.astype(compute_dtype)

    def forward_one(x: jax.Array):
        dd_, hh, ww_, _ = x.shape
        p = p0
        if head_units > 0:
            # bf16 head entry (the bf16 engine's): append the ones
            # channel, chain with zero halos
            xb = x.astype(compute_dtype)
            xb = jnp.concatenate([xb, jnp.ones_like(xb[..., :1])], -1)
            xc = pc.to_chain(
                xb.reshape(dd_, hh, ww_ // p, p * (cin0 + 1)), p
            )
        else:
            # quantize the input with the zero-point convention
            # q = a/s - 128 (binary skull/atlas channels quantize
            # exactly: 0 -> -128, 1 -> 127); the appended ones channel
            # is the constant q=127 lane
            q = jnp.round(
                jnp.clip(x.astype(jnp.float32) * inv_s_entry[:cin0], 0, 255)
            ) - 128.0
            q = jnp.concatenate(
                [q, jnp.full_like(q[..., :1], 127.0)], -1
            ).astype(jnp.int8)
            xc = pc.to_chain(
                q.reshape(dd_, hh, ww_ // p, p * (cin0 + 1)), p, fill=-128
            )
        dh_, dwp = hh, ww_ // p
        skips = []
        t = 0  # encoder unit counter (bf16 head -> int8 switch)
        for i in range(n_blocks):
            for j in (0, 1):
                if t < head_units:
                    xc = d_units[i][j].call_chain(
                        xc, p, dh_, dwp, ones_in=True, ones_out=True
                    )
                elif use_split:
                    wm, wc, ps, pb = enc_q[i][j]
                    xc = pc.conv3d_chain_split(
                        xc, wm, wc, pb, dh_, dwp, p,
                        d_units[i][j].cin + 1, scale=ps, zp=True,
                        interpret=interpret,
                    )
                else:
                    pw, ps, pb = enc_q[i][j]
                    xc = pc.conv3d_chain_q(xc, pw, ps, pb, dh_, dwp,
                                           interpret=interpret, zp=True,
                                           sparse_gh=sparse)
                t += 1
                if t == head_units and j == 0:
                    # mid-block bf16 -> int8 switch: one per-lane affine
                    xc = _to_int8(
                        xc, _quant_vec(enc_s[i][j], p, xc.shape[-1])
                    )
            cout = d_units[i][1].cout
            skips.append((xc, p, cout, dh_, dwp))
            if t == head_units and head_units == 2 * (i + 1):
                # block-boundary switch: the block's SKIP stays bf16
                # (stored above); only the pooled main path quantizes.
                # Quantize before the pool — int8 max pooling of the
                # quantized tensor equals quantizing the bf16 pool
                # exactly (max is monotonic, scales are per-channel).
                xc = _to_int8(
                    xc, _quant_vec(enc_s[i][1], p, xc.shape[-1])
                )
            is_q = xc.dtype == jnp.int8
            if plan_enc[i][3] == "chain":
                xc = pc.maxpool2_chain(
                    xc, dh_, dwp, p, cout + 1, interpret=interpret,
                    fill=-128 if is_q else 0,
                )
                p //= 2
            else:
                # pack exhausted: pool in standard space. int8 max is
                # exact under per-channel symmetric quantization (max is
                # monotonic and packed positions share channel scales).
                xp = pc.from_chain(xc, dh_, dwp, p * (cout + 1))
                d2, h2, w2 = (s // 2 for s in xp.shape[:3])
                xp = xp.reshape(
                    d2, 2, h2, 2, w2, 2, xp.shape[3]
                ).max((1, 3, 5))
                dwp //= 2
                xc = pc.to_chain(xp, p, fill=-128 if is_q else 0)
            dh_ //= 2
        a_chain, ap = xc, p
        b = None
        b_scale = None
        for idx in range(n_blocks):
            i = n_blocks - 1 - idx
            repack_to, _pa = plan_dec[idx]
            if idx == switch:
                # mixed-precision tail: dequantize the chain ONCE (one
                # per-lane affine; int8 values are exact in bf16, the
                # ones lanes dequant to exactly 1, zero-point halos to
                # exactly 0) and serve the rest with the bf16 engine's
                # fused kernels
                v, off = _dequant_vec(s_a_list[idx], ap, a_chain.shape[-1])
                a_chain = (
                    a_chain.astype(jnp.float32) * v + off
                ).astype(compute_dtype)
            if repack_to is not None:
                a_chain = pc.repack_chain(
                    a_chain, dh_, dwp, ap,
                    u_units[idx - 1][1].cout + 1, repack_to[0],
                    fill=-128 if a_chain.dtype == jnp.int8 else 0,
                )
                ap, dwp = repack_to
            if idx < switch:
                qu, q1 = dec_q[idx]
                b_c = None if b is None else b[0]
                if b_c is not None and b_c.dtype != jnp.int8:
                    # bf16-head skip feeding an int8 upconv: quantize at
                    # the consumption site (its head-path copy stays bf16)
                    b_c = _to_int8(
                        b_c, _quant_vec(b_scale, b[1], b_c.shape[-1])
                    )
                if use_split:
                    sa, sb, s2, b2, cw_a, cw_b = qu
                    a_chain = uc.upconv_fused_chain_split(
                        a_chain, sa, b2, dh_, dwp, plan_dec[idx][1], cw_a,
                        b_chain=b_c, split_b=sb, cw_b=cw_b, scale2=s2,
                        interpret=interpret, zp=True,
                    )
                else:
                    ma, mb, s2, b2 = qu
                    a_chain = uc.upconv_fused_chain(
                        a_chain, ma, b2, dh_, dwp,
                        b_chain=b_c,
                        mats_b=mb, scale2=s2, interpret=interpret, zp=True,
                    )
                ap *= 2
                dh_ *= 2
                if q1 is not None and use_split:
                    wm1, wc1, ps1, pb1 = q1
                    a_chain = pc.conv3d_chain_split(
                        a_chain, wm1, wc1, pb1, dh_, dwp, ap,
                        u_units[idx][1].cin + 1, scale=ps1, zp=True,
                        interpret=interpret,
                    )
                elif q1 is not None:
                    pw1, ps1, pb1 = q1
                    a_chain = pc.conv3d_chain_q(
                        a_chain, pw1, ps1, pb1, dh_, dwp,
                        interpret=interpret, zp=True, sparse_gh=sparse,
                    )
                else:
                    # HALF tail: dequant the int8 upconv output and run
                    # the block's second unit with the bf16 kernel
                    v, off = _dequant_vec(
                        s_up_list[idx], ap, a_chain.shape[-1]
                    )
                    a_chain = (
                        a_chain.astype(jnp.float32) * v + off
                    ).astype(compute_dtype)
                    a_chain = u_units[idx][1].call_chain(
                        a_chain, ap, dh_, dwp, ones_in=True,
                        ones_out=True,
                    )
            else:
                sa, sb, pbias2, cw_a, cw_b = bf16_up[idx]
                b_c = None
                if b is not None and b[0].dtype != jnp.int8:
                    b_c = b[0]  # bf16-head skip: already float
                elif b is not None:
                    bv, boff = _dequant_vec(b_scale, b[1], b[0].shape[-1])
                    b_c = (
                        b[0].astype(jnp.float32) * bv + boff
                    ).astype(compute_dtype)
                a_chain = uc.upconv_fused_chain_split(
                    a_chain, sa, pbias2, dh_, dwp, plan_dec[idx][1], cw_a,
                    b_chain=b_c, split_b=sb, cw_b=cw_b,
                    interpret=interpret,
                )
                ap *= 2
                dh_ *= 2
                a_chain = u_units[idx][1].call_chain(
                    a_chain, ap, dh_, dwp, ones_in=True, ones_out=True
                )
            b = skips[i]
            b_scale = skips_s[i]
        apk = pc.from_chain(
            a_chain, dh_, dwp, ap * (u_units[-1][1].cout + 1)
        )
        bpk = pc.from_chain(b[0], b[3], b[4], b[1] * (b[2] + 1))
        return _head_q(apk, bpk, dh_, dwp * ap)

    if not jit:
        return forward_one

    @jax.jit
    def predict(images: jax.Array):
        return engine._batch_unrolled(forward_one, images)

    return predict


def build_predict_q_opt(
    model_class: str,
    variables: Dict[str, Any],
    calib_volume: jax.Array,
    adaquant_steps: int = 250,
    adaquant_lr: float = 0.03,
    calib_batch: Optional[np.ndarray] = None,
    verbose: bool = False,
    learn_scales: bool = False,
    **kw,
):
    """:func:`build_predict_q` with AdaQuant rounding optimization.

    Builds once to export the calibrated activation scales, runs
    :func:`ctunet_tpu.quant_opt.optimize_rounding` on the calibration
    volume(s) (~a minute on a TPU chip at 128-res; proportional at other
    sizes), then builds the served engine with the optimized integer
    weights. ``calib_batch`` (N, D, H, W, C) defaults to the single
    calibration volume. ``learn_scales`` additionally refines the
    activation scales (LSQ-style) and rebuilds with ``import_scales``.
    """
    from . import quant_opt

    scales: Dict[str, Any] = {}
    build_predict_q(
        model_class, variables, calib_volume,
        export_scales=scales, jit=False, **kw
    )
    cb = (
        np.asarray(calib_batch, np.float32)
        if calib_batch is not None
        else np.asarray(calib_volume, np.float32)
    )
    if cb.ndim == 4:  # single volume -> batch of one
        cb = cb[None]
    refined: Dict[str, Any] = {}
    ropt = quant_opt.optimize_rounding(
        model_class, variables, cb, scales,
        steps=adaquant_steps, lr=adaquant_lr, verbose=verbose,
        learn_scales=learn_scales, out_scales=refined,
        bf16_head=float(kw.get("bf16_head") or 0),
    )
    return build_predict_q(
        model_class, variables, calib_volume, round_opt=ropt,
        import_scales=refined, **kw
    )
