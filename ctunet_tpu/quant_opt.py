"""AdaQuant: calibration-time weight-rounding optimization for the int8
serving engine.

Post-training quantization rounds each folded conv weight to its nearest
point on the per-output-channel int8 grid. On trained checkpoints that
round-to-nearest (RTN) choice is measurably NOT optimal for mask parity:
the per-unit sensitivity sweep (tools/int8_sensitivity.py) shows flap
Dice capped at ~0.991 by weight rounding ALONE (activations served in
float), and the engine's all-int8 parity lands at ~0.984.

This module implements sequential AdaQuant (the "Improving Post Training
Neural Quantization" / AdaQuant lineage, Hubara et al. 2020,
arXiv:2006.10518): unit by unit, in forward order, optimize the INTEGER
weights and the float requant bias of each Conv+BN+ReLU unit to minimize
the unit-output MSE against the float forward — evaluated on the
activations the quantized network ACTUALLY produces (so each unit also
compensates the accumulated quantization error of its predecessors).
Optimization runs on the straight-through-estimator rounding of a
continuous proxy, on one or a few calibration volumes, ~a minute on a
TPU chip for the UNetSP family at 128-res.

The output is a per-unit override dict consumed by
``engine_q.build_predict_q(round_opt=...)``:

- ``q``: (3,3,3,Cin,Cout) integer weights on the SAME grid RTN used
  (``k = 127/max|w_eff * s_in|`` per output channel, recomputed here
  from the engine-exported scales so the grids match bit-for-bit),
- ``k``: that per-channel grid scale,
- ``db``: float bias delta (the engine's requant bias is float, so the
  correction is exactly representable).

The engine's zero-point algebra is untouched: the exact empty-voxel
integer correction is recomputed from the overridden integers, so
all-zero regions still produce exactly zero (the property whose loss
collapsed parity in the float-correction experiment, BASELINE.md).

All quantized producers are optimized: the plain conv units (encoder
``d{i}.{j}``, decoder second units ``u{idx}.1``) AND the decoder's fused
upsample+conv composites (``u{idx}.0``) — the engine quantizes the
latter as a 4-tap composite response in chain space, emulated here
exactly as a fractionally strided convolution
(:func:`_composite_apply`), so their integer taps get the same
treatment. This also closes the former sim<->engine fidelity gap
(composite rounding was the one engine rounding the QAT sim skipped).

``learn_scales`` extends the same sequential loop to the ACTIVATION
scales (LSQ lineage): each unit's per-channel output scale gains a
learnable log-multiplier, with the output quantization inside the loss
(STE through the round, real gradients through the clip so saturated
voxels pull the step size). The refined scales come back through
``out_scales`` in the engine's export format and MUST be fed to
``build_predict_q(import_scales=...)`` so the engine's requant
constants match the simulation.

No reference counterpart (the reference serves f32 on CPU,
``ctunet/pytorch/ProblemHandler.py:311-354`` masks are the behavior this
protects); this closes the int8 serving mode's parity gap.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.packed_resident import _CONFIGS
from .ops.packed_conv import packed_conv3d

_EPS_BN = 1e-5
_EPS = 1e-8
_QMAX = 255.0


def supports(model_class: str) -> bool:
    return model_class in _CONFIGS


def _unit_wb(params, stats):
    """BN-folded effective kernel + bias of one Conv+BN+ReLU unit
    (identical folding to ``engine._FusedUnit``)."""
    inv = np.asarray(
        jax.lax.rsqrt(np.asarray(stats["bn"]["var"], np.float32) + _EPS_BN)
    ) * np.asarray(params["bn"]["scale"], np.float32)
    shift = np.asarray(params["bn"]["bias"], np.float32) - np.asarray(
        stats["bn"]["mean"], np.float32) * inv
    w = np.asarray(params["conv"]["kernel"], np.float32)
    if "bias" in params["conv"]:
        shift = shift + np.asarray(params["conv"]["bias"], np.float32) * inv
    return w * inv[None, None, None, None, :], shift


def _fq_in(x: jax.Array, s: np.ndarray) -> jax.Array:
    """Engine entry/requant activation quantization, dequantized:
    q = clip(round(x/s), 0, 255), a_hat = q*s."""
    sv = jnp.asarray(s, jnp.float32)
    return jnp.clip(jnp.round(x / sv), 0.0, _QMAX) * sv


def _grid(w_eff: np.ndarray, s_in: np.ndarray):
    """RTN grid for a folded kernel: w_s = w_eff*s_in, k = 127/max|w_s|
    per out channel — must match ``engine_q._quant_conv`` exactly."""
    w_s = w_eff * s_in.astype(np.float32)[None, None, None, :, None]
    amax = np.abs(w_s).max(axis=(0, 1, 2, 3))
    k = np.where(amax > 0, 127.0 / np.maximum(amax, _EPS), 1.0)
    return w_s, k.astype(np.float32)


def _ste_round(c: jax.Array) -> jax.Array:
    r = jnp.clip(jnp.round(c), -127.0, 127.0)
    return c + jax.lax.stop_gradient(r - c)


def _fq_learn(x: jax.Array, s: jax.Array) -> jax.Array:
    """:func:`_fq_in` with a TRACED scale (LSQ-style gradients): STE
    through the round, real gradients through the clip — saturated
    voxels pull ``d/ds = q`` (the step-size gradient), interior voxels
    see only rounding noise."""
    z = x / s
    zc = jnp.clip(z, 0.0, _QMAX)
    q = zc + jax.lax.stop_gradient(jnp.round(zc) - zc)
    return q * s


def _adam_best(loss_fn, p0, steps: int, lr: float, args=()):
    """Adam with keep-best-iterate tracking (Adam oscillates near the
    optimum at these tiny losses; the init IS the RTN baseline, so the
    result is never worse than RTN on the calibration objective).
    step() returns the loss AT ITS INPUT iterate, so ``l`` pairs with
    the pre-update params. Returns (best_p, first_loss, best_loss).

    ``args``: LARGE tensors the loss reads (calibration activations /
    targets) — passed as jit ARGUMENTS, never closed over: a closed-over
    array lowers as an HLO literal, and at serving shapes the literal
    blows the axon remote-compile request limit (HTTP 413; the serving
    crash of round 5's first bench_serve run)."""
    import optax

    opt = optax.adam(lr)
    st = opt.init(p0)

    @jax.jit
    def step(p, st, *args):
        l, g = jax.value_and_grad(loss_fn)(p, *args)
        up, st = opt.update(g, st)
        return optax.apply_updates(p, up), st, l

    p = p0
    best_l = l0 = None
    best_p = p0
    for _ in range(steps):
        new_p, st, l = step(p, st, *args)
        lf = float(l)
        if l0 is None:
            l0 = lf
        if best_l is None or lf < best_l:
            best_l, best_p = lf, p
        p = new_p
    lf = float(loss_fn(p, *args))
    if l0 is None:
        l0 = lf  # steps=0: the init is the only iterate
    if best_l is None or lf < best_l:
        best_l, best_p = lf, p
    return best_p, l0, best_l


def _composite_apply(x_aug: jax.Array, resp: jax.Array) -> jax.Array:
    """Apply a fused upsample+conv composite response R[rz,ry,rx,ci,co]
    (r in [-1,2] at index r+1; ``out[v] = sum_r R[r] . in[(v-r)/2]``,
    missing taps zero — upconv.composite_response) as a fractionally
    strided convolution: dilate the input 2x, pad (2,2), correlate with
    the spatially reversed response."""
    k = resp[::-1, ::-1, ::-1]
    return jax.lax.conv_general_dilated(
        x_aug, k, window_strides=(1, 1, 1),
        padding=[(2, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _conv(x: jax.Array, w: jax.Array) -> jax.Array:
    return packed_conv3d(x, w)


def optimize_rounding(
    model_class: str,
    variables: Dict[str, Any],
    calib_batch,
    scales: Dict[str, Any],
    steps: int = 250,
    lr: float = 0.03,
    tags: Optional[set] = None,
    verbose: bool = False,
    learn_scales: bool = False,
    out_scales: Optional[Dict[str, Any]] = None,
    bf16_head: float = 0.0,
    apply_opt: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
    return_outputs: bool = False,
):
    """Sequential AdaQuant over the generic-UNet conv units.

    :param calib_batch: (N, D, H, W, Cin) float calibration volumes.
    :param scales: the engine's exported per-tag activation scales
        (``build_predict_q(export_scales=...)``): ``{"entry": s,
        "d{i}.{j}" | "u{idx}.1": (s_in, s_out), "u{idx}.0": s_up}``,
        ones lanes included (stripped here).
    :param tags: optional subset of unit tags to optimize (default all).
    :param learn_scales: ALSO optimize each unit's output ACTIVATION
        scales (LSQ-style: per-channel log-multiplier on the calibrated
        scale, quantization inside the loss with STE/clip gradients).
        Requires rebuilding the engine with ``import_scales=out_scales``
        so its requant constants match.
    :param out_scales: dict filled with the (possibly refined) scales in
        ``export_scales`` format — pass to ``build_predict_q(
        import_scales=...)``. Identical to ``scales`` unless
        ``learn_scales``.
    :param bf16_head: must match the engine build's ``bf16_head``: the
        leading encoder units it names are served bf16, so the
        simulation keeps them FLOAT (no weight/activation quantization,
        no overrides) and quantizes the chain once at the switch —
        downstream units then optimize against the activations the
        mixed-precision engine actually produces. (``bf16_tail`` needs
        no counterpart: tail units run AFTER every quantized unit, so
        their overrides are simply unused by the engine.)
    :param apply_opt: previously computed overrides to APPLY (not
        re-optimize) on units excluded via ``tags`` — with
        ``tags=set()`` this turns the call into a pure evaluation
        forward of a fixed quantization on new inputs.
    :param return_outputs: also run the final skip-concat + 1x1 head
        (float weights; the engine's head rounding is measured mild)
        and return ``(overrides, out_float, out_quant)`` — the model's
        output tuple for both the float and the simulated-quantized
        forward. Default returns just ``overrides``.
    :returns: ``{tag: {"q", "k", "db"}}`` for ``round_opt=``; with
        ``return_outputs``, the 3-tuple above.
    """
    if not supports(model_class):
        raise ValueError(f"quant_opt: unsupported model {model_class}")
    import optax

    cfg = _CONFIGS[model_class]
    n = cfg["n_blocks"]
    params = variables["params"]["unet"]
    stats = variables["batch_stats"]["unet"]
    x = jnp.asarray(calib_batch, jnp.float32)

    overrides: Dict[str, Dict[str, np.ndarray]] = {}
    # working per-tensor scale store (ones lanes included); refined in
    # place when learn_scales — all downstream reads go through it
    ts: Dict[str, np.ndarray] = {
        t_: np.array(v[1] if isinstance(v, tuple) else v, np.float32)
        for t_, v in scales.items()
    }

    def unit_opt(tag, x_f, x_hat, pu, su, s_in_tag):
        """Optimize one unit; returns (y_float, y_hat_prequant)."""
        w_eff, shift = _unit_wb(pu, su)
        y_f = jnp.maximum(_conv(x_f, jnp.asarray(w_eff)) + shift, 0.0)
        s_in = ts[s_in_tag][:-1]  # strip ones
        w_s, k = _grid(w_eff, s_in)
        if tags is not None and tag not in tags:
            # un-optimized unit: apply fixed overrides when given
            # (evaluation mode), else RTN — still sequentially exact
            ov = (apply_opt or {}).get(tag)
            if ov is not None:
                w_dq = ov["q"] / ov["k"] / s_in[:, None]
                db_v = jnp.asarray(ov["db"], jnp.float32)
            else:
                q = np.clip(np.round(w_s * k), -127, 127)
                w_dq = q / k / s_in[:, None]
                db_v = 0.0
            y_hat = jnp.maximum(
                _conv(x_hat, jnp.asarray(w_dq, jnp.float32)) + shift
                + db_v, 0.0
            )
            return y_f, y_hat
        c0 = jnp.asarray(w_s * k, jnp.float32)
        kv = jnp.asarray(k)
        sv = jnp.asarray(s_in)[:, None]
        shift_v = jnp.asarray(shift)
        s_out = ts[tag][:-1]
        s_out_v = jnp.asarray(s_out)  # db parametrized in requant LEVELS

        y_norm = float(jnp.mean(jnp.square(y_f)))
        if y_norm <= 0.0:
            # dead unit on the calibration set (all-zero output): RTN
            q = np.clip(np.round(w_s * k), -127, 127)
            overrides[tag] = {
                "q": q.astype(np.float32), "k": k,
                "db": np.zeros(w_eff.shape[-1], np.float32),
            }
            w_dq = q / k / s_in[:, None]
            y_hat = jnp.maximum(
                _conv(x_hat, jnp.asarray(w_dq, jnp.float32)) + shift_v, 0.0
            )
            return y_f, y_hat

        def fwd(p, x_hat_a):
            w_dq = _ste_round(p["c"]) / kv / sv
            y = jnp.maximum(
                _conv(x_hat_a, w_dq) + shift_v + p["db"] * s_out_v, 0.0
            )
            if learn_scales:
                # quantization inside the loss so the scale multiplier
                # sees the rounding/saturation it controls
                y = _fq_learn(y, s_out_v * jnp.exp(p["t"]))
            return y

        def loss_fn(p, x_hat_a, y_f_a):
            return jnp.mean(jnp.square(fwd(p, x_hat_a) - y_f_a)) / y_norm

        p0 = {"c": c0, "db": jnp.zeros(w_eff.shape[-1], jnp.float32)}
        if learn_scales:
            p0["t"] = jnp.zeros(w_eff.shape[-1], jnp.float32)
        best_p, l0, best_l = _adam_best(loss_fn, p0, steps, lr,
                                        args=(x_hat, y_f))
        if learn_scales:
            ts[tag][:-1] = s_out * np.exp(np.asarray(best_p["t"]))
            s_out = ts[tag][:-1]
        q = np.clip(np.round(np.asarray(best_p["c"])), -127, 127)
        db = np.asarray(best_p["db"], np.float32) * np.asarray(
            scales[tag][1], np.float32)[:-1]
        overrides[tag] = {
            "q": q.astype(np.float32), "k": k, "db": db,
        }
        if verbose:
            flips = int((q != np.clip(np.round(w_s * k), -127, 127)).sum())
            print(f"  {tag}: loss {l0:.3e} -> {best_l:.3e}, "
                  f"{flips}/{q.size} ints changed, |db|max "
                  f"{np.abs(db).max():.2e}", flush=True)
        w_dq = jnp.asarray(q) / kv / sv
        y_hat = jnp.maximum(
            _conv(x_hat, w_dq) + shift_v + jnp.asarray(db), 0.0
        )
        return y_f, y_hat

    # ---- entry ----------------------------------------------------------
    head_units = int(round(max(0.0, min(float(bf16_head), float(n))) * 2))
    x_f = x
    # with a bf16 head the engine consumes the input unquantized
    x_hat = _fq_in(x, ts["entry"][:-1]) if head_units == 0 else x

    skips_f, skips_hat, skips_float = [], [], []
    for i in range(n):
        for j in range(2):
            tag = f"d{i}.{j}"
            t_idx = 2 * i + j
            if t_idx < head_units:
                # unit served bf16 by the engine: float simulation, no
                # overrides; the chain is quantized ONCE at the switch
                # (the last bf16 unit's output scale — same constant the
                # engine's switch affine uses)
                w_eff, shift = _unit_wb(
                    params[f"d{i}"][f"unit{j}"], stats[f"d{i}"][f"unit{j}"]
                )
                x_f = jnp.maximum(
                    _conv(x_f, jnp.asarray(w_eff)) + shift, 0.0
                )
                x_hat = (x_f if t_idx + 1 < head_units
                         else _fq_in(x_f, ts[tag][:-1]))
                continue
            prev = ("entry" if (i, j) == (0, 0)
                    else f"d{i-1}.1" if j == 0 else f"d{i}.0")
            x_f, x_hat = unit_opt(
                tag, x_f, x_hat,
                params[f"d{i}"][f"unit{j}"], stats[f"d{i}"][f"unit{j}"],
                prev,
            )
            x_hat = _fq_in(x_hat, ts[tag][:-1])
        # a block the engine serves FULLY bf16 keeps its skip tensor
        # bf16 too — quantized only at its decoder consumption site (the
        # final 1x1 head consumes it unquantized). The CHAIN is still
        # quantized at the switch (the per-unit rule above), so the skip
        # must be stored from the float value, not the chain value.
        skip_float = 2 * i + 2 <= head_units
        skips_f.append(x_f)
        skips_hat.append(x_f if skip_float else x_hat)
        skips_float.append(skip_float)
        x_f = _maxpool(x_f)
        x_hat = _maxpool(x_hat)  # int8 max pool is exact: same scales

    from .ops.pallas import upconv as uc

    for idx in range(n):
        i = n - 1 - idx
        up = params[f"u{idx}"]["upconv"]
        if idx > 0:
            cat_f = jnp.concatenate([x_f, skips_f[i + 1]], -1)
        else:
            cat_f = x_f
        ku = jnp.asarray(up["kernel"], jnp.float32)
        bu = jnp.asarray(up["bias"], jnp.float32)
        w0_eff, shift0 = _unit_wb(
            params[f"u{idx}"]["unit0"], stats[f"u{idx}"]["unit0"]
        )
        # copy: ts[tag0] is refined in place below — the db export and
        # the loss parametrization must keep the PRE-refinement scale
        s_up = ts[f"u{idx}.0"][:-1].copy()

        def upconv0(xin):
            h = _convt2x2(xin, ku, bu)
            return jnp.maximum(_conv(h, jnp.asarray(w0_eff)) + shift0, 0.0)

        x_f = upconv0(cat_f)

        # fused upsample+conv composite: the engine quantizes the
        # COMPOSITE response (upconv.composite_response) per output
        # channel — optimize those integers with the same scheme. The
        # augmented input interleaves the operands' ones lanes: (a,
        # ones->convT-bias column, b, ones->zero column), scaled by the
        # engine's s_a/s_b activation scales (export tags).
        tag0 = f"u{idx}.0"
        ku_np = np.asarray(up["kernel"], np.float32)
        bu_np = np.asarray(up["bias"], np.float32)
        if idx == 0:
            kT_aug, _ = uc.augment_upconv_kernel(ku_np, bu_np, None)
            s_in_full = ts[f"d{n-1}.1"]
            aug = [x_hat, jnp.ones_like(x_hat[..., :1])]
        else:
            ca = x_hat.shape[-1]
            kT_aug, _ = uc.augment_upconv_kernel(ku_np, bu_np, ca)
            s_in_full = np.concatenate(
                [ts[f"u{idx-1}.1"], ts[f"d{i+1}.1"]]
            )
            b_hat = skips_hat[i + 1]
            if skips_float[i + 1]:
                # engine quantizes a bf16-head skip at its consumption
                # site, at the block's output scale
                b_hat = _fq_in(b_hat, ts[f"d{i+1}.1"][:-1])
            ones = jnp.ones_like(x_hat[..., :1])
            aug = [x_hat, ones, b_hat, ones]
        x_aug = jnp.concatenate(aug, -1)
        resp = uc.composite_response(kT_aug, w0_eff)  # real out cols
        r_s = resp * s_in_full[None, None, None, :, None]
        amax = np.abs(r_s).max(axis=(0, 1, 2, 3))
        k = np.where(
            amax > 0, 127.0 / np.maximum(amax, _EPS), 1.0
        ).astype(np.float32)
        y_norm = float(jnp.mean(jnp.square(x_f)))
        excluded = tags is not None and tag0 not in tags
        if excluded or y_norm <= 0.0:
            ov = (apply_opt or {}).get(tag0) if excluded else None
            if ov is not None:
                w_dq = ov["q"] / ov["k"] / s_in_full[:, None]
                db_v = jnp.asarray(ov["db"], jnp.float32)
            else:
                q = np.clip(np.round(r_s * k), -127, 127)
                w_dq = q / k / s_in_full[:, None]
                db_v = 0.0
            y_hat = jnp.maximum(
                _composite_apply(x_aug, jnp.asarray(w_dq, jnp.float32))
                + shift0 + db_v, 0.0,
            )
            if not excluded and y_norm <= 0.0:
                # dead composite on the calibration set: RTN override,
                # mirroring the plain-unit dead branch (excluded tags
                # record nothing, also mirroring the plain units)
                overrides[tag0] = {
                    "q": np.clip(np.round(r_s * k), -127, 127).astype(
                        np.float32), "k": k,
                    "db": np.zeros(resp.shape[-1], np.float32),
                }
        else:
            kv = jnp.asarray(k)
            sv = jnp.asarray(s_in_full)[:, None]
            s_up_v = jnp.asarray(s_up)

            def loss_fn(p, x_aug_a, y_f_a):
                w_dq = _ste_round(p["c"]) / kv / sv
                y = jnp.maximum(
                    _composite_apply(x_aug_a, w_dq)
                    + shift0 + p["db"] * s_up_v, 0.0,
                )
                if learn_scales:
                    y = _fq_learn(y, s_up_v * jnp.exp(p["t"]))
                return jnp.mean(jnp.square(y - y_f_a)) / y_norm

            p0 = {"c": jnp.asarray(r_s * k, jnp.float32),
                  "db": jnp.zeros(resp.shape[-1], jnp.float32)}
            if learn_scales:
                p0["t"] = jnp.zeros(resp.shape[-1], jnp.float32)
            best_p, l0, best_l = _adam_best(loss_fn, p0, steps, lr,
                                            args=(x_aug, x_f))
            if learn_scales:
                ts[tag0][:-1] = s_up * np.exp(np.asarray(best_p["t"]))
            q = np.clip(np.round(np.asarray(best_p["c"])), -127, 127)
            db = np.asarray(best_p["db"], np.float32) * s_up
            overrides[tag0] = {
                "q": q.astype(np.float32), "k": k, "db": db,
            }
            if verbose:
                flips = int(
                    (q != np.clip(np.round(r_s * k), -127, 127)).sum()
                )
                print(f"  {tag0}: loss {l0:.3e} -> {best_l:.3e}, "
                      f"{flips}/{q.size} ints changed, |db|max "
                      f"{np.abs(db).max():.2e}", flush=True)
            w_dq = jnp.asarray(q) / kv / sv
            y_hat = jnp.maximum(
                _composite_apply(x_aug, w_dq) + shift0 + jnp.asarray(db),
                0.0,
            )
        x_hat = _fq_in(y_hat, ts[tag0][:-1])
        tag = f"u{idx}.1"
        x_f, x_hat = unit_opt(
            tag, x_f, x_hat,
            params[f"u{idx}"]["unit1"], stats[f"u{idx}"]["unit1"],
            tag0,
        )
        x_hat = _fq_in(x_hat, ts[tag][:-1])

    if out_scales is not None:
        # assemble the (refined) scales in export format for
        # ``build_predict_q(import_scales=...)``
        out_scales.update(_assemble_export(ts, n))
    if return_outputs:
        # final skip concat + 1x1 head + variant output mapping (engine:
        # lc consumes the chain value and the d0 skip; a bf16-head skip
        # reaches the head unquantized — skips_hat[0] already reflects
        # both cases)
        out_f = _sim_head(
            cfg, params, jnp.concatenate([x_f, skips_f[0]], -1)
        )
        out_hat = _sim_head(
            cfg, params, jnp.concatenate([x_hat, skips_hat[0]], -1)
        )
        return overrides, out_f, out_hat
    return overrides


def _assemble_export(ts: Dict[str, np.ndarray], n: int) -> Dict[str, Any]:
    """Per-tensor output-scale map -> the engine's export_scales format
    (``{"entry": s, "d{i}.{j}"|"u{idx}.1": (s_in, s_out),
    "u{idx}.0": s_up}``)."""
    out: Dict[str, Any] = {"entry": ts["entry"]}
    s_cur = ts["entry"]
    for i in range(n):
        out[f"d{i}.0"] = (s_cur, ts[f"d{i}.0"])
        out[f"d{i}.1"] = (ts[f"d{i}.0"], ts[f"d{i}.1"])
        s_cur = ts[f"d{i}.1"]
    for idx in range(n):
        out[f"u{idx}.0"] = ts[f"u{idx}.0"]
        out[f"u{idx}.1"] = (ts[f"u{idx}.0"], ts[f"u{idx}.1"])
    return out


def simulate_scales(
    model_class: str,
    variables: Dict[str, Any],
    calib_batch,
) -> Dict[str, Any]:
    """Engine-equivalent max calibration WITHOUT the engine: per-channel
    activation maxima from a float forward, ``s = max/255`` (zero-point
    range), assembled in the ``export_scales`` format with ones lanes.

    Matches ``build_predict_q``'s calibration up to compute-dtype
    rounding (the engine calibrates through its bf16 kernels). Use it to
    drive :func:`optimize_rounding` or ``import_scales`` builds on hosts
    without a TPU (PTQ config evaluation, CI).
    """
    if not supports(model_class):
        raise ValueError(f"quant_opt: unsupported model {model_class}")
    cfg = _CONFIGS[model_class]
    n = cfg["n_blocks"]
    params = variables["params"]["unet"]
    stats = variables["batch_stats"]["unet"]
    x = jnp.asarray(calib_batch, jnp.float32)

    def smax(t) -> np.ndarray:
        m = np.asarray(
            jnp.max(jnp.abs(t), axis=tuple(range(t.ndim - 1))), np.float32
        )
        m = np.maximum(m, _EPS)
        return np.concatenate(
            [m / _QMAX, [1.0 / _QMAX]]
        ).astype(np.float32)

    ts: Dict[str, np.ndarray] = {"entry": smax(x)}

    def unit(xin, pu, su):
        w_eff, shift = _unit_wb(pu, su)
        return jnp.maximum(_conv(xin, jnp.asarray(w_eff)) + shift, 0.0)

    skips = []
    for i in range(n):
        for j in range(2):
            x = unit(x, params[f"d{i}"][f"unit{j}"],
                     stats[f"d{i}"][f"unit{j}"])
            ts[f"d{i}.{j}"] = smax(x)
        skips.append(x)
        x = _maxpool(x)
    for idx in range(n):
        i = n - 1 - idx
        cat = x if idx == 0 else jnp.concatenate([x, skips[i + 1]], -1)
        up = params[f"u{idx}"]["upconv"]
        h = _convt2x2(
            cat, jnp.asarray(up["kernel"], jnp.float32),
            jnp.asarray(up["bias"], jnp.float32),
        )
        x = unit(h, params[f"u{idx}"]["unit0"], stats[f"u{idx}"]["unit0"])
        ts[f"u{idx}.0"] = smax(x)
        x = unit(x, params[f"u{idx}"]["unit1"], stats[f"u{idx}"]["unit1"])
        ts[f"u{idx}.1"] = smax(x)
    return _assemble_export(ts, n)


def _sim_head(cfg, params, feat):
    """Float 1x1 head + variant output mapping (mirrors the model
    variants; the engine's int8 head rounding is not simulated)."""
    from .models.variants import _double_out_head

    lc_k = jnp.asarray(params["last_conv"]["kernel"], jnp.float32)[0, 0, 0]
    lc_b = jnp.asarray(params["last_conv"]["bias"], jnp.float32)
    out3 = jax.nn.sigmoid(feat @ lc_k + lc_b)
    head = cfg["head"]
    if head is None:
        return (out3,)
    full, flap = _double_out_head(out3)
    if head == "double_softmax":
        return (jax.nn.softmax(full, -1), jax.nn.softmax(flap, -1))
    return (full, flap)


def _maxpool(x):
    b, d, h, w, c = x.shape
    return x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c).max((2, 4, 6))


def _convt2x2(x, kernel, bias):
    """k2s2 transposed conv (transpose_kernel semantics), einsum form."""
    y = jnp.einsum("nzyxi,abcoi->nzaybxco", x, kernel)
    nb, d, _, h, _, w, _, co = y.shape
    return y.reshape(nb, 2 * d, 2 * h, 2 * w, co) + bias
