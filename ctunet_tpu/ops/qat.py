"""Quantization-aware fine-tuning (QAT) for the int8 serving engine.

Post-training quantization (engine_q.py) costs flap-mask parity on
trained checkpoints (measured: Dice 0.962 vs the bf16 engine's 0.996 at
10k steps), and the loss is NOT concentrated in the decoder tail — it is
the accumulation of per-unit requant rounding (every Conv+BN+ReLU output
rounds to 255 per-channel levels). The reliable fix is to fine-tune the
weights UNDER that rounding: this module builds a fake-quantized forward
that simulates the int8 engine's arithmetic in the differentiable graph
(straight-through estimator), so a few hundred Adam steps teach the
network to place its decision boundaries where int8 can represent them.

What is simulated (matching ``engine_q.build_predict_q``):

- per-channel symmetric ACTIVATION quantization at every unit output:
  ``fq(y) = clip(round(y / s), 0, 255) * s`` with the calibrated
  ``s = max_c / 255`` (the engine's zero-point requant epilogue incl. its
  saturation), STE gradients;
- per-channel WEIGHT quantization of each conv unit with the engine's
  exact folding: BN scale folded into the kernel, the input activation
  scale folded per in-channel, then ``k = 127 / max|w_s|`` per
  out-channel (scale treated as a constant for gradients);
- BatchNorm FROZEN to its running statistics (the engine folds
  running stats; training-mode batch stats would fold differently);
- int8 max pooling is exact under shared per-channel scales — no extra
  rounding is simulated there (none happens in the engine);
- the decoder's fused upsample+conv composite keeps float weights in
  the simulation (its input activations and output ARE fake-quantized;
  composite-weight rounding is the one engine rounding not simulated —
  weight rounding at 8 bits per-channel is the minor term).

Scales come from :func:`calibrate_unit_scales` (a capture pass of the
same forward without fq). They are recomputed by the serving engine's
own calibration after QAT — the scheme is calibration-consistent, not
scale-pinned, so small drift is absorbed.

No reference counterpart (the reference serves f32 on CPU); this backs
the TPU-native int8 serving mode's accuracy story.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.packed_resident import _CONFIGS
from .packed_conv import packed_conv3d

_EPS_BN = 1e-5
_EPS = 1e-8


def supports(model_class: str) -> bool:
    return model_class in _CONFIGS


def _fq_act(y: jax.Array, s: jax.Array) -> jax.Array:
    """Engine requant epilogue in float: round + [0,255] clamp, CLIPPED
    STE.

    The straight-through gradient passes ONLY where the pre-quant value
    is inside the representable range ``[0, 255*s]``. A full STE (grad 1
    everywhere) lets activations drift arbitrarily far past the pinned
    calibration scales with no corrective signal — the fq forward clamps
    them so the loss never feels the drift, and the UN-clamped serving
    forward then diverges (measured: an 800-step full-STE fine-tune
    collapsed the plain forward to empty masks while fq loss stayed
    ~0.85). Zeroing the gradient in the saturated region is the standard
    LSQ/PACT-style clipped STE and makes saturation a loss-visible dead
    zone instead of a hidden free ride.
    """
    s = s.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    q = jnp.clip(jnp.round(yf / s), 0.0, 255.0) * s
    in_range = yf <= 255.0 * s  # post-ReLU: lower bound never binds
    out = jnp.where(
        in_range,
        yf + jax.lax.stop_gradient(q - yf),
        jax.lax.stop_gradient(q),
    )
    return out.astype(y.dtype)


def _fq_weight(w_eff: jax.Array, s_in: jax.Array) -> jax.Array:
    """Engine weight quantization in float (per-out-channel k), STE.

    ``w_eff``: BN-folded kernel (k,k,k,Ci,Co); ``s_in``: per-in-channel
    activation scales. Returns the dequantized effective kernel.
    """
    w = w_eff.astype(jnp.float32)
    w_s = w * s_in.astype(jnp.float32)[None, None, None, :, None]
    amax = jax.lax.stop_gradient(
        jnp.max(jnp.abs(w_s), axis=(0, 1, 2, 3))
    )
    k = jnp.where(amax > 0, 127.0 / jnp.maximum(amax, _EPS), 1.0)
    q = jnp.clip(jnp.round(w_s * k), -127.0, 127.0) / k
    w_q = (
        q / s_in.astype(jnp.float32)[None, None, None, :, None]
    )
    return (w + jax.lax.stop_gradient(w_q - w)).astype(w_eff.dtype)


def _unit(x, pu, su, s_in, s_out, dtype, fq: bool):
    """Conv+BN(frozen)+ReLU with engine-exact fake quantization.

    ``s_in``/``s_out`` may be None even under ``fq`` — a SPARSE scales
    dict selectively quantizes a subset of units (per-unit sensitivity
    sweeps); fq applies only where a scale is present.
    """
    inv = jax.lax.rsqrt(su["var"] + _EPS_BN) * pu["bn"]["scale"]
    shift = pu["bn"]["bias"] - su["mean"] * inv
    w_eff = pu["conv"]["kernel"].astype(jnp.float32) * inv[
        None, None, None, None, :
    ]
    if fq and s_in is not None:
        w_eff = _fq_weight(w_eff, jnp.asarray(s_in))
    y = packed_conv3d(x.astype(dtype), w_eff.astype(dtype))
    y = jnp.maximum(y + shift.astype(y.dtype), 0)
    if fq and s_out is not None:
        return _fq_act(y, jnp.asarray(s_out))
    return y


def _maxpool(x):
    b, d, h, w, c = x.shape
    return x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c).max((2, 4, 6))


def _convt2x2(x, kernel, bias, dtype):
    """k2s2 transposed conv (transpose_kernel semantics), einsum form."""
    k = kernel.astype(dtype)
    y = jnp.einsum("nzyxi,abcoi->nzaybxco", x.astype(dtype), k)
    nb, d, _, h, _, w, _, co = y.shape
    return y.reshape(nb, 2 * d, 2 * h, 2 * w, co) + bias.astype(dtype)


class QATModel:
    """``apply``-compatible fake-quantized forward over a trained
    checkpoint (generic UNet family; standard layout — QAT runs at the
    128-res training config where speed is ample)."""

    def __init__(self, model_class: str,
                 scales: Optional[Dict[str, Any]] = None,
                 dtype=jnp.bfloat16):
        if not supports(model_class):
            raise ValueError(f"QAT: unsupported model {model_class}")
        self.cfg = _CONFIGS[model_class]
        self.scales = scales  # None => capture mode (no fq)
        self.dtype = dtype
        self._captured: Dict[str, np.ndarray] = {}

    # -- scale capture ------------------------------------------------

    def _record(self, name, y):
        if self.scales is None:
            mx = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=(0, 1, 2, 3))
            self._captured[name] = mx
        return y

    def captured_scales(self) -> Dict[str, np.ndarray]:
        """Per-unit output scales from the last capture-mode call."""
        return {
            k: np.maximum(np.asarray(v, np.float32), _EPS) / 255.0
            for k, v in self._captured.items()
        }

    # -- forward --------------------------------------------------------

    def apply(self, variables, x, train: bool = False, mutable=None):
        out = self._forward(variables, x)
        if mutable:
            # BN is frozen under QAT: stats pass through unchanged
            return out, {"batch_stats": variables["batch_stats"]}
        return out

    def _forward(self, variables, x):
        cfg = self.cfg
        n, head = cfg["n_blocks"], cfg["head"]
        params = variables["params"]["unet"]
        stats = variables["batch_stats"]["unet"]
        fq = self.scales is not None
        sc = self.scales or {}
        dtype = self.dtype

        nb, D, H, W, cin = x.shape
        x = x.astype(dtype)
        # entry: binary skull/atlas channels quantize exactly at s=1/255
        s_cur = np.full((cin,), 1.0 / 255.0, np.float32)

        skips = []
        h = x
        for i in range(n):
            for j in range(2):
                tag = f"d{i}.{j}"
                h = _unit(
                    h, params[f"d{i}"][f"unit{j}"],
                    stats[f"d{i}"][f"unit{j}"]["bn"],
                    s_cur, sc.get(tag), dtype, fq,
                )
                self._record(tag, h)
                s_cur = sc.get(tag)
            skips.append((h, s_cur))
            h = _maxpool(h)  # scales unchanged (max is monotonic)

        a, s_a = h, s_cur
        for idx in range(n):
            i = n - 1 - idx
            up = params[f"u{idx}"]["upconv"]
            if idx == 0:
                cat, s_cat = a, s_a
            else:
                b, s_b = skips[i + 1]
                cat = jnp.concatenate([a, b], axis=-1)
                s_cat = (
                    None if (s_a is None or s_b is None)
                    else np.concatenate([s_a, s_b])
                )
            h = _convt2x2(cat, up["kernel"], up["bias"], dtype)
            # unit0 consumes the CONTINUOUS upconv output (the engine
            # fuses ConvT o conv0 into one int8 composite; see module
            # docstring) — activation fq applies at its output
            tag0 = f"u{idx}.0"
            h = _unit(
                h, params[f"u{idx}"]["unit0"],
                stats[f"u{idx}"]["unit0"]["bn"],
                None, sc.get(tag0), dtype, fq,
            )
            self._record(tag0, h)
            tag1 = f"u{idx}.1"
            h = _unit(
                h, params[f"u{idx}"]["unit1"],
                stats[f"u{idx}"]["unit1"]["bn"],
                sc.get(tag0), sc.get(tag1), dtype, fq,
            )
            self._record(tag1, h)
            a, s_a = h, sc.get(tag1)

        # head: float math on the (fake-)quantized operands, like the
        # engine's scale-folded block-diag matmuls + f32 sigmoid
        b0, _ = skips[0]
        lc = params["last_conv"]
        lk = lc["kernel"][0, 0, 0].astype(dtype)
        ca = a.shape[-1]
        out = (
            a @ lk[:ca] + b0 @ lk[ca:] + lc["bias"].astype(dtype)
        )
        out = jax.nn.sigmoid(out)
        if head is None:
            return out
        m_full = jnp.asarray(
            [[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]], out.dtype
        )
        m_flap = jnp.asarray(
            [[0.0, 0.0], [-1.0, 1.0], [0.0, 0.0]], out.dtype
        )
        full = out @ m_full
        fl = out @ m_flap + jnp.asarray([1.0, 0.0], out.dtype)
        if head == "double_softmax":
            return jax.nn.softmax(full, -1), jax.nn.softmax(fl, -1)
        return full, fl


def calibrate_unit_scales(model_class, variables, calib_batch,
                          dtype=jnp.bfloat16) -> Dict[str, np.ndarray]:
    """Per-unit output activation scales (max/255) from one forward."""
    cap = QATModel(model_class, scales=None, dtype=dtype)
    cap._forward(variables, jnp.asarray(calib_batch))
    return cap.captured_scales()
