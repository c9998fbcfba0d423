"""Packed-RESIDENT training forward: the whole U-Net in W-packed layout.

The standard training graph keeps activations in channels-last standard
layout between ops. At full resolution with this family's thin channels
(7/14/28 at i_size=7), every materialized tensor pays TPU's (8,128) tile
padding on the minor dim — 18x for 7 lanes — which is where the profiled
"flat tail" of the 224x304x304 train step lives (dozens of 8-30 ms
layout copies/fusions; BASELINE.md round 4). The serving engine already
solved this with a W-packed layout (``ops/pallas/conv3d.py``); this
module brings the same layout to the DIFFERENTIABLE path:

- activations flow as ``(B, D, H, W/p, p*C)`` with ``p0 = 2**n_blocks``
  at full resolution, halving per pool level while channels double — the
  lane dim stays ~constant (112 for i_size=7) and every materialized
  tensor is lane-dense;
- convs are the packed XLA convs of ``ops/packed_conv.py`` WITHOUT the
  per-call pack/unpack reshapes (the relayout to standard between ops is
  exactly the cost being removed);
- pooling is a custom-VJP lane-space max (W-pairs sit inside a pack
  block), with the backward's eq/tie temps lane-dense;
- the k2s2 transposed conv is one einsum producing the doubled pack
  directly (the packed analog of ``unet._ConvT2x2``);
- skip concats are never materialized: the upconv consuming
  ``cat(a, skip)`` splits its kernel columns (weight-split, same
  parameters);
- BatchNorm statistics reduce over batch x spatial x pack positions —
  the same element set as the standard graph, so train-mode stats and
  running averages are IDENTICAL (f32, momentum 0.9, eps 1e-5);
- remat per block, mirroring ``nn.remat`` in the standard model (block
  functions are pure — they RETURN their BN stats so ``jax.checkpoint``
  re-execution stays side-effect-free).

Integration is functional, like the serving engine: a shim object with
``init``/``apply`` built from the UNTOUCHED flax model — parameters,
checkpoints and the optimizer tree are unchanged, and ``apply`` is
value- and gradient-exact vs the flax graph (modulo float summation
order; tested in tests/test_packed_resident.py). Inputs whose spatial
dims don't divide by ``2**n_blocks`` (or unsupported families) fall back
to the flax apply transparently.

Reference being reproduced: the training forward of
``ctunet/pytorch/models.py:158-261`` + the double-output heads
(``models.py:299-387``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.packed_conv import pack_weights_jax

# Model-family table (mirrors engine.ENGINE_CONFIGS; head: None = plain
# 3-channel sigmoid output, "double" = (full, flap) encodings after
# sigmoid, "double_softmax" = additionally softmaxed (UNetDO)).
_CONFIGS: Dict[str, Dict[str, Any]] = {
    "UNet4b2i3o": dict(n_blocks=4, i_size=7, head=None),
    "UNet5b2i3o": dict(n_blocks=5, i_size=4, head=None),
    "UNet4b1i3o": dict(n_blocks=4, i_size=7, head=None),
    "UNetSP": dict(n_blocks=4, i_size=7, head="double"),
    "UNetSPSmall": dict(n_blocks=5, i_size=4, head="double_softmax"),
    "UNetDO": dict(n_blocks=4, i_size=7, head="double"),
}


def supports(model_class: str) -> bool:
    return model_class in _CONFIGS


# ---------------------------------------------------------------------------
# packed building blocks
# ---------------------------------------------------------------------------


def _conv_packed(xq: jax.Array, kernel: jax.Array, p: int) -> jax.Array:
    """SAME stride-1 conv on a packed tensor (pack unchanged)."""
    from ..ops import packed_conv as pcv

    if pcv.get_conv_impl() == "chain":
        from ..ops import chain_conv_train as cct

        if cct.packed_chain_supported(xq, kernel, p):
            # split-tap chain kernel fwd/dgrad + XLA wgrad (hand VJP);
            # the packed-resident analog of ``conv_impl = "chain"``
            return cct.conv3d_chain_train_packed(xq, kernel)
    pw = pack_weights_jax(kernel, p).astype(xq.dtype)
    if pcv.get_conv_impl() == "xla_dw":
        return pcv._packed_core_dw(xq, pw)
    return jax.lax.conv_general_dilated(
        xq, pw, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _bn_relu_packed(
    xq: jax.Array, bn_p, bn_s, p: int, c: int, train: bool,
    momentum: float = 0.9, eps: float = 1e-5,
):
    """BatchNorm (f32 stats, compute-dtype data) + ReLU on packed lanes.

    Element set per channel equals the standard graph's (batch x spatial
    x pack positions), so statistics are identical (``unet.BatchNorm``
    math). Returns ``(y, new_stats_or_None)``."""
    scale, bias = bn_p["scale"], bn_p["bias"]
    new_stats = None
    if train:
        sh = xq.shape
        xf = xq.astype(jnp.float32).reshape(*sh[:-1], p, c)
        axes = tuple(range(xf.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
        m = momentum
        new_stats = {
            "mean": m * bn_s["mean"] + (1 - m) * mean,
            "var": m * bn_s["var"] + (1 - m) * var,
        }
    else:
        mean, var = bn_s["mean"], bn_s["var"]
    inv = jax.lax.rsqrt(var + eps) * scale
    shift = bias - mean * inv
    inv_l = jnp.tile(inv, p).astype(xq.dtype)
    shift_l = jnp.tile(shift, p).astype(xq.dtype)
    return jnp.maximum(xq * inv_l + shift_l, 0), new_stats


_SEL_CACHE: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}


def _sel_mats(p: int, c: int) -> Tuple[np.ndarray, np.ndarray]:
    """0/1 selection matrices (p*c, (p//2)*c) extracting the even/odd
    W positions of a lane block (lane order: (w-pos s, channel))."""
    if (p, c) not in _SEL_CACHE:
        e0 = np.zeros((p * c, (p // 2) * c), np.float32)
        e1 = np.zeros_like(e0)
        for s2 in range(p // 2):
            for ch in range(c):
                e0[(2 * s2) * c + ch, s2 * c + ch] = 1.0
                e1[(2 * s2 + 1) * c + ch, s2 * c + ch] = 1.0
        _SEL_CACHE[(p, c)] = (e0, e1)
    return _SEL_CACHE[(p, c)]


def _pool2_packed_value(xq, p, c):
    # D/H pairs split MAJOR dims only; the W pair is resolved in lane
    # space by two 0/1-selection matmuls (MXU; exact — one nonzero per
    # output lane). The former single 9D reshape split the lane dim into
    # a c-minor (7-wide) layout: every temp paid the (8,128) tile
    # padding 18x, ~55 ms of the full-res step in pool fwd+bwd
    # (tools/attr_train.py round 5).
    b, d, h, wp, pc = xq.shape
    x = xq.reshape(b, d // 2, 2, h // 2, 2, wp, pc).max(axis=(2, 4))
    e0, e1 = _sel_mats(p, c)
    e0 = jnp.asarray(e0, xq.dtype)
    e1 = jnp.asarray(e1, xq.dtype)
    return jnp.maximum(x @ e0, x @ e1)


def _make_pool2_packed(p: int, c: int):
    """Custom-VJP packed 2x max pool; every temp keeps the full p*c (or
    (p/2)*c) lane dim as its minor axis (the packed analog of
    ``unet._maxpool2``; same even tie-splitting).

    The EQUALITY-critical backward path (window max -> eq mask -> tie
    counts) is built from elementwise ops only (lane roll + where): the
    max each input element is compared against is an exact copy of
    values from elementwise ``jnp.maximum`` chains, so every window has
    >= 1 equal element and ties >= 1 BY CONSTRUCTION. Routing the max
    through a 0/1-selection matmul instead NaN'd key-dependently in
    round 5: a backend may approximate even a selection matmul (CPU
    oneDNN flushes denormals), the bitwise equality then misses, and
    ties hits 0 -> g/0. The matmuls remain only where approximation
    cannot invent non-finite values: the forward's lane compaction and
    the backward's gradient scatter."""

    def _pair(t):
        """Elementwise W-partner of every lane block: lane (s, ch) gets
        the value at (s^1, ch) — a lane roll by +-c selected by block
        parity. Exact (no arithmetic)."""
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1)
        even = (lane // c) % 2 == 0
        return jnp.where(
            even, jnp.roll(t, -c, axis=-1), jnp.roll(t, c, axis=-1)
        )

    @jax.custom_vjp
    def pool(xq):
        return _pool2_packed_value(xq, p, c)

    def fwd(xq):
        y = _pool2_packed_value(xq, p, c)
        return y, (xq, y)

    def bwd(res, g):
        xq, yq = res
        del yq  # the backward rebuilds the max exactly, lane-dense
        b, d, h, wp, pc = xq.shape
        # D/H-pair max (major split only), then the W-pair max per INPUT
        # lane — all elementwise, so rep holds exact copies of xq values
        m_dh = xq.reshape(b, d // 2, 2, h // 2, 2, wp, pc).max(axis=(2, 4))
        pairmax = jnp.maximum(m_dh, _pair(m_dh))
        rep = jnp.broadcast_to(
            pairmax[:, :, None, :, None],
            (b, d // 2, 2, h // 2, 2, wp, pc),
        ).reshape(xq.shape)
        eq = (xq == rep).astype(jnp.float32)
        # tie count per input lane: majors sum + the W partner's count
        t6 = eq.reshape(b, d // 2, 2, h // 2, 2, wp, pc).sum(axis=(2, 4))
        ties_in = t6 + _pair(t6)
        # scatter g to input lanes (both W positions get their output's
        # gradient); divide by the tie count, broadcast over the majors
        e0, e1 = _sel_mats(p, c)
        g32 = g.astype(jnp.float32)
        g_in = (g32 @ jnp.asarray(e0.T) + g32 @ jnp.asarray(e1.T))
        gg = g_in / ties_in
        dx = (eq * jnp.broadcast_to(
            gg[:, :, None, :, None],
            (b, d // 2, 2, h // 2, 2, wp, pc),
        ).reshape(xq.shape)).astype(xq.dtype)
        return (dx,)

    pool.defvjp(fwd, bwd)
    return pool


def _upconv2_packed(a, kernel, bias, p, b=None, ca=None):
    """k2s2 VALID transposed conv, packed in -> packed out (pack doubles).

    ``kernel`` (2,2,2,O,I) with ``transpose_kernel=True`` semantics (no
    spatial flip — the packed analog of ``unet._ConvT2x2``):
    ``out[2z+dz, 2y+dy, 2x+dx, o] = sum_i x[z,y,x,i] k[dz,dy,dx,o,i]``.
    Output W position ``2(x*p+s)+dx`` packs as lane ``(2s+dx)*O + o`` at
    pack ``2p``. With ``b``/``ca``: the input is the implicit concat
    ``cat(a, b)`` (kernel columns split at ``ca``; weight-split sum).
    """
    co = kernel.shape[3]

    # Per-(dz,dy) LANE matmuls: out lane (2s+dx)*co+o = sum_i t lane
    # s*ci+i * k[dz,dy,dx,o,i]. The weight matrix is kron-placed from the
    # raw kernel (differentiable), so every materialized tensor — forward
    # intermediates AND autodiff temps — keeps a ~p*co-dense minor dim.
    # The previous einsum form ("nzyxsi,abcoi->nzaybxsco") materialized a
    # co-minor intermediate (7 lanes at full res -> 18x tile padding):
    # 21 ms per reshape + 15 ms copies in the 224x304x304 step profile
    # (tools/attr_train.py). The final (d,2,h,2) -> (2d,2h) interleave
    # reshape moves only MAJOR dims over dense lanes.
    def one(t, k):
        # Lane-count precondition: t's minor dim must be exactly p packed
        # groups of k's input channels, or the kron-placed matmul below
        # fails with an opaque shape error.
        assert t.shape[-1] == p * k.shape[4], (t.shape, p, k.shape)
        mats = []
        for dz in range(2):
            for dy in range(2):
                m = 0
                for dx in range(2):
                    e = np.zeros((p, 2 * p), np.float32)
                    for s in range(p):
                        e[s, 2 * s + dx] = 1.0
                    m = m + jnp.kron(
                        jnp.asarray(e, t.dtype),
                        k[dz, dy, dx].T.astype(t.dtype),
                    )
                mats.append(m)  # (p*ci, 2p*co)
        nb, d, h, wp, _ = t.shape
        ys = [t @ m for m in mats]  # each (nb, d, h, wp, 2p*co)
        y = jnp.stack(
            [jnp.stack(ys[i: i + 2], 3) for i in (0, 2)], 2
        )  # (nb, d, 2, h, 2, wp, 2p*co)
        return y.reshape(nb, 2 * d, 2 * h, wp, 2 * p * co)

    if b is None:
        out = one(a, kernel)
    else:
        out = one(a, kernel[..., :ca]) + one(b, kernel[..., ca:])
    blane = jnp.tile(bias, 2 * p).astype(out.dtype)
    return out + blane


def _head_packed(a, b, kernel, bias, p, ca, cb, head, dtype):
    """last_conv (1x1x1 over the implicit concat) + sigmoid + the
    double-output encodings on packed lanes (block-diagonal matmuls),
    then unpacked by a pure reshape. Computed in the model compute dtype
    to match the flax graph's ``_SplitConv1x1`` + sigmoid numerics."""
    lk = kernel[0, 0, 0].astype(dtype)  # (ca+cb, 3)
    co = lk.shape[1]
    eye = jnp.eye(p, dtype=dtype)
    m_a = jnp.kron(eye, lk[:ca])
    m_b = jnp.kron(eye, lk[ca: ca + cb])
    bias_l = jnp.tile(bias, p).astype(dtype)

    lc = a.astype(dtype) @ m_a + b.astype(dtype) @ m_b + bias_l
    out = jax.nn.sigmoid(lc)
    nb, d, h, wp, _ = out.shape
    out = out.reshape(nb, d, h, wp * p, co)
    if head is None:
        return out
    m_full = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]], out.dtype)
    m_flap = jnp.asarray([[0.0, 0.0], [-1.0, 1.0], [0.0, 0.0]], out.dtype)
    b_flap = jnp.asarray([1.0, 0.0], out.dtype)
    full = out @ m_full
    fl = out @ m_flap + b_flap
    if head == "double_softmax":
        # in the compute dtype, matching the flax variant's head
        return jax.nn.softmax(full, axis=-1), jax.nn.softmax(fl, axis=-1)
    return full, fl


# ---------------------------------------------------------------------------
# the shim
# ---------------------------------------------------------------------------


class PackedResidentModel:
    """``init``/``apply``-compatible wrapper running the packed forward.

    ``init`` delegates to the wrapped flax model (parameter trees are
    identical by construction); ``apply`` runs packed-resident when the
    input divides by ``2**n_blocks`` and falls back to the flax apply
    otherwise. Signature-compatible with every ``model.apply`` call in
    ``steps.py`` (positional ``(variables, x, train)``, optional
    ``mutable=["batch_stats"]``).
    """

    def __init__(self, inner, model_class: str, use_remat: bool = True,
                 remat_policy: str = "default"):
        if not supports(model_class):
            raise ValueError(f"packed-resident: unsupported {model_class}")
        self.inner = inner
        self.model_class = model_class
        self.cfg = _CONFIGS[model_class]
        self.use_remat = use_remat
        # "default": plain jax.checkpoint (save only block inputs);
        # "dots": additionally save matmul/conv outputs inside the block
        # (less recompute, more residency) — an OOM/speed tuning knob for
        # the full-res backward (tools/mem_train.py iterates on this).
        assert remat_policy in ("default", "dots"), remat_policy
        self.remat_policy = remat_policy

    def init(self, *a, **k):
        return self.inner.init(*a, **k)

    # -- forward ----------------------------------------------------------

    def apply(self, variables, x, train: bool = False, mutable=None):
        n = self.cfg["n_blocks"]
        p0 = 2 ** n
        if any(int(s) % p0 for s in x.shape[1:4]):
            # indivisible spatial dims: transparent flax fallback
            return self.inner.apply(variables, x, train, mutable=mutable)

        out, new_stats = self._forward(variables, x, train)
        if mutable:
            return out, {"batch_stats": new_stats}
        return out

    def _forward(self, variables, x, train: bool):
        cfg = self.cfg
        n = cfg["n_blocks"]
        i_size = cfg["i_size"]
        head = cfg["head"]
        params = variables["params"]["unet"]
        stats = variables["batch_stats"]["unet"]
        dtype = getattr(self.inner, "dtype", jnp.float32)

        nb, D, H, W, cin = x.shape
        p0 = 2 ** n
        new_unet: Dict[str, Any] = {}

        def unit(tag, i, j, xq, p, train):
            """One Conv+BN+ReLU; returns (y, new_bn_stats_or_None)."""
            pu = params[f"{tag}{i}"][f"unit{j}"]
            su = stats[f"{tag}{i}"][f"unit{j}"]["bn"]
            k = pu["conv"]["kernel"].astype(dtype)
            y = _conv_packed(xq, k, p)
            return _bn_relu_packed(y, pu["bn"], su, p, k.shape[-1], train)

        # prevent_cse: jax.checkpoint's CSE-prevention gating miscompiles
        # around the Pallas chain kernels on TPU — with conv_impl="chain"
        # and the default prevent_cse=True, every encoder block's backward
        # produced NaN gradients from the first step (bisected to: both
        # chain convs of a block inside one checkpointed region; clean
        # with remat off, clean with prevent_cse=False, clean per-conv).
        # prevent_cse=False is numerically safe — its only risk is XLA
        # CSE-ing the recompute with the forward, i.e. losing remat's
        # memory saving, not correctness.
        from ..ops import packed_conv as _pcv

        ckpt_kw = (
            {"prevent_cse": False}
            if _pcv.get_conv_impl() == "chain" else {}
        )
        if not self.use_remat:
            maybe_remat = lambda f: f  # noqa: E731
        elif self.remat_policy == "dots":
            maybe_remat = lambda f: jax.checkpoint(  # noqa: E731
                f, policy=jax.checkpoint_policies.dots_saveable, **ckpt_kw
            )
        else:
            maybe_remat = lambda f: jax.checkpoint(f, **ckpt_kw)  # noqa: E731

        def record(tag, i, ns0, ns1):
            if ns0 is not None:
                new_unet[f"{tag}{i}"] = {
                    "unit0": {"bn": ns0}, "unit1": {"bn": ns1},
                }

        # --- encoder -----------------------------------------------------
        xq = x.astype(dtype).reshape(nb, D, H, W // p0, p0 * cin)
        p = p0
        skips = []  # (tensor, pack_at_capture, channels)
        for i in range(n):
            def enc_block(xq, i=i, p=p):
                y, ns0 = unit("d", i, 0, xq, p, train)
                y, ns1 = unit("d", i, 1, y, p, train)
                return y, (ns0, ns1)

            c2 = i_size * (2 ** i)
            xq, (ns0, ns1) = maybe_remat(enc_block)(xq)
            record("d", i, ns0, ns1)
            skips.append((xq, p, c2))
            xq = _make_pool2_packed(p, c2)(xq)
            p //= 2

        # --- decoder -----------------------------------------------------
        a = xq  # bottleneck: pooled d{n-1} at pack p (= p0 / 2**n)
        a_c = i_size * (2 ** (n - 1))
        b_pair: Optional[Tuple[jax.Array, int]] = None
        for idx in range(n):
            i = n - 1 - idx
            up = params[f"u{idx}"]["upconv"]
            ku = up["kernel"].astype(dtype)
            bu = up["bias"].astype(jnp.float32)

            def dec_block(a, bsk, idx=idx, p=p, a_c=a_c):
                y = _upconv2_packed(
                    a, ku, bu, p,
                    b=bsk, ca=None if bsk is None else a_c,
                )
                y, ns0 = unit("u", idx, 0, y, 2 * p, train)
                y, ns1 = unit("u", idx, 1, y, 2 * p, train)
                return y, (ns0, ns1)

            bsk = None if b_pair is None else b_pair[0]
            a, (ns0, ns1) = maybe_remat(dec_block)(a, bsk)
            record("u", idx, ns0, ns1)
            p *= 2
            a_c = i_size * (2 ** i)
            b_pair = (skips[i][0], skips[i][2])

        # --- head --------------------------------------------------------
        lc = params["last_conv"]
        out = _head_packed(
            a, b_pair[0], lc["kernel"], lc["bias"], p, a_c, b_pair[1],
            head, dtype,
        )
        if not new_unet:
            return out, variables["batch_stats"]
        return out, {**variables["batch_stats"], "unet": new_unet}
