"""TPU inference engine: the U-Net forward as fused Pallas convs + matmuls.

Serving-path counterpart of the flax model zoo: takes a trained variables
tree and emits a jitted whole-volume ``predict`` whose hot ops bypass XLA's
slow thin-channel 3D convolution (see ``ops/pallas/conv3d.py``):

- every Conv3D(k3)+BN+ReLU unit -> one fused Pallas kernel call with
  BN folded into the weights (per-layer W-packing chosen automatically);
- every ConvTranspose(k2, s2) -> an einsum (a non-overlapping stride-2
  transposed conv is a pure matmul) + depth-to-space reshape;
- MaxPool(2) -> reshape + max (no windowed reduce);
- heads/last 1x1 conv -> einsum + elementwise XLA.

Numerics match ``model.apply(variables, x, train=False)`` (equivalence
tests in ``tests/test_engine.py``). Layers whose shapes don't satisfy the
kernel's constraints fall back to the XLA conv transparently.

Supports the generic UNet family (UNetSP / UNetSPSmall / UNetDO /
UNet4b2i3o / UNet5b2i3o / UNet4b1i3o) and the legacy k=5 family
(recAE_v2_fixed / UNet4_2IC) via fused k=5 packed-tap units with a live
center block and softmax head (see ``_build_legacy_predict``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pallas import conv3d as pc

# Structural config per registered model
# (mirrors ctunet/pytorch/models.py:272-387 and 441-557).
ENGINE_CONFIGS: Dict[str, Dict[str, Any]] = {
    "UNet4b2i3o": dict(n_blocks=4, i_size=7, head=None, family="generic"),
    "UNet5b2i3o": dict(n_blocks=5, i_size=4, head=None, family="generic"),
    "UNet4b1i3o": dict(n_blocks=4, i_size=7, head=None, family="generic"),
    "UNetSP": dict(n_blocks=4, i_size=7, head="double", family="generic"),
    "UNetSPSmall": dict(
        n_blocks=5, i_size=4, head="double_softmax", family="generic"
    ),
    "UNetDO": dict(n_blocks=4, i_size=7, head="double", family="generic"),
    "recAE_v2_fixed": dict(n_blocks=4, head=None, family="legacy"),
    "UNet4_2IC": dict(n_blocks=4, head=None, family="legacy"),
}


def supports(model_class: str) -> bool:
    return model_class in ENGINE_CONFIGS


def _batch_unrolled(fwd, images):
    """Apply a per-volume forward over a batch, stacking output trees
    (the shared batching convention of every predict builder)."""
    outs = [fwd(images[i]) for i in range(images.shape[0])]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), np.float32)


class _FusedUnit:
    """One Conv+BN+ReLU unit: packed weights prepared at build time."""

    def __init__(self, unit_vars, unit_stats, interpret: bool,
                 sparse: int = 0):
        w = _np(unit_vars["conv"]["kernel"])  # (3,3,3,Cin,Cout)
        conv_bias = (
            _np(unit_vars["conv"]["bias"])
            if "bias" in unit_vars["conv"]
            else np.zeros(w.shape[-1], np.float32)
        )
        inv, bn_b = pc.fold_bn(
            _np(unit_vars["bn"]["scale"]),
            _np(unit_vars["bn"]["bias"]),
            _np(unit_stats["bn"]["mean"]),
            _np(unit_stats["bn"]["var"]),
        )
        self.w = w
        self.scale = inv
        self.bias = conv_bias * inv + bn_b
        self.k = w.shape[0]
        self.cin = w.shape[3]
        self.cout = w.shape[4]
        self.interpret = interpret
        self.sparse = sparse
        self._packed: Dict[Any, Any] = {}

    def _aug(self, ones_in: bool, ones_out: bool):
        """Weights/scale/bias augmented with the ones-channel convention:
        an extra zero INPUT row (the incoming ones lane is ignored) and/or
        an extra OUTPUT channel with zero weights, scale 1 and bias 1 —
        ReLU regenerates a clean ones field every conv, which fused
        downstream ops use to carry additive terms (upconv bias)."""
        w, scale, bias = self.w, self.scale, self.bias
        if ones_in:
            w = np.concatenate(
                [w, np.zeros(w.shape[:3] + (1, w.shape[4]), np.float32)], 3
            )
        if ones_out:
            w = np.concatenate(
                [w, np.zeros(w.shape[:4] + (1,), np.float32)], 4
            )
            scale = np.concatenate([scale, np.ones(1, np.float32)])
            bias = np.concatenate([bias, np.ones(1, np.float32)])
        return w, scale, bias

    def _get_packed(self, pack: int, ones_in: bool = False,
                    ones_out: bool = False):
        key = (pack, ones_in, ones_out)
        if key not in self._packed:
            w, scale, bias = self._aug(ones_in, ones_out)
            # This fills lazily, possibly at first TRACE time (e.g. the
            # engine predict traced inside an outer jit, as sliding-window
            # patching does). Under JAX's stackless tracing jnp.asarray is
            # STAGED there — caching the result would poison the cache
            # with a trace-local tracer and crash the next trace with
            # UnexpectedTracerError. Force compile-time eval so the cache
            # always holds concrete, trace-reusable constants.
            with jax.ensure_compile_time_eval():
                self._packed[key] = (
                    jnp.asarray(pc.pack_weights(w, pack, scale)),
                    jnp.asarray(pc.pack_bias(bias, pack)),
                )
        return self._packed[key]

    def _get_packed_split(self, pack: int, ones_in: bool = False,
                          ones_out: bool = False):
        """Split-tap weight pack (``pc.pack_weights_split``): 9 main + 3
        correction matrices — the dots-per-conv restructure that removes
        the W-packing's structural-zero MACs (k=3 only)."""
        key = (pack, ones_in, ones_out, "split")
        if key not in self._packed:
            w, scale, bias = self._aug(ones_in, ones_out)
            with jax.ensure_compile_time_eval():
                wm, wc = pc.pack_weights_split(w, pack, scale)
                self._packed[key] = (
                    jnp.asarray(wm),
                    jnp.asarray(wc),
                    jnp.asarray(pc.pack_bias(bias, pack)),
                )
        return self._packed[key]

    def __call__(self, x: jax.Array) -> jax.Array:
        ww = x.shape[2]
        try:
            pack = pc.choose_pack(ww, self.cin, k=self.k)
            pw, pb = self._get_packed(pack)
            out = pc.conv3d_fused(
                x, pw, pb, pack, k=self.k, relu=True,
                interpret=self.interpret, out_dtype=x.dtype,
            )
            return pc.unpack_output(out, pack, self.cout)
        except (ValueError, AssertionError):
            return self._xla(x)

    def call_chain(self, xc: jax.Array, pack: int, hh: int, wp: int,
                   ones_in: bool = False,
                   ones_out: bool = False) -> jax.Array:
        """Chained-flat path: consume AND produce the canonical flat layout
        (``ops/pallas/conv3d.py`` chained kernel) — no XLA glue between
        chained convs. Falls back to from_chain -> XLA conv -> to_chain
        when the kernel's tiling constraints don't hold for the shape.
        ``ones_in``/``ones_out``: the ones-channel convention (see _aug)."""
        try:
            if self.k == 3 and not self.sparse:
                # split-tap form with MXU-permutation gather: 18 tile-row
                # units/step vs 27 (bit-identical math, f32-accumulation
                # order aside; measured 4.47 vs 5.71 ms on the full-res
                # hot conv)
                wm, wc, pb = self._get_packed_split(pack, ones_in, ones_out)
                return pc.conv3d_chain_split(
                    xc, wm, wc, pb, hh, wp, pack,
                    self.cin + (1 if ones_in else 0),
                    relu=True, interpret=self.interpret,
                    out_dtype=xc.dtype,
                )
            pw, pb = self._get_packed(pack, ones_in, ones_out)
            return pc.conv3d_chain(
                xc, pw, pb, hh, wp, relu=True, interpret=self.interpret,
                out_dtype=xc.dtype, sparse_gh=self.sparse,
            )
        except (ValueError, AssertionError):
            cin = self.cin + (1 if ones_in else 0)
            std = pc.unpack_output(
                pc.from_chain(xc, hh, wp, pack * cin), pack, cin
            )
            out = self._xla(std[..., : self.cin])
            if ones_out:
                out = jnp.concatenate(
                    [out, jnp.ones_like(out[..., :1])], -1
                )
            d_, h_, w_, co = out.shape
            return pc.to_chain(out.reshape(d_, h_, w_ // pack, pack * co),
                               pack)

    def call_packed(self, x_packed: jax.Array, pack: int) -> jax.Array:
        """Packed-resident path: (D, H, W/pack, >=pack*Cin) in, packed out.

        Falls back to unpack -> XLA conv -> repack when the kernel's shape
        constraints don't hold (the repack is a pure reshape).
        """
        try:
            pw, pb = self._get_packed(pack)
            return pc.conv3d_fused(
                x_packed, pw, pb, pack, k=self.k, relu=True,
                interpret=self.interpret, out_dtype=x_packed.dtype,
                packed_in=True,
            )
        except (ValueError, AssertionError):
            std = pc.unpack_output(x_packed, pack, self.cin)
            out = self._xla(std)
            d, hh, ww, co = out.shape
            out = out.reshape(d, hh, ww // pack, pack * co)
            padc = pc._round_up(pack * co, pc.LANE) - pack * co
            if padc:
                out = jnp.pad(out, ((0, 0),) * 3 + ((0, padc),))
            return out

    def _xla(self, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x[None],
            jnp.asarray(self.w * self.scale[None, None, None, None, :],
                        x.dtype),
            (1, 1, 1),
            "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )[0]
        return jnp.maximum(y + jnp.asarray(self.bias), 0.0).astype(x.dtype)


def _conv_transpose_k2s2(x: jax.Array, kernel: jax.Array,
                         bias: jax.Array) -> jax.Array:
    """Non-overlapping stride-2 transposed conv as einsum + depth-to-space.

    ``kernel``: flax transpose_kernel=True layout (2,2,2,O,I) as stored by
    the model zoo (torch ConvTranspose3d parity). With stride == kernel
    size the output decomposes exactly: out[2z+a, 2y+b, 2x+c, o] =
    sum_i x[z,y,x,i] * k[a, b, c, o, i] (verified against
    nn.ConvTranspose(transpose_kernel=True) — NO spatial flip; the flip in
    gradient-of-conv semantics cancels against flax's kernel flip).
    """
    k = kernel.astype(x.dtype)
    y = jnp.einsum("zyxi,abcoi->zaybxco", x, k)
    d, _, hh, _, ww, _, co = y.shape
    y = y.reshape(d * 2, hh * 2, ww * 2, co)
    return (y + bias.astype(x.dtype)).astype(x.dtype)


def _maxpool2(x: jax.Array) -> jax.Array:
    d, hh, ww, c = x.shape
    x = x.reshape(d // 2, 2, hh // 2, 2, ww // 2, 2, c)
    return x.max(axis=(1, 3, 5))


def _maxpool2_packed(x: jax.Array, pack: int, cout: int) -> jax.Array:
    """MaxPool(2) on a packed (D, H, W/pack, >=pack*C) tensor.

    W-pairs are adjacent packed positions, i.e. a channel-minor reshape —
    no windowed reduce and no unpacking. Returns the pooled volume packed
    by ``pack//2`` on the SAME W/pack grid (W halves, pack halves).
    """
    d, hh, wp, _ = x.shape
    x = x[..., : pack * cout]
    x = x.reshape(d, hh, wp, pack // 2, 2, cout).max(axis=4)
    x = x.reshape(d // 2, 2, hh // 2, 2, wp, (pack // 2) * cout).max(
        axis=(1, 3)
    )
    return x




def build_predict(
    model_class: str,
    variables: Dict[str, Any],
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    halo_fn=None,
    jit: bool = True,
    sparse: int = 0,
):
    """Build a jitted ``predict(images)`` for (B, D, H, W, C) inputs.

    ``variables``: {'params', 'batch_stats'} as produced by the model zoo /
    checkpoint load / torch port.

    ``halo_fn``: optional hook applied to every produced chained tensor —
    used by :func:`build_sharded_predict` to refresh depth-halo planes from
    neighbor shards over ICI when one volume is sharded across chips.

    ``sparse``: constant-region short-circuit group height for the chain
    convs (0 off, -1 auto) — bit-exact skip of row-constant groups; see
    ``ops/pallas/conv3d._chain_kernel_ring``.
    """
    cfg = ENGINE_CONFIGS[model_class]
    if cfg["family"] == "legacy":
        return _build_legacy_predict(
            cfg, variables, compute_dtype, interpret, jit=jit
        )
    n_blocks = cfg["n_blocks"]
    params = variables["params"]["unet"]
    stats = variables["batch_stats"]["unet"]

    d_units = [
        [
            _FusedUnit(
                params[f"d{i}"][f"unit{j}"], stats[f"d{i}"][f"unit{j}"],
                interpret, sparse=sparse,
            )
            for j in range(2)
        ]
        for i in range(n_blocks)
    ]
    u_units = [
        [
            _FusedUnit(
                params[f"u{i}"][f"unit{j}"], stats[f"u{i}"][f"unit{j}"],
                interpret, sparse=sparse,
            )
            for j in range(2)
        ]
        for i in range(n_blocks)
    ]
    up_raw = [
        (
            _np(params[f"u{i}"]["upconv"]["kernel"]),
            _np(params[f"u{i}"]["upconv"]["bias"]),
        )
        for i in range(n_blocks)
    ]
    up_kernels = [
        (jnp.asarray(kk), jnp.asarray(bb)) for kk, bb in up_raw
    ]
    # Precomputed matmul matrices for the Pallas convT kernels (split into
    # (prev-output, skip) operands where the input is a weight-split concat).
    from .ops.pallas import convt as pct

    up_mats = []
    for idx in range(n_blocks):
        kk, bb = up_raw[idx]
        if idx == 0:  # bottleneck input: no weight split
            m, pb = pct.build_matrices(kk, bb)
            up_mats.append(((jnp.asarray(m), jnp.asarray(pb)), None))
        else:  # input is cat(prev u-block output, encoder skip)
            ca = u_units[idx - 1][1].cout
            m_a, pb = pct.build_matrices(kk[..., :ca], bb)
            m_b, pb0 = pct.build_matrices(kk[..., ca:], np.zeros_like(bb))
            up_mats.append(
                (
                    (jnp.asarray(m_a), jnp.asarray(pb)),
                    (jnp.asarray(m_b), jnp.asarray(pb0)),
                )
            )

    # Composite upsample+conv matrices (fused ConvT o conv0; see
    # ops/pallas/upconv.py), built lazily per input pack. The convT bias
    # rides the operands' ones channel; conv0's BN fold and its own
    # ones-output regeneration are baked in.
    from .ops.pallas import upconv as uc

    _upconv_mats: Dict[Any, Any] = {}

    def _get_upconv_mats(idx: int, pa: int):
        key = (idx, pa)
        if key not in _upconv_mats:
            # Like _FusedUnit._get_packed: this may fill at TRACE time
            # (first trace inside an outer jit); the cache must hold
            # concrete constants, not trace-local tracers.
            return _fill_upconv_mats(key, idx, pa)
        return _upconv_mats[key]

    def _fill_upconv_mats(key, idx: int, pa: int):
        with jax.ensure_compile_time_eval():
            kk, bb = up_raw[idx]
            ca = None if idx == 0 else u_units[idx - 1][1].cout
            kT_aug, ci_split = uc.augment_upconv_kernel(kk, bb, ca)
            unit0 = u_units[idx][0]
            w0a, s0a, b0a = unit0._aug(False, True)
            R = uc.composite_response(kT_aug, w0a, s0a)
            # split-tap form (8 main + 2 correction dots per parity pair
            # instead of 24) — same restructure as _get_packed_split
            sa, sb = uc.build_upconv_matrices_split(R, pa, ci_split)
            cin_aug = kT_aug.shape[-1]
            cw_a = cin_aug if ci_split is None else ci_split
            cw_b = 0 if ci_split is None else cin_aug - ci_split
            _upconv_mats[key] = (
                (jnp.asarray(sa[0]), jnp.asarray(sa[1])),
                None if sb is None else
                (jnp.asarray(sb[0]), jnp.asarray(sb[1])),
                jnp.asarray(uc.pack_out_bias(b0a, 2 * pa)),
                cw_a,
                cw_b,
            )
        return _upconv_mats[key]

    lc_k = jnp.asarray(_np(params["last_conv"]["kernel"]))  # (1,1,1,I,O)
    lc_b = jnp.asarray(_np(params["last_conv"]["bias"]))

    head = cfg["head"]

    def _head(a: jax.Array, b: jax.Array):
        ca = a.shape[-1]
        lk = lc_k[0, 0, 0].astype(a.dtype)
        out = (
            jnp.einsum("zyxi,io->zyxo", a, lk[:ca])
            + jnp.einsum("zyxi,io->zyxo", b, lk[ca:])
            + lc_b.astype(a.dtype)
        )
        out = jax.nn.sigmoid(out.astype(jnp.float32)).astype(compute_dtype)

        if head is None:
            return out
        backg = out[..., 0:1]
        flap = out[..., 1:2]
        fullsk = out[..., 2:3]
        full = jnp.concatenate([backg, flap + fullsk], axis=-1)
        fl = jnp.concatenate([1.0 - flap, flap], axis=-1)
        if head == "double_softmax":
            return (
                jax.nn.softmax(full.astype(jnp.float32), axis=-1),
                jax.nn.softmax(fl.astype(jnp.float32), axis=-1),
            )
        return full, fl

    # Constant head matrices in PACKED lane space (block-diag via kron):
    # consuming the packed layout directly avoids the unpack slices + layout
    # copies at full resolution (~5 ms/volume). Operand lane strides include
    # the ones channel (zero head row).
    _head_mats: Dict[Any, Any] = {}

    def _get_head_mats(pa: int, ca: int, cb: int):
        key = (pa, ca, cb)
        if key not in _head_mats:
            # Trace-time fill (see _get_packed): keep the cache concrete.
            return _fill_head_mats(key, pa, ca, cb)
        return _head_mats[key]

    def _fill_head_mats(key, pa: int, ca: int, cb: int):
        with jax.ensure_compile_time_eval():
            eye = np.eye(pa, dtype=np.float32)
            lk = _np(lc_k)[0, 0, 0]  # (ca+cb, 3)
            zrow = np.zeros((1, lk.shape[1]), np.float32)
            m_a = np.kron(eye, np.concatenate([lk[:ca], zrow]))
            m_b = np.kron(eye, np.concatenate([lk[ca: ca + cb], zrow]))
            bias3 = np.tile(_np(lc_b), pa)
            m_full = np.kron(eye, np.asarray(
                [[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]], np.float32))
            m_flap = np.kron(eye, np.asarray(
                [[0.0, 0.0], [-1.0, 1.0], [0.0, 0.0]], np.float32))
            b_flap = np.tile(np.asarray([1.0, 0.0], np.float32), pa)
            _head_mats[key] = tuple(
                jnp.asarray(m) for m in
                (m_a, m_b, bias3, m_full, m_flap, b_flap)
            )
        return _head_mats[key]

    def _head_packed(apk, bpk, pa: int, ca: int, cb: int, hh: int,
                     ww: int):
        """Head math on std-PACKED operands (D, H, wp, pa*(C+1)): the
        channel splits/concats become block-diagonal matmuls; the final
        unpack to (D, H, W, 2) is a pure reshape."""
        m_a, m_b, bias3, m_full, m_flap, b_flap = _get_head_mats(pa, ca, cb)
        dt = apk.dtype
        lc = (
            apk @ m_a.astype(dt) + bpk @ m_b.astype(dt) + bias3.astype(dt)
        )
        out = jax.nn.sigmoid(lc.astype(jnp.float32))
        if head is None:
            d_, h_, wp_ = out.shape[:3]
            return out.astype(compute_dtype).reshape(d_, h_, ww, 3)
        full = out @ m_full
        fl = out @ m_flap + b_flap
        d_, h_, wp_ = full.shape[:3]
        full = full.reshape(d_, h_, ww, 2)
        fl = fl.reshape(d_, h_, ww, 2)
        if head == "double_softmax":
            return jax.nn.softmax(full, -1), jax.nn.softmax(fl, -1)
        return full.astype(compute_dtype), fl.astype(compute_dtype)

    def _upsample(idx, a, b):
        """ConvT(k2,s2) of cat(a, b) -> standard (2D, 2H, 2W, Co)."""
        ker, kb = up_kernels[idx]
        co_t = ker.shape[3]
        if a.shape[2] % 8 == 0:
            # Fused Pallas convT (+ depth-to-space via pure reshape); the
            # dual variant folds the weight-split add of the skip operand
            # into the same kernel (one launch, no full-res XLA add).
            (m_a, pb_a), mb = up_mats[idx]
            if b is None:
                out2 = pct.conv_transpose_k2s2(
                    a, m_a, pb_a, interpret=interpret
                )
            else:
                out2 = pct.conv_transpose_k2s2_dual(
                    a, b, m_a, mb[0], pb_a, interpret=interpret
                )
            return pct.unpack2(out2, co_t)
        if b is None:
            return _conv_transpose_k2s2(a, ker, kb)
        ca = a.shape[-1]
        return _conv_transpose_k2s2(
            a, ker[..., :ca], kb
        ) + _conv_transpose_k2s2(b, ker[..., ca:], jnp.zeros_like(kb))

    def forward_one(x: jax.Array):
        """Chained-flat forward: the WHOLE U-Net body runs in one canonical
        flat layout — fused convs, fused pooling, and the fused
        upsample+conv (ConvT o conv composed into one 2-tap/dim kernel at
        HALF-resolution inputs) all read and write it with halo zeros
        maintained in-kernel. A constant ones channel rides every tensor
        (regenerated by each conv's bias lane) to carry the convT bias
        through the composition; skip concats are never materialized
        (weight-split sums); XLA touches the data only at entry and the
        head."""
        x = x.astype(compute_dtype)
        d, hh, ww, cin0 = x.shape
        H = halo_fn if halo_fn is not None else (lambda t: t)
        x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], -1)

        # --- encoder (chained) ---
        # Pack 16 is the sweet spot: pack 32 was measured 1.65x SLOWER at
        # 224x512x512 (lane padding: i_size=4 channel counts round up to
        # two 128-lane blocks in both matmul operands at pack 32 —
        # BASELINE.md round 4). 5-block models instead run the exhausted
        # tail at pack 1 with one standard-space pool and a decoder repack.
        p = pc.choose_pack(ww, cin0 + 1)
        xp = x.reshape(d, hh, ww // p, p * (cin0 + 1))
        skips = []
        dd, dh, dwp = d, hh, ww // p
        xc = H(pc.to_chain(xp, p))
        for i in range(n_blocks):
            xc = H(d_units[i][0].call_chain(
                xc, p, dh, dwp, ones_in=True, ones_out=True))
            xc = H(d_units[i][1].call_chain(
                xc, p, dh, dwp, ones_in=True, ones_out=True))
            cout = d_units[i][1].cout
            skips.append((xc, p, cout, dh, dwp))
            if p >= 2 and dd % 2 == 0 and dh % 2 == 0:
                xc = H(pc.maxpool2_chain(
                    xc, dh, dwp, p, cout + 1, interpret=interpret
                ))
                p //= 2
            else:  # pack exhausted: pool in standard space (W halves)
                xp = pc.from_chain(xc, dh, dwp, p * (cout + 1))
                xp = _maxpool2(xp) if p == 1 else _maxpool2(
                    pc.unpack_output(xp, p, cout + 1)
                )
                p = 1
                dwp = xp.shape[2]
                xc = H(pc.to_chain(xp, p))
            dd, dh = dd // 2, dh // 2

        # --- decoder (all-chained, upsample+conv fused) ---
        a_chain, ap, a_cout, b = xc, p, d_units[-1][1].cout, None
        for idx in range(n_blocks):
            i = n_blocks - 1 - idx
            sk = skips[i]
            if (
                b is not None
                and (b[1] != ap or b[4] != dwp)
                and b[3] == dh
                and b[1] * b[4] == ap * dwp
            ):
                # Same W, different (pack, wp) split — the pack-exhausted
                # tail's standard-space pool halved wp, so the upconv's
                # pack doubling overshot the skips' ladder by 2x. One
                # contiguous repack re-aligns; every later level then
                # rides the skips' efficient packs.
                a_chain = pc.repack_chain(
                    a_chain, dh, dwp, ap, a_cout + 1, b[1]
                )
                ap, dwp = b[1], b[4]
            chainable = b is None or (
                b[1] == ap and b[4] == dwp and b[3] == dh
            )
            if chainable:
                sa, sb, pbias2, cw_a, cw_b = _get_upconv_mats(idx, ap)
                b_c = b[0] if b is not None else None
                a_chain = H(uc.upconv_fused_chain_split(
                    a_chain, sa, pbias2, dh, dwp, ap, cw_a,
                    b_chain=b_c, split_b=sb, cw_b=cw_b,
                    interpret=interpret,
                ))
                ap *= 2
                dd, dh = dd * 2, dh * 2
            else:  # mixed packs (e.g. after a standard-space pool)
                a = pc.unpack_output(
                    pc.from_chain(a_chain, dh, dwp, ap * (a_cout + 1)),
                    ap, a_cout + 1,
                )[..., :a_cout]
                b_std = None
                if b is not None:
                    bc, bp, bco, bdh, bdwp = b
                    b_std = pc.unpack_output(
                        pc.from_chain(bc, bdh, bdwp, bp * (bco + 1)),
                        bp, bco + 1,
                    )[..., :bco]
                up = _upsample(idx, a, b_std)
                cin_u = u_units[idx][0].cin
                ap = pc.choose_pack(up.shape[2], cin_u + 1)
                dd, dh, dwp = up.shape[0], up.shape[1], up.shape[2] // ap
                up = jnp.concatenate([up, jnp.ones_like(up[..., :1])], -1)
                a_chain = H(pc.to_chain(
                    up.reshape(dd, dh, dwp, ap * up.shape[3]), ap
                ))
                a_chain = H(u_units[idx][0].call_chain(
                    a_chain, ap, dh, dwp, ones_in=True, ones_out=True))
            a_chain = H(u_units[idx][1].call_chain(
                a_chain, ap, dh, dwp, ones_in=True, ones_out=True))
            a_cout = u_units[idx][1].cout
            b = sk

        apk = pc.from_chain(a_chain, dh, dwp, ap * (a_cout + 1))
        bc, bp, bco, bdh, bdwp = b
        bpk = pc.from_chain(bc, bdh, bdwp, bp * (bco + 1))
        if bp == ap and (bdh, bdwp) == (dh, dwp):
            return _head_packed(apk, bpk, ap, a_cout, bco, dh, dwp * ap)
        return _head(
            pc.unpack_output(apk, ap, a_cout + 1)[..., :a_cout],
            pc.unpack_output(bpk, bp, bco + 1)[..., :bco],
        )

    if not jit:
        return forward_one

    @jax.jit
    def predict(images: jax.Array):
        return _batch_unrolled(forward_one, images)

    return predict


def build_sharded_predict(
    model_class: str,
    variables: Dict[str, Any],
    mesh,
    axis: str = "spatial",
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused-engine inference with ONE volume's depth sharded over ``axis``.

    Each device runs the chained-kernel engine on its depth shard; the
    chained layout's explicit halo planes are refreshed from neighbor
    shards over ICI (``parallel.halo.chain_halo_exchange``) after every
    kernel — serving volumes beyond a single chip's HBM through the fast
    path (the conv analog of ring attention; SURVEY.md §5 long-context).

    Returns ``predict(images)`` for (B, D, H, W, C); D must divide by
    ``axis_size * 2**n_blocks``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .parallel.halo import make_halo_fn

    if ENGINE_CONFIGS[model_class]["family"] != "generic":
        # Documented scope limit (README "Serving" / PARITY.md): the
        # depth-sharded fast path rides the chained layout's explicit
        # halo planes, which the legacy k=5 family doesn't use. Legacy
        # models still serve single-chip (build_predict) and batch-DP
        # (build_dp_predict); beyond-HBM legacy volumes use the
        # sliding-window fallback.
        raise NotImplementedError(
            f"sharded engine supports the generic UNet family only, not "
            f"'{model_class}' (the legacy path has no chained layout; "
            f"use build_dp_predict or sliding-window patching)"
        )
    n = mesh.shape[axis]
    halo_fn = make_halo_fn(axis, n)
    fwd = build_predict(
        model_class, variables, compute_dtype=compute_dtype,
        interpret=interpret, halo_fn=halo_fn, jit=False,
    )
    n_blocks = ENGINE_CONFIGS[model_class]["n_blocks"]

    spec_in = P(None, axis)  # (B, D, H, W, C): shard depth
    spec_out = P(None, axis)

    sharded = shard_map(
        lambda images: _batch_unrolled(fwd, images), mesh=mesh,
        in_specs=(spec_in,), out_specs=spec_out,
        check_vma=False,
    )

    @jax.jit
    def predict(images: jax.Array):
        d = images.shape[1]
        assert d % (n * (2 ** n_blocks)) == 0, (
            f"depth {d} must divide by shards*pool-multiple "
            f"{n * 2 ** n_blocks}"
        )
        return sharded(images)

    return predict


def build_dp_predict(
    model_class: str,
    variables: Dict[str, Any],
    mesh,
    axis: str = "data",
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    int8_calib: Optional[jax.Array] = None,
):
    """Batch-data-parallel engine serving: each device runs the full
    chained engine on its own volumes — serving THROUGHPUT scales with the
    ``axis`` size (the TPU-native replacement for scaling out the
    reference's one-GPU test loop; SURVEY.md §2 parallelism table). No
    collectives are needed: volumes are independent, so XLA SPMD just
    partitions the batch.

    ``int8_calib``: optional (D, H, W, C) calibration volume — serves the
    quantized engine per shard (``engine_q.build_predict_q``; generic
    family only — with a legacy model it raises that builder's
    ValueError). Both engine families (generic chained + legacy k=5)
    support the bf16 DP path.

    Returns ``predict(images)`` for (B, D, H, W, C) with B divisible by
    the axis size; inputs may be host arrays (they are placed with a
    batch sharding on entry).
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    if int8_calib is not None:
        from . import engine_q

        fwd = engine_q.build_predict_q(
            model_class, variables, int8_calib,
            compute_dtype=compute_dtype, interpret=interpret, jit=False,
        )
    else:
        fwd = build_predict(
            model_class, variables, compute_dtype=compute_dtype,
            interpret=interpret, jit=False,
        )

    sharded = shard_map(
        lambda images: _batch_unrolled(fwd, images), mesh=mesh,
        in_specs=(P(axis),), out_specs=P(axis),
        check_vma=False,
    )
    n = mesh.shape[axis]
    in_sharding = NamedSharding(mesh, P(axis))

    @jax.jit
    def predict(images: jax.Array):
        assert images.shape[0] % n == 0, (
            f"batch {images.shape[0]} must divide by {n} '{axis}' devices"
        )
        return sharded(jax.lax.with_sharding_constraint(
            images, in_sharding
        ))

    return predict


def _build_legacy_predict(cfg, variables, compute_dtype, interpret,
                          jit: bool = True):
    """Legacy ``recAE_v2_fixed`` family (``models.py:441-538``): k=5 biased
    convs, live center block, softmax head — via the k=5 packed-tap kernel.

    ``jit=False`` returns the raw per-volume ``forward_one`` (same
    convention as the generic builder) so it can ride ``shard_map`` in
    :func:`build_dp_predict`.
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    def units(name):
        return [
            _FusedUnit(params[name][f"unit{j}"], stats[name][f"unit{j}"],
                       interpret)
            for j in range(2)
        ]

    d_units = [units(f"dblock{i + 1}") for i in range(4)]
    c_units = units("cblock_center")
    u_units = [units(f"ublock{i + 1}") for i in range(4)]
    up_kernels = [
        (
            jnp.asarray(_np(params[f"ublock{i + 1}"]["upconv"]["kernel"])),
            jnp.asarray(_np(params[f"ublock{i + 1}"]["upconv"]["bias"])),
        )
        for i in range(4)
    ]
    lc_k = jnp.asarray(_np(params["last_conv"]["kernel"]))
    lc_b = jnp.asarray(_np(params["last_conv"]["bias"]))

    def forward_one(x):
        x = x.astype(compute_dtype)
        skips = []
        for i in range(4):
            x = d_units[i][0](x)
            x = d_units[i][1](x)
            skips.append(x)
            x = _maxpool2(x)
        x = c_units[0](x)
        x = c_units[1](x)
        for i in range(4):
            ker, b = up_kernels[i]
            x = _conv_transpose_k2s2(x, ker, b)
            x = u_units[i][0](x)
            x = u_units[i][1](x)
            x = jnp.concatenate([x, skips[3 - i]], axis=-1)
        out = (
            jnp.einsum("zyxi,io->zyxo", x, lc_k[0, 0, 0].astype(x.dtype))
            + lc_b.astype(x.dtype)
        )
        return jax.nn.softmax(out.astype(jnp.float32), axis=-1).astype(
            compute_dtype
        )

    if not jit:
        return forward_one

    @jax.jit
    def predict(images: jax.Array):
        return _batch_unrolled(forward_one, images)

    return predict
