"""int8 quantized serving kernels: exact-integer correctness.

The quantized chain conv (``conv3d_chain_q``) computes
``q_out = round(clamp(relu(acc * scale + bias), 0, 127))`` with int8
operands and int32 MXU accumulation. Integer products are exact, so the
kernel must match a float emulation bit-for-bit (interpret mode, CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops.pallas import conv3d as pc

# heavyweight (CPU-interpret / e2e): full-suite lane only
pytestmark = pytest.mark.slow


def _emulate_q(x_int, w_int, scale, bias, relu=True):
    """Float emulation of the quantized conv (exact for these magnitudes)."""
    acc = jax.lax.conv_general_dilated(
        x_int[None].astype(jnp.float32),
        jnp.asarray(w_int, jnp.float32),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    res = acc * scale[None, None, None, :] + bias[None, None, None, :]
    if relu:
        res = jnp.maximum(res, 0.0)
    res = jnp.minimum(res, 127.0)
    return np.asarray(jnp.round(res), np.int8)


@pytest.mark.parametrize("pack,cin,cout", [(2, 3, 5), (4, 2, 7), (2, 7, 7)])
def test_chain_q_matches_integer_emulation(rng, pack, cin, cout):
    d, hh, ww = 6, 8, 16
    wp = ww // pack
    x = rng.integers(0, 90, (d, hh, ww, cin)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 3, cin, cout)).astype(np.int8)
    scale = (rng.random(cout) * 2e-3 + 1e-4).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32) * 3.0

    pw = pc.pack_weights(w.astype(np.float32), pack)
    assert np.abs(pw).max() <= 127
    pw8 = jnp.asarray(pw.astype(np.int8))
    ps = jnp.asarray(pc.pack_bias(scale, pack))
    pb = jnp.asarray(pc.pack_bias(bias, pack))

    xq = jnp.asarray(x.reshape(d, hh, wp, pack * cin))
    xc = pc.to_chain(xq, pack)
    out_c = pc.conv3d_chain_q(xc, pw8, ps, pb, hh, wp, interpret=True)
    out = pc.unpack_output(
        pc.from_chain(out_c, hh, wp, pack * cout), pack, cout
    )
    want = _emulate_q(jnp.asarray(x), w, jnp.asarray(scale),
                      jnp.asarray(bias))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_chain_q_borders_zero(rng):
    """Output halo planes/rows/cols must be exactly zero (int8 zero ==
    quantized zero under symmetric quantization)."""
    pack, cin, cout = 2, 3, 4
    d, hh, ww = 4, 8, 8
    wp = ww // pack
    x = rng.integers(0, 90, (d, hh, ww, cin)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 3, cin, cout)).astype(np.int8)
    pw8 = jnp.asarray(pc.pack_weights(w.astype(np.float32), pack).astype(np.int8))
    ps = jnp.asarray(pc.pack_bias(np.full(cout, 1e-3, np.float32), pack))
    pb = jnp.asarray(pc.pack_bias(np.ones(cout, np.float32), pack))
    xc = pc.to_chain(jnp.asarray(x.reshape(d, hh, wp, pack * cin)), pack)
    out_c = np.asarray(
        pc.conv3d_chain_q(xc, pw8, ps, pb, hh, wp, interpret=True)
    )
    wpad = out_c.shape[1] // (hh + 2)
    grid = out_c.reshape(d + 2, hh + 2, wpad, -1)
    assert (grid[0] == 0).all() and (grid[-1] == 0).all()
    assert (grid[:, 0] == 0).all() and (grid[:, -1] == 0).all()
    assert (grid[:, :, wp:] == 0).all()


def test_int8_engine_close_to_bf16_engine(rng):
    """End-to-end: calibrated int8 engine vs the f32 engine on UNetSP.

    Quantization noise must stay small both in probabilities and — the
    serving contract — in the argmax masks."""
    from ctunet_tpu import engine, engine_q
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    stats = jax.tree.map(
        lambda s: s * (1.0 + 0.1 * jax.random.uniform(
            jax.random.key(1), s.shape
        )) + 0.01,
        vs["batch_stats"],
    )
    vs = {"params": vs["params"], "batch_stats": stats}

    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))
    want = engine.build_predict(
        "UNetSP", vs, compute_dtype=jnp.float32, interpret=True
    )(x)
    predict_q = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True
    )
    got = predict_q(x)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        assert float(w.std()) > 1e-3  # non-vacuous
        assert np.abs(g - w).mean() < 0.02, np.abs(g - w).mean()
        # Random (untrained) weights keep sigmoids near 0.5 where argmax is
        # a coin flip on quantization noise — 99% is strong agreement here;
        # TRAINED-checkpoint mask parity is gated in tools/parity_check.py.
        agree = (g.argmax(-1) == w.argmax(-1)).mean()
        assert agree > 0.99, agree


def test_int8_engine_import_scales_identical(rng):
    """Rebuilding with ``import_scales`` (the export dict fed back) skips
    the calibration forward and produces a BIT-IDENTICAL engine."""
    from ctunet_tpu import engine_q
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))

    scales: dict = {}
    pq = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        export_scales=scales,
    )
    want = pq(x)
    pq_imp = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        import_scales=scales,
    )
    got = pq_imp(x)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(
            np.asarray(g, np.float32), np.asarray(w, np.float32)
        )


def test_int8_engine_quantile_calibration(rng):
    """Clipped (quantile) calibration builds and stays close to the
    max-calibrated engine on well-behaved activations (outlier clipping
    only diverges when outliers exist)."""
    from ctunet_tpu import engine_q
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.6).astype(np.float32))
    pq_max = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True
    )
    pq_clip = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        calib_quantile=0.999,
    )
    a = pq_max(x)
    b = pq_clip(x)
    for ga, gb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        ga = np.asarray(ga, np.float32)
        gb = np.asarray(gb, np.float32)
        assert np.mean(np.abs(ga - gb)) < 0.03
        assert np.mean(np.argmax(ga, -1) == np.argmax(gb, -1)) > 0.99


def test_int8_engine_rejects_unchainable():
    """Shapes outside the plan must raise (callers fall back to the bf16
    engine): an odd H at a pool level is unplannable. The static plan
    rejects this before calibration, so params from a valid shape
    suffice."""
    from ctunet_tpu import engine_q
    from ctunet_tpu.models import build_model

    m = build_model(
        "UNetSPSmall", compute_dtype="float32", use_checkpoint=False
    )
    x0 = jnp.zeros((1, 32, 32, 32, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    with pytest.raises(ValueError, match="chainable"):
        engine_q.build_predict_q(
            "UNetSPSmall", vs, jnp.zeros((32, 24, 32, 2), jnp.float32),
            compute_dtype=jnp.float32, interpret=True,
        )


def test_int8_engine_spsmall_exhausted_tail(rng):
    """5-block UNetSPSmall at pack 16: level 4 exhausts the pack, taking
    the standard-space int8 pool + decoder repack path — the quantized
    224x512x512 serving regime, at test size. int8 masks must match the
    bf16 engine's argmax on a skull-like input."""
    from ctunet_tpu import engine, engine_q
    from ctunet_tpu.models import build_model

    shape = (32, 32, 32)
    m = build_model(
        "UNetSPSmall", compute_dtype="float32", use_checkpoint=False
    )
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    x = jnp.asarray(
        (rng.random((1, *shape, 2)) > 0.7).astype(np.float32)
    )
    predict = engine.build_predict(
        "UNetSPSmall", vs, compute_dtype=jnp.float32, interpret=True
    )
    predict_q = engine_q.build_predict_q(
        "UNetSPSmall", vs, x[0], compute_dtype=jnp.float32, interpret=True
    )
    want = predict(x)
    got = predict_q(x)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        g, w = np.asarray(g, np.float32), np.asarray(w, np.float32)
        # probabilities close; argmax masks near-identical
        assert np.mean(np.abs(g - w)) < 0.02
        assert np.mean(
            np.argmax(g, -1) == np.argmax(w, -1)
        ) > 0.995


def test_quant_sim_calibrate_and_evaluate(rng):
    """The TPU-free PTQ evaluation stack: simulate_scales matches the
    engine's exported calibration, return_outputs' float head matches
    the real model forward, and apply_opt evaluation of fixed overrides
    on fresh inputs does not regress vs RTN."""
    from ctunet_tpu import engine_q, quant_opt
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))
    x2 = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))

    # (1) simulator calibration == engine calibration (f32 engine)
    scales: dict = {}
    engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        export_scales=scales, jit=False,
    )
    sim_scales = quant_opt.simulate_scales("UNetSP", vs, np.asarray(x))
    assert set(sim_scales) == set(scales)
    for t in scales:
        a = scales[t][1] if isinstance(scales[t], tuple) else scales[t]
        b = (sim_scales[t][1] if isinstance(sim_scales[t], tuple)
             else sim_scales[t])
        # engine calibration flows through the fused kernels (different
        # f32 summation order than the sim's plain conv); the drift
        # compounds with depth — a few % is calibration-insignificant
        # (scales quantize to 8 bits of range)
        np.testing.assert_allclose(b, a, rtol=3e-2, atol=1e-7, err_msg=t)

    # (2) return_outputs: float path == the real model forward
    _, out_f, out_rtn = quant_opt.optimize_rounding(
        "UNetSP", vs, np.asarray(x, np.float32), sim_scales,
        tags=set(), return_outputs=True,
    )
    want = m.apply(vs, x, False)
    for a, b in zip(jax.tree.leaves(out_f), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b, np.float32), atol=2e-4
        )

    # (3) optimize on x, evaluate with apply_opt on fresh x2
    ropt = quant_opt.optimize_rounding(
        "UNetSP", vs, np.asarray(x, np.float32), sim_scales,
        steps=20, lr=0.02,
    )
    _, f2, rtn2 = quant_opt.optimize_rounding(
        "UNetSP", vs, np.asarray(x2, np.float32), sim_scales,
        tags=set(), return_outputs=True,
    )
    _, _, opt2 = quant_opt.optimize_rounding(
        "UNetSP", vs, np.asarray(x2, np.float32), sim_scales,
        tags=set(), apply_opt=ropt, return_outputs=True,
    )
    def mae(o):
        return float(np.mean([
            np.abs(np.asarray(a) - np.asarray(b)).mean()
            for a, b in zip(jax.tree.leaves(o), jax.tree.leaves(f2))
        ]))
    e_rtn, e_opt = mae(rtn2), mae(opt2)
    assert e_opt <= e_rtn * 1.10, (e_rtn, e_opt)  # generalizes, not exact


@pytest.mark.parametrize("head", [0.5, 1.0])
def test_adaquant_respects_bf16_head(rng, head):
    """With a bf16 head, the rounding simulator keeps the bf16-served
    units float (no overrides for them) and the optimized engine at the
    SAME head config does not regress vs RTN. head=0.5 switches
    mid-block; head=1.0 exercises the block-boundary case where the
    engine keeps the block's SKIP tensor bf16 while the chain is
    quantized at the switch."""
    from ctunet_tpu import engine, engine_q, quant_opt
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))

    want = engine.build_predict(
        "UNetSP", vs, compute_dtype=jnp.float32, interpret=True
    )(x)
    w_leaves = [np.asarray(w, np.float32) for w in jax.tree.leaves(want)]

    scales: dict = {}
    engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        export_scales=scales, jit=False, bf16_head=head,
    )

    def err(ropt):
        got = engine_q.build_predict_q(
            "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
            round_opt=ropt, bf16_head=head,
        )(x)
        g_leaves = [np.asarray(g, np.float32) for g in jax.tree.leaves(got)]
        for g, w in zip(g_leaves, w_leaves):
            assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.99
        return float(np.mean([
            np.abs(g - w).mean() for g, w in zip(g_leaves, w_leaves)
        ]))

    e_rtn = err(None)
    ropt = quant_opt.optimize_rounding(
        "UNetSP", vs, np.asarray(x, np.float32), scales,
        steps=20, lr=0.02, bf16_head=head,
    )
    assert "d0.0" not in ropt  # bf16-served unit: no override
    if head >= 1.0:
        assert "d0.1" not in ropt  # whole block bf16
    else:
        assert "d0.1" in ropt
    assert "u3.1" in ropt
    e_opt = err(ropt)
    assert e_opt <= e_rtn * 1.02, (e_rtn, e_opt)


def test_int8_engine_spsmall_adaquant(rng):
    """AdaQuant on the 5-block UNetSPSmall (the 224x512x512 serving
    family, exhausted-tail engine plan): the generic rounding simulator
    covers n_blocks=5, its overrides build, and engine-vs-float error
    does not regress vs RTN."""
    from ctunet_tpu import engine, engine_q, quant_opt
    from ctunet_tpu.models import build_model

    shape = (32, 32, 32)
    m = build_model(
        "UNetSPSmall", compute_dtype="float32", use_checkpoint=False
    )
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.7).astype(np.float32))

    want = engine.build_predict(
        "UNetSPSmall", vs, compute_dtype=jnp.float32, interpret=True
    )(x)
    w_leaves = [np.asarray(w, np.float32) for w in jax.tree.leaves(want)]

    scales: dict = {}
    engine_q.build_predict_q(
        "UNetSPSmall", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        export_scales=scales, jit=False,
    )
    assert "d4.1" in scales and "u4.1" in scales  # 5 blocks exported

    def err(ropt):
        got = engine_q.build_predict_q(
            "UNetSPSmall", vs, x[0], compute_dtype=jnp.float32,
            interpret=True, round_opt=ropt,
        )(x)
        g_leaves = [np.asarray(g, np.float32) for g in jax.tree.leaves(got)]
        for g, w in zip(g_leaves, w_leaves):
            assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.99
        return float(np.mean([
            np.abs(g - w).mean() for g, w in zip(g_leaves, w_leaves)
        ]))

    e_rtn = err(None)
    ropt = quant_opt.optimize_rounding(
        "UNetSPSmall", vs, np.asarray(x, np.float32), scales,
        steps=20, lr=0.02,
    )
    assert {f"d{i}.0" for i in range(5)} <= set(ropt)
    e_opt = err(ropt)
    assert e_opt <= e_rtn * 1.02, (e_rtn, e_opt)


def _apply_R(x, R):
    """Direct application of a composite response: out[v] = sum_u R[v-2u] x[u]
    (r = v - 2u in [-1, 2]^3; float math, exact for integer operands)."""
    dh, hh, wh, cin = x.shape
    co = R.shape[-1]
    out = np.zeros((2 * dh, 2 * hh, 2 * wh, co), np.float64)
    for rz in range(-1, 3):
        for ry in range(-1, 3):
            for rx in range(-1, 3):
                m = R[rz + 1, ry + 1, rx + 1].astype(np.float64)
                for vz in range(2 * dh):
                    uz, mz = divmod(vz - rz, 2)
                    if mz or not (0 <= uz < dh):
                        continue
                    for vy in range(2 * hh):
                        uy, my = divmod(vy - ry, 2)
                        if my or not (0 <= uy < hh):
                            continue
                        vx = np.arange(2 * wh)
                        ux, mx = np.divmod(vx - rx, 2)
                        ok = (mx == 0) & (ux >= 0) & (ux < wh)
                        out[vz, vy, vx[ok]] += (
                            x[uz, uy, ux[ok]].astype(np.float64) @ m
                        )
    return out


@pytest.mark.parametrize("dual", [False, True])
def test_upconv_q_matches_integer_emulation(rng, dual):
    from ctunet_tpu.ops.pallas import upconv as uc

    Dh, Hh, Wh = 4, 4, 16
    Ca, Cb, Co = 3, 2, 3
    pin = 4
    wp = Wh // pin

    qa = rng.integers(0, 60, (Dh, Hh, Wh, Ca)).astype(np.int8)
    qb = rng.integers(0, 60, (Dh, Hh, Wh, Cb)).astype(np.int8)
    cin = Ca + 1 + (Cb if dual else 0)  # + ones channel in operand a
    Rq = rng.integers(-25, 25, (4, 4, 4, cin, Co)).astype(np.float32)
    scale = (rng.random(Co) * 1e-3 + 1e-4).astype(np.float32)
    bias = (rng.standard_normal(Co) * 2).astype(np.float32)

    ci_split = Ca + 1 if dual else None
    ma, mb = uc.build_upconv_matrices(Rq, pin, ci_split=ci_split)
    s2 = jnp.asarray(uc.pack_out_bias(scale, 2 * pin))
    b2 = jnp.asarray(uc.pack_out_bias(bias, 2 * pin))

    a1 = np.concatenate(
        [qa, np.full((Dh, Hh, Wh, 1), 127, np.int8)], -1
    )
    ac = pc.to_chain(
        jnp.asarray(a1.reshape(Dh, Hh, wp, pin * (Ca + 1))), pin
    )
    bc = (
        pc.to_chain(jnp.asarray(qb.reshape(Dh, Hh, wp, pin * Cb)), pin)
        if dual else None
    )
    out = uc.upconv_fused_chain(
        ac, jnp.asarray(ma.astype(np.int8)), b2, Hh, wp,
        b_chain=bc,
        mats_b=None if mb is None else jnp.asarray(mb.astype(np.int8)),
        scale2=s2, interpret=True,
    )
    got = np.asarray(pc.unpack_output(
        pc.from_chain(out, 2 * Hh, wp, 2 * pin * Co), 2 * pin, Co
    ))

    x_full = np.concatenate([a1] + ([qb] if dual else []), -1)
    acc = _apply_R(x_full, Rq)
    res = acc * scale + bias
    res = np.minimum(np.maximum(res, 0.0), 127.0)
    want = np.asarray(jnp.round(jnp.asarray(res)), np.int8)
    np.testing.assert_array_equal(got, want)


def test_chain_q_chains_into_itself(rng):
    """conv_q -> conv_q with no glue: second conv sees correct halos."""
    pack, c = 2, 4
    d, hh, ww = 4, 8, 8
    wp = ww // pack
    x = rng.integers(0, 60, (d, hh, ww, c)).astype(np.int8)
    w1 = rng.integers(-60, 60, (3, 3, 3, c, c)).astype(np.int8)
    w2 = rng.integers(-60, 60, (3, 3, 3, c, c)).astype(np.int8)
    s = np.full(c, 5e-3, np.float32)
    b = np.zeros(c, np.float32)

    def q(wi):
        return jnp.asarray(
            pc.pack_weights(wi.astype(np.float32), pack).astype(np.int8)
        )

    ps = jnp.asarray(pc.pack_bias(s, pack))
    pb = jnp.asarray(pc.pack_bias(b, pack))
    xc = pc.to_chain(jnp.asarray(x.reshape(d, hh, wp, pack * c)), pack)
    y1 = pc.conv3d_chain_q(xc, q(w1), ps, pb, hh, wp, interpret=True)
    y2 = pc.conv3d_chain_q(y1, q(w2), ps, pb, hh, wp, interpret=True)
    got = pc.unpack_output(pc.from_chain(y2, hh, wp, pack * c), pack, c)

    mid1 = _emulate_q(jnp.asarray(x), w1, jnp.asarray(s), jnp.asarray(b))
    want = _emulate_q(jnp.asarray(mid1), w2, jnp.asarray(s), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_int8_engine_bf16_tail(rng):
    """Mixed-precision tail: the last k decoder blocks served in the
    engine's float path inside the otherwise-int8 chain. More tail =>
    strictly less quantization noise vs the float engine; full-decoder
    tail leaves only encoder quantization."""
    from ctunet_tpu import engine, engine_q
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    stats = jax.tree.map(
        lambda s: s * (1.0 + 0.1 * jax.random.uniform(
            jax.random.key(1), s.shape
        )) + 0.01,
        vs["batch_stats"],
    )
    vs = {"params": vs["params"], "batch_stats": stats}
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))

    want = engine.build_predict(
        "UNetSP", vs, compute_dtype=jnp.float32, interpret=True
    )(x)
    w_leaves = [np.asarray(w, np.float32) for w in jax.tree.leaves(want)]

    errs = {}
    for tail in (0, 0.5, 1, 4):
        got = engine_q.build_predict_q(
            "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
            bf16_tail=tail,
        )(x)
        g_leaves = [np.asarray(g, np.float32) for g in jax.tree.leaves(got)]
        errs[tail] = float(np.mean([
            np.abs(g - w).mean() for g, w in zip(g_leaves, w_leaves)
        ]))
        for g, w in zip(g_leaves, w_leaves):
            assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.99

    # the float tail shrinks the error toward the float engine (with
    # random weights the fine-grained gaps sit in the noise floor, so
    # only require no-regression there; trained-checkpoint parity is
    # gated in tools/parity_check.py)
    assert errs[0.5] <= errs[0] * 1.05, errs
    assert errs[1] < errs[0], errs
    assert errs[4] <= errs[1] * 1.05, errs
    assert errs[4] < 5e-3, errs  # only encoder quant noise remains


def test_int8_engine_bf16_head(rng):
    """Mixed-precision HEAD: the first encoder unit(s) served in the
    engine's float path, with one quantize affine at the switch. More
    head => strictly less quantization noise; the level-0 skip of a
    full-block head reaches the final 1x1 unquantized while its pooled
    main path quantizes at the switch."""
    from ctunet_tpu import engine, engine_q
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    stats = jax.tree.map(
        lambda s: s * (1.0 + 0.1 * jax.random.uniform(
            jax.random.key(1), s.shape
        )) + 0.01,
        vs["batch_stats"],
    )
    vs = {"params": vs["params"], "batch_stats": stats}
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))

    want = engine.build_predict(
        "UNetSP", vs, compute_dtype=jnp.float32, interpret=True
    )(x)
    w_leaves = [np.asarray(w, np.float32) for w in jax.tree.leaves(want)]

    errs = {}
    for head in (0, 0.5, 1, 2):
        got = engine_q.build_predict_q(
            "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
            bf16_head=head,
        )(x)
        g_leaves = [np.asarray(g, np.float32) for g in jax.tree.leaves(got)]
        errs[head] = float(np.mean([
            np.abs(g - w).mean() for g, w in zip(g_leaves, w_leaves)
        ]))
        for g, w in zip(g_leaves, w_leaves):
            assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.99

    assert errs[0.5] <= errs[0] * 1.05, errs
    assert errs[1] <= errs[0.5] * 1.05, errs
    assert errs[2] <= errs[0] , errs

    # head + tail compose: full head + full tail leaves only the middle
    got = engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        bf16_head=1, bf16_tail=1,
    )(x)
    for g, w in zip(jax.tree.leaves(got), w_leaves):
        assert (np.asarray(g, np.float32).argmax(-1)
                == w.argmax(-1)).mean() > 0.99


def test_int8_engine_adaquant(rng):
    """AdaQuant rounding optimization: exported scales feed
    quant_opt.optimize_rounding, whose integer overrides plug back into
    the engine via round_opt and do not regress the RTN engine's
    agreement with the float engine (on the calibration volume itself
    the per-unit objective is keep-best, so it cannot be worse)."""
    from ctunet_tpu import engine, engine_q, quant_opt
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    stats = jax.tree.map(
        lambda s: s * (1.0 + 0.1 * jax.random.uniform(
            jax.random.key(1), s.shape
        )) + 0.01,
        vs["batch_stats"],
    )
    vs = {"params": vs["params"], "batch_stats": stats}
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))

    want = engine.build_predict(
        "UNetSP", vs, compute_dtype=jnp.float32, interpret=True
    )(x)
    w_leaves = [np.asarray(w, np.float32) for w in jax.tree.leaves(want)]

    scales: dict = {}
    engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        export_scales=scales, jit=False,
    )
    assert "entry" in scales and "d0.0" in scales and "u3.1" in scales

    def err(ropt):
        got = engine_q.build_predict_q(
            "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
            round_opt=ropt,
        )(x)
        g_leaves = [np.asarray(g, np.float32) for g in jax.tree.leaves(got)]
        for g, w in zip(g_leaves, w_leaves):
            assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.99
        return float(np.mean([
            np.abs(g - w).mean() for g, w in zip(g_leaves, w_leaves)
        ]))

    e_rtn = err(None)
    ropt = quant_opt.optimize_rounding(
        "UNetSP", vs, np.asarray(x, np.float32), scales, steps=40, lr=0.03
    )
    assert set(ropt) >= {
        f"d{i}.{j}" for i in range(4) for j in range(2)
    } | {f"u{i}.1" for i in range(4)}
    for tag, ov in ropt.items():
        assert ov["q"].shape[:3] == (
            (4, 4, 4) if tag.endswith(".0") and tag[0] == "u"
            else (3, 3, 3)
        )
        assert np.all(ov["q"] == np.round(ov["q"]))  # integer-valued
        assert np.all(np.abs(ov["q"]) <= 127)
    e_opt = err(ropt)
    # calibration == eval volume here, so AdaQuant cannot be worse than
    # RTN beyond upconv-composite noise (those keep RTN)
    assert e_opt <= e_rtn * 1.02, (e_rtn, e_opt)


def test_int8_engine_learned_scales(rng):
    """LSQ-style activation-scale refinement: optimize_rounding with
    learn_scales returns refined scales that, imported into the engine
    build together with the weight overrides, do not degrade (and
    typically improve) engine-vs-float agreement."""
    from ctunet_tpu import engine, engine_q, quant_opt
    from ctunet_tpu.models import build_model

    shape = (16, 16, 32)
    m = build_model("UNetSP", compute_dtype="float32", use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x0, False)
    x = jnp.asarray((rng.random((1, *shape, 2)) > 0.5).astype(np.float32))

    want = engine.build_predict(
        "UNetSP", vs, compute_dtype=jnp.float32, interpret=True
    )(x)
    w_leaves = [np.asarray(w, np.float32) for w in jax.tree.leaves(want)]

    scales: dict = {}
    engine_q.build_predict_q(
        "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
        export_scales=scales, jit=False,
    )

    def err(ropt, imp):
        got = engine_q.build_predict_q(
            "UNetSP", vs, x[0], compute_dtype=jnp.float32, interpret=True,
            round_opt=ropt, import_scales=imp,
        )(x)
        g_leaves = [np.asarray(g, np.float32) for g in jax.tree.leaves(got)]
        for g, w in zip(g_leaves, w_leaves):
            assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.99
        return float(np.mean([
            np.abs(g - w).mean() for g, w in zip(g_leaves, w_leaves)
        ]))

    refined: dict = {}
    ropt = quant_opt.optimize_rounding(
        "UNetSP", vs, np.asarray(x, np.float32), scales,
        steps=25, lr=0.02, learn_scales=True, out_scales=refined,
    )
    # refined dict is complete, export-shaped, and actually refined
    assert set(refined) == set(scales)
    for t in refined:
        a, b = refined[t], scales[t]
        if isinstance(b, tuple):
            assert a[0].shape == b[0].shape and a[1].shape == b[1].shape
        else:
            assert a.shape == b.shape
    moved = max(
        float(np.abs(np.log(refined[t][1][:-1] / scales[t][1][:-1])).max())
        for t in refined if isinstance(scales[t], tuple)
    )
    assert moved > 0.0  # some scale actually learned
    # ones lanes preserved
    assert refined["u0.0"][-1] == scales["u0.0"][-1]

    e_rtn = err(None, None)
    e_ls = err(ropt, refined)
    assert e_ls <= e_rtn * 1.02, (e_rtn, e_ls)


def _emulate_q_zp(x_q, w_int, scale, bias, s_in):
    """Float emulation of the ZERO-POINT quantized conv: input lanes hold
    q = a/s_in - 128, the builder folds 128*sum(W*s_in) into the bias,
    and the epilogue emits round(clamp(relu(.), 0, 255)) - 128."""
    acc = jax.lax.conv_general_dilated(
        x_q[None].astype(jnp.float32),
        jnp.asarray(w_int, jnp.float32),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    res = acc * scale[None, None, None, :] + bias[None, None, None, :]
    res = jnp.maximum(res, 0.0)
    res = jnp.minimum(res, 255.0) - 128.0
    return np.asarray(jnp.round(res), np.int8)


@pytest.mark.parametrize("pack,cin,cout", [(2, 3, 5), (4, 2, 7)])
def test_chain_q_zero_point_matches_integer_emulation(rng, pack, cin, cout):
    """zp mode: the kernel's [0,255]-clamp/-128-shift epilogue and -128
    border fill must match a float emulation where the halo taps hold
    q = -128 (activation zero)."""
    d, hh, ww = 6, 8, 16
    wp = ww // pack
    # zero-point representation of a nonnegative activation field
    q = rng.integers(-128, 128, (d, hh, ww, cin)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 3, cin, cout)).astype(np.int8)
    scale = (rng.random(cout) * 2e-3 + 1e-4).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32) * 3.0 + 128.0

    pw8 = jnp.asarray(pc.pack_weights(w.astype(np.float32), pack)
                      .astype(np.int8))
    ps = jnp.asarray(pc.pack_bias(scale, pack))
    pb = jnp.asarray(pc.pack_bias(bias, pack))

    xc = pc.to_chain(
        jnp.asarray(q.reshape(d, hh, wp, pack * cin)), pack, fill=-128
    )
    out_c = pc.conv3d_chain_q(xc, pw8, ps, pb, hh, wp, interpret=True,
                              zp=True)
    out = pc.unpack_output(
        pc.from_chain(out_c, hh, wp, pack * cout), pack, cout
    )
    # SAME-conv emulation pads with 0, the kernel with q=-128: emulate by
    # padding the input with -128 explicitly and cropping.
    qp = np.pad(q, ((1, 1), (1, 1), (1, 1), (0, 0)),
                constant_values=-128)
    want_full = _emulate_q_zp(jnp.asarray(qp), w, jnp.asarray(scale),
                              jnp.asarray(bias), None)
    want = want_full[1:-1, 1:-1, 1:-1]
    np.testing.assert_array_equal(np.asarray(out), want)

    # output halo must hold the zp fill (-128), not 0
    wpad = out_c.shape[1] // (hh + 2)
    grid = np.asarray(out_c).reshape(d + 2, hh + 2, wpad, -1)
    assert (grid[0] == -128).all() and (grid[-1] == -128).all()
    assert (grid[:, 0] == -128).all() and (grid[:, -1] == -128).all()
    assert (grid[:, :, wp:] == -128).all()


def test_upconv_zero_point_parity_bias(rng):
    """zp upconv: the kernel's per-parity bias rows (zero-point
    corrections differ by output (z, y) parity) must make the int8
    result EXACTLY equal to a brute-force integer emulation where halo
    taps hold q = -128."""
    from ctunet_tpu.ops.pallas import upconv as uc

    pin, ci, co = 2, 3, 4
    Dh, Hh, Wh = 3, 4, 8
    wp = Wh // pin
    kT = rng.standard_normal((2, 2, 2, ci, ci)).astype(np.float32) * 0.2
    bb = rng.standard_normal(ci).astype(np.float32) * 0.1
    w0 = rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.2
    bcol = np.broadcast_to(bb[None, None, None, :, None],
                           (2, 2, 2, ci, 1)).copy()
    kT_aug = np.concatenate([kT, bcol], -1)
    R = uc.composite_response(kT_aug, w0)  # (4,4,4,ci+1,co), index r+1

    s_in = np.full(ci + 1, 1.0 / 255.0, np.float32)
    qa = rng.integers(-128, 128, (Dh, Hh, Wh, ci)).astype(np.int8)
    qa = np.concatenate(
        [qa, np.full((Dh, Hh, Wh, 1), 127, np.int8)], -1
    )

    R_s = R * s_in[None, None, None, :, None]
    amax = np.abs(R_s).max(axis=(0, 1, 2, 3))
    k = 127.0 / np.maximum(amax, 1e-8)
    R_q = np.clip(np.round(R_s * k), -127, 127)
    s_out = np.full(co, 1e-2, np.float32)
    b0 = rng.standard_normal(co).astype(np.float32) * 0.1

    # brute-force integer emulation: out[v] = requant(sum_u R_q[v-2u] q_u)
    D2, H2, W2 = 2 * Dh, 2 * Hh, 2 * Wh
    qf = qa.astype(np.float64)
    want = np.zeros((D2, H2, W2, co))
    halo = np.full(ci + 1, -128.0)
    for vz in range(D2):
        for vy in range(H2):
            for vx in range(W2):
                acc = np.zeros(co)
                corr = np.zeros(co)
                for rz in (-1, 0, 1, 2):
                    if (vz - rz) % 2:
                        continue
                    uz = (vz - rz) // 2
                    for ry in (-1, 0, 1, 2):
                        if (vy - ry) % 2:
                            continue
                        uy = (vy - ry) // 2
                        for rx in (-1, 0, 1, 2):
                            if (vx - rx) % 2:
                                continue
                            ux = (vx - rx) // 2
                            corr += R_q[rz + 1, ry + 1, rx + 1].sum(0)
                            src = (
                                qf[uz, uy, ux]
                                if 0 <= uz < Dh and 0 <= uy < Hh
                                and 0 <= ux < Wh else halo
                            )
                            acc += src @ R_q[rz + 1, ry + 1, rx + 1]
                # zp correction from the QUANTIZED weights (exact shift)
                res = (acc + 128.0 * corr) / (k * s_out) + b0 / s_out
                res = np.minimum(np.maximum(res, 0.0), 255.0)
                want[vz, vy, vx] = np.round(res) - 128.0

    ma, _ = uc.build_upconv_matrices(R_q, pin)
    colsum_q = ma.sum(axis=(2, 3))  # (2, 2, Cpo), integer-valued
    scale_ref = uc.pack_out_bias(1.0 / (k * s_out), 2 * pin)
    scale_lane = scale_ref[0]
    base = uc.pack_out_bias(b0 / s_out, 2 * pin)[0]
    bias4 = np.stack([
        base + 128.0 * colsum_q[a, b] * scale_lane
        for a in range(2) for b in range(2)
    ]).astype(np.float32)

    ac = pc.to_chain(
        jnp.asarray(qa.reshape(Dh, Hh, wp, pin * (ci + 1))), pin,
        fill=-128,
    )
    out = uc.upconv_fused_chain(
        ac, jnp.asarray(ma.astype(np.int8)), jnp.asarray(bias4),
        Hh, wp, scale2=jnp.asarray(scale_ref), interpret=True, zp=True,
    )
    got = np.asarray(pc.unpack_output(
        pc.from_chain(out, 2 * Hh, wp, 2 * pin * co), 2 * pin, co
    ), dtype=np.float64)
    np.testing.assert_array_equal(got, want)
