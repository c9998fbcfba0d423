#!/usr/bin/env python
"""512-res inference benchmark: UNetSPSmall at 224x512x512 whole-volume.

The reference's ``examples/UNetSPDO/FlapRecSP2O_512.ini`` serving config
(SURVEY.md §5 long-context: fixed preprocessed resolutions, a smaller
5-block net for 512). Times three paths on one chip:

- XLA convs (bf16 whole-volume)
- chained-flat Pallas engine (bf16; pack-16 with the exhausted tail:
  one standard-space pool + decoder repack)
- calibrated int8 engine (same exhausted-tail plan, fully int8)

Prints one JSON line per path. Usage: python tools/bench_512.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHAPE = (224, 512, 512)


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu.models import build_model

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    model = build_model(
        "UNetSPSmall", compute_dtype="bfloat16", use_checkpoint=False
    )
    x = jnp.asarray(
        (np.random.default_rng(0).random((1, *SHAPE, 2)) > 0.8).astype(
            "float32"
        ),
        jnp.bfloat16,
    )
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False
    )

    def timed(fn, label, n_iters=6):
        t0 = time.perf_counter()
        float(fn(x))
        print(
            f"{label} compile+first: {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            float(fn(x))
            times.append(time.perf_counter() - t0)
        lat = min(times)
        t0 = time.perf_counter()
        sums = [fn(x) for _ in range(n_iters)]
        _ = [float(s) for s in sums]
        thr = (time.perf_counter() - t0) / n_iters
        print(json.dumps({
            "path": label, "latency_ms": round(lat * 1000, 1),
            "pipelined_ms_per_volume": round(thr * 1000, 1),
            "volumes_per_sec": round(1.0 / min(lat, thr), 2),
        }))
        return min(lat, thr)

    def _sum(out):
        return sum(
            jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
        )

    if "--xla" in sys.argv:
        @jax.jit
        def fwd(x):
            return _sum(model.apply(variables, x, False))

        timed(fwd, "xla_bf16")

    from ctunet_tpu import engine
    from ctunet_tpu import engine_q

    predict = engine.build_predict("UNetSPSmall", variables)

    if "--patch-only" not in sys.argv:
        @jax.jit
        def fwd_e(x):
            return _sum(predict(x))

        timed(fwd_e, "engine_bf16")

        predict_q = engine_q.build_predict_q("UNetSPSmall", variables, x[0])

        @jax.jit
        def fwd_q(x):
            return _sum(predict_q(x))

        timed(fwd_q, "engine_int8")

    if "--patch" in sys.argv or "--patch-only" in sys.argv:
        # sliding-window fallback modes (VERDICT r1 item 4): overlap and
        # patch-batch sweep, patches served by the fused engine; plus the
        # calibrated int8 engine at patch shape (central-patch calibration,
        # same scheme as trainer._make_patch_predict).
        # Labels: round 2 renamed patch_engine_ov* -> patch_bf16_ov*/
        # patch_int8_ov* (the engine kind is now explicit); BENCH rounds
        # before that carry the old names for the same bf16 mode.
        # NOTE (ADVICE r2): these int8 patch numbers are LATENCY-only —
        # central-patch calibration can clip border patches; parity-grade
        # int8 patch serving should calibrate over a sample of grid
        # patches instead.
        from ctunet_tpu.ops.sliding_window import make_sliding_window_fn

        atlas = np.asarray(x[0, ..., 1], np.float32)
        ctr = [(s - 128) // 2 for s in SHAPE]
        calib = x[0, ctr[0]:ctr[0] + 128, ctr[1]:ctr[1] + 128,
                  ctr[2]:ctr[2] + 128, :]
        predict_qp = engine_q.build_predict_q(
            "UNetSPSmall", variables, calib
        )
        modes = (
            ("bf16", 0.5, 1), ("bf16", 0.5, 4),
            ("bf16", 0.25, 1), ("bf16", 0.25, 4),
            ("int8", 0.25, 1), ("int8", 0.25, 4), ("int8", 0.5, 4),
        )
        for eng_kind, overlap, kb in modes:
            fn = predict if eng_kind == "bf16" else predict_qp
            sw = make_sliding_window_fn(
                model, patch_size=128, overlap=overlap, atlas=atlas,
                compute_dtype=jnp.bfloat16,
                apply_fn=lambda v, xx, fn=fn: fn(xx), patch_batch=kb,
            )

            # No outer jit: it would re-inline the closed-over atlas as a
            # 235 MB HLO constant (sliding_window passes it as a jit ARG
            # for exactly this reason). sw's inner _predict is jitted; the
            # verification sum is jitted separately so the timed region
            # isn't inflated by an op-by-op eager reduction (ADVICE r2).
            _sum_j = jax.jit(_sum)

            def fwd_p(xx, sw=sw):
                out = sw(variables, xx[..., 0].astype(jnp.float32))
                return _sum_j(out)

            timed(
                fwd_p, f"patch_{eng_kind}_ov{overlap}_k{kb}", n_iters=3
            )


if __name__ == "__main__":
    main()
