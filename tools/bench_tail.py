#!/usr/bin/env python
"""Speed sweep of the int8 engine's mixed-precision tail (bf16_tail k).

Times the bf16 engine and int8 engines at k in {0,1,2} on the headline
224x304x304 UNetSP config, one real chip. VERDICT r1 gate: the
parity-clean int8 mode must keep >= 1.3x the bf16 engine.

Usage: PYTHONPATH=. python tools/bench_tail.py [--shape 224,304,304]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    shape = (224, 304, 304)
    if "--shape" in sys.argv:
        shape = tuple(
            int(v) for v in sys.argv[sys.argv.index("--shape") + 1].split(",")
        )
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import engine, engine_q
    from ctunet_tpu.models import build_model

    model = build_model("UNetSP", compute_dtype="bfloat16")
    x0 = jnp.zeros((1, 32, 32, 32, 2), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x0, False
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.random((1, *shape, 2)) > 0.5).astype(np.float32), jnp.bfloat16
    )

    n_iters = 8

    def timed(predict, label):
        @jax.jit
        def s(x):
            out = predict(x)
            return sum(
                jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
            )

        t0 = time.perf_counter()
        float(s(x))
        print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        sums = [s(x) for _ in range(n_iters)]
        _ = [float(v) for v in sums]
        thr = (time.perf_counter() - t0) / n_iters
        print(f"{label}: pipelined {thr*1000:.1f} ms/volume "
              f"({1.0/thr:.2f} vol/s)", flush=True)
        return thr

    t_bf16 = timed(engine.build_predict("UNetSP", variables), "bf16 engine")
    configs = [(0, 0), (0, 1), (0, 2), (0.5, 0), (1, 0), (2, 0)]
    if "--configs" in sys.argv:
        configs = [
            tuple(float(v) for v in pair.split(":"))
            for pair in sys.argv[sys.argv.index("--configs") + 1].split(",")
        ]
    for head, tail in configs:
        t = timed(
            engine_q.build_predict_q(
                "UNetSP", variables, x[0], bf16_tail=tail, bf16_head=head
            ),
            f"int8 engine head={head} tail={tail}",
        )
        print(f"  -> {t_bf16 / t:.2f}x the bf16 engine", flush=True)


if __name__ == "__main__":
    main()
