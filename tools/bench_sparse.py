#!/usr/bin/env python
"""Constant-region short-circuit (sparse chain conv): TPU validation + timing.

Builds the bf16 and int8 engines with ``sparse=0`` (dense) and
``sparse=-1`` (auto row-group skip) on a realistic synthetic skull at the
reference's 224x304x304 headline config, asserts BIT EQUALITY of outputs,
and times both — plus a dense-noise input as the skip's worst case.

Usage: python tools/bench_sparse.py [--shape D,H,W] [--iters N]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPE = (224, 304, 304)


def main():
    shape = SHAPE
    if "--shape" in sys.argv:
        shape = tuple(
            int(v) for v in sys.argv[sys.argv.index("--shape") + 1].split(",")
        )
    n_iters = 10
    if "--iters" in sys.argv:
        n_iters = int(sys.argv[sys.argv.index("--iters") + 1])

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import engine, engine_q
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models import build_model
    from ctunet_tpu.ops import synthesis

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    model = build_model("UNetSP", compute_dtype="bfloat16",
                        use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, 2), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x0, False
    )

    # realistic input: broken synthetic skull + atlas channel
    atlas = spherical_shell(shape, radius_frac=0.42).astype("float32")
    full = spherical_shell(shape, seed=11).astype("float32")
    broken, _ = synthesis.skull_random_hole(jax.random.key(3),
                                            jnp.asarray(full))
    skull = np.stack([np.asarray(broken, np.float32), atlas], -1)[None]
    x_skull = jnp.asarray(skull, jnp.bfloat16)
    # worst case: dense uniform noise (no group is ever row-constant)
    x_noise = jnp.asarray(
        np.random.default_rng(0).random((1, *shape, 2)).astype("float32"),
        jnp.bfloat16,
    )

    def timed(fn, x, label):
        # time through a jitted scalar sum — a per-iteration full-volume
        # fetch would ride the ~35 MB/s axon tunnel and swamp the device
        # time; the one-scalar roundtrip still forces all compute
        @jax.jit
        def fn_sum(x):
            out = fn(x)
            return sum(
                jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
            )

        t0 = time.perf_counter()
        float(fn_sum(x))
        print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        # pipelined: queue all iterations, sync once — a per-iteration
        # scalar fetch pays the ~35 MB/s tunnel's round-trip latency
        # (~20 ms) per call and hides real device-side deltas
        t0 = time.perf_counter()
        res = None
        for _ in range(n_iters):
            res = fn_sum(x)
        float(res)
        ms = (time.perf_counter() - t0) / n_iters * 1000
        print(f"{label}: {ms:.1f} ms/volume (pipelined)")
        # one (slow, untimed) full fetch for the bit-equality check
        return jax.tree.map(np.asarray, fn(x)), ms

    results = {}
    for tag, x in (("skull", x_skull), ("noise", x_noise)):
        p_dense = engine.build_predict("UNetSP", variables, sparse=0)
        p_sparse = engine.build_predict("UNetSP", variables, sparse=-1)
        o_d, ms_d = timed(p_dense, x, f"bf16 dense [{tag}]")
        o_s, ms_s = timed(p_sparse, x, f"bf16 sparse [{tag}]")
        for a, b in zip(jax.tree.leaves(o_d), jax.tree.leaves(o_s)):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32)
            )
        print(f"bf16 [{tag}]: BIT-EXACT, {ms_d:.1f} -> {ms_s:.1f} ms "
              f"({ms_d/ms_s:.2f}x)")
        results[f"bf16_{tag}"] = (ms_d, ms_s)

    calib = x_skull[0]
    for tag, x in (("skull", x_skull), ("noise", x_noise)):
        q_dense = engine_q.build_predict_q("UNetSP", variables, calib,
                                           sparse=0)
        q_sparse = engine_q.build_predict_q("UNetSP", variables, calib,
                                            sparse=-1)
        o_d, ms_d = timed(q_dense, x, f"int8 dense [{tag}]")
        o_s, ms_s = timed(q_sparse, x, f"int8 sparse [{tag}]")
        for a, b in zip(jax.tree.leaves(o_d), jax.tree.leaves(o_s)):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32)
            )
        print(f"int8 [{tag}]: BIT-EXACT, {ms_d:.1f} -> {ms_s:.1f} ms "
              f"({ms_d/ms_s:.2f}x)")
        results[f"int8_{tag}"] = (ms_d, ms_s)

    print({k: (round(a, 1), round(b, 1)) for k, (a, b) in results.items()})


if __name__ == "__main__":
    main()
