#!/usr/bin/env python
"""One-process sweep of full-res train-step variants (amortizes the
tunnel's first-op latency): standard vs packed-resident graph, xla vs
xla_dw weight-grads. Prints ms/step + the loss trajectory per variant —
same seed => identical synthesis => trajectories must agree closely
(packed/xla_dw are float-summation-order variants of the same math).

Usage: PYTHONPATH=. python tools/bench_train_sweep.py [--shape D,H,W]
           [--iters N]
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
    n_iters = 5
    if "--iters" in sys.argv:
        n_iters = int(sys.argv[sys.argv.index("--iters") + 1])

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from ctunet_tpu import problem, steps
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models import build_model
    from ctunet_tpu.models.packed_resident import PackedResidentModel
    from ctunet_tpu.ops import packed_conv

    handler = problem.FlapRecWithShapePriorDoubleOut()
    atlas = spherical_shell(shape, radius_frac=0.42).astype("float32")
    img = spherical_shell(shape, radius_frac=0.4)[None].astype("float32")

    base = build_model("UNetSP", compute_dtype="bfloat16")
    x0 = jnp.zeros((1, *shape, 2), jnp.bfloat16)
    variables = jax.jit(base.init, static_argnums=(2,))(
        jax.random.key(0), x0, False
    )

    def run(label, impl, packed):
        packed_conv.set_conv_impl(impl)
        model = (
            PackedResidentModel(base, "UNetSP", use_remat=True)
            if packed else base
        )
        optimizer = steps.make_optimizer(
            {"optimizer": "adam", "learning_rate": 1e-4,
             "weight_decay": 0.0}
        )
        state = steps.TrainState(
            params=jax.tree.map(jnp.array, variables["params"]),
            batch_stats=jax.tree.map(jnp.array, variables["batch_stats"]),
            opt_state=optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        train_step = steps.make_train_step(
            model, handler, optimizer,
            {"ce_lambda": 1.0, "dice_lambda": 1.0,
             "save_dice_plots": False},
            atlas=atlas, compute_dtype=jnp.bfloat16,
        )
        batch = {"image": jnp.asarray(img)}
        t0 = time.perf_counter()
        state, terms = train_step(state, batch, jax.random.key(0))
        loss0 = float(terms["epoch_loss"])
        print(f"[{label}] compile+first {time.perf_counter()-t0:.1f}s "
              f"loss={loss0:.6f}", flush=True)
        losses, times = [loss0], []
        for i in range(n_iters):
            t0 = time.perf_counter()
            state, terms = train_step(state, batch, jax.random.key(i + 1))
            losses.append(float(terms["epoch_loss"]))
            times.append(time.perf_counter() - t0)
        best = min(times) * 1000
        print(f"[{label}] best {best:.0f} ms/step "
              f"({1000.0/best:.2f} steps/s); losses "
              f"{' '.join(f'{v:.5f}' for v in losses)}", flush=True)
        packed_conv.set_conv_impl("xla")

    configs = {
        "std/xla": ("xla", False),
        "std/xla_dw": ("xla_dw", False),
        "packed/xla": ("xla", True),
        "packed/xla_dw": ("xla_dw", True),
    }
    want = [a for a in sys.argv[1:] if a in configs]
    for label in (want or configs):
        impl, packed = configs[label]
        try:
            run(label, impl, packed)
        except Exception as e:  # e.g. HBM OOM on one config
            print(f"[{label}] FAILED: {type(e).__name__}: {e}", flush=True)
            packed_conv.set_conv_impl("xla")


if __name__ == "__main__":
    main()
