#!/usr/bin/env python
"""Benchmark: UNetSP CT-volume inference throughput (volumes/sec/chip).

Headline config of the reference (``examples/UNetSPDO/FlapRecSP2O.ini``):
UNetSP at 224x304x304, batch 1 — skull + atlas in, (full skull, flap) out.
This framework runs it whole-volume in bf16 on one TPU chip (the reference's
inference mode, SURVEY.md §3.4); the baseline is the reference's own PyTorch
implementation on CPU (it ships no GPU numbers — SURVEY.md §6), measured by
``python bench.py --measure-baseline`` and stored in BASELINE_MEASURED.json.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "volumes/sec", "vs_baseline": N}``.
"""

import json
import os
import sys
import time

SHAPE = (224, 304, 304)
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
METRIC = "UNetSP 224x304x304 skull-completion inference, volumes/sec/chip"


def measure_torch_baseline(n_iters: int = 3) -> float:
    """Reference implementation (its own code, loaded by path) on CPU."""
    import importlib.util

    import numpy as np
    import torch

    spec = importlib.util.spec_from_file_location(
        "refmodels", "/root/reference/ctunet/pytorch/models.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    model = ref.UNetSP()
    model.eval()
    x = torch.tensor(
        np.random.default_rng(0)
        .random((1, 2, *SHAPE))
        .astype("float32")
    )
    with torch.no_grad():
        t0 = time.perf_counter()
        model(x)  # warmup (allocator, thread pool)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            model(x)
            times.append(time.perf_counter() - t0)
    sec = min(times)
    print(
        f"torch-CPU UNetSP: warmup {warm:.1f}s, best of {n_iters}: {sec:.2f}s"
        f" -> {1.0 / sec:.4f} volumes/sec",
        file=sys.stderr,
    )
    return 1.0 / sec


def measure_jax(n_iters: int = 10) -> float:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu.models import build_model

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    model = build_model(
        "UNetSP", compute_dtype="bfloat16", use_checkpoint=False
    )
    x = jnp.asarray(
        np.random.default_rng(0).random((1, *SHAPE, 2)).astype("float32"),
        jnp.bfloat16,
    )
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False
    )

    # NOTE: under the axon tunnel block_until_ready does not actually block,
    # so a scalar reduction is fetched to host each iteration — the float()
    # forces full computation + one-scalar roundtrip (honest sync).
    @jax.jit
    def forward_sum(variables, x):
        out = model.apply(variables, x, False)
        return sum(
            jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
        )

    def timed(fn, label):
        t0 = time.perf_counter()
        float(fn(variables, x))
        print(
            f"{label} compile+first run: {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            float(fn(variables, x))
            times.append(time.perf_counter() - t0)
        sec = min(times)
        print(
            f"{label}: best of {n_iters}: {sec * 1000:.1f}ms -> "
            f"{1.0 / sec:.2f} volumes/sec",
            file=sys.stderr,
        )
        return sec

    sec = timed(forward_sum, "jax UNetSP (XLA conv)")

    # Fused Pallas inference engine (the serving path).
    try:
        from ctunet_tpu import engine

        predict = engine.build_predict("UNetSP", variables)

        @jax.jit
        def engine_sum(variables_unused, x):
            out = predict(x)
            return sum(
                jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
            )

        sec_engine = timed(engine_sum, "jax UNetSP (pallas engine)")
        sec = min(sec, sec_engine)
    except Exception as e:  # engine is an optimization, never a bench blocker
        print(f"engine path failed: {type(e).__name__}: {e}", file=sys.stderr)
    print(
        f"jax UNetSP: best of {n_iters}: {sec * 1000:.1f}ms -> "
        f"{1.0 / sec:.2f} volumes/sec",
        file=sys.stderr,
    )
    return 1.0 / sec


TRAIN_SHAPE = (64, 128, 128)


def measure_train(n_iters: int = 6) -> float:
    """Training-step throughput at the reference's 128-res train config
    (UNetSP, 64x128x128, batch 1, Adam, Dice+CE;
    ``examples/UNetSPDO/FlapRecSP2O_128.ini``), with on-device synthesis
    fused into the step. Secondary metric.

    NOTE: the 224x304x304 *training* config currently OOMs on one 16GB v5e:
    XLA's conv-backward materializes thin-channel temps with 18x lane
    padding (see BASELINE.md). Inference at that size works (whole-volume);
    full-res training needs the packed-conv formulation on the training
    path (round-2 work)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import problem, steps
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models import build_model

    model = build_model("UNetSP", compute_dtype="bfloat16")
    x = jnp.zeros((1, *TRAIN_SHAPE, 2), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False
    )
    optimizer = steps.make_optimizer(
        {"optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 0.0}
    )
    state = steps.TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    handler = problem.FlapRecWithShapePriorDoubleOut()
    atlas = spherical_shell(TRAIN_SHAPE, radius_frac=0.42).astype("float32")
    batch = {
        "image": jnp.asarray(
            spherical_shell(TRAIN_SHAPE, radius_frac=0.4)[None].astype(
                "float32"
            )
        )
    }
    train_step = steps.make_train_step(
        model, handler, optimizer,
        {"ce_lambda": 1.0, "dice_lambda": 1.0, "save_dice_plots": False},
        atlas=atlas, compute_dtype=jnp.bfloat16,
    )
    t0 = time.perf_counter()
    state, terms = train_step(state, batch, jax.random.key(0))
    first_loss = float(terms["epoch_loss"])  # forces sync
    print(
        f"train compile+first: {time.perf_counter() - t0:.1f}s "
        f"loss={first_loss:.4f}",
        file=sys.stderr,
    )
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        state, terms = train_step(state, batch, jax.random.key(i))
        float(terms["epoch_loss"])  # honest sync (see measure_jax note)
        times.append(time.perf_counter() - t0)
    sec = min(times)
    print(
        f"train step (synthesis+fwd+bwd+update): {sec * 1000:.1f}ms -> "
        f"{1.0 / sec:.2f} steps/sec",
        file=sys.stderr,
    )
    return 1.0 / sec


def main() -> None:
    if "--train" in sys.argv:
        vps = measure_train()
        print(json.dumps({
            "metric": "UNetSP 64x128x128 train steps/sec/chip",
            "value": round(vps, 4), "unit": "steps/sec",
        }))
        return
    if "--measure-baseline" in sys.argv:
        vps = measure_torch_baseline()
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "metric": METRIC,
                    "baseline": "reference ctunet UNetSP, PyTorch CPU, "
                    "batch 1, float32 (loaded from /root/reference)",
                    "volumes_per_sec": vps,
                },
                f,
                indent=1,
            )
        print(json.dumps({"baseline_volumes_per_sec": vps}))
        return

    value = measure_jax()
    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("volumes_per_sec")
    vs_baseline = (value / baseline) if baseline else None
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": round(value, 4),
                "unit": "volumes/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
