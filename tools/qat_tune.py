#!/usr/bin/env python
"""Quantization-aware fine-tune of a trained checkpoint (ops/qat.py).

Loads an orbax checkpoint (e.g. tools/parity_check.py --ckpt output),
calibrates per-unit activation scales, fine-tunes under the fake-
quantized forward for N steps on the same synthetic-skull recipe, and
saves ``<ckpt>_qat``. Measure with
``tools/parity_check.py --ckpt <ckpt>_qat``.

Usage: PYTHONPATH=. python tools/qat_tune.py --ckpt PATH [--steps 800]
           [--lr 1e-4]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPE = (64, 128, 128)


def main():
    ckpt_path = os.path.abspath(sys.argv[sys.argv.index("--ckpt") + 1])
    steps_n = (int(sys.argv[sys.argv.index("--steps") + 1])
               if "--steps" in sys.argv else 800)
    lr = (float(sys.argv[sys.argv.index("--lr") + 1])
          if "--lr" in sys.argv else 1e-4)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import checkpoint as ckpt_mod
    from ctunet_tpu import problem, steps
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.ops import synthesis
    from ctunet_tpu.ops.qat import QATModel, calibrate_unit_scales

    variables = ckpt_mod.load_any(ckpt_path, "UNetSP")
    atlas = spherical_shell(SHAPE, radius_frac=0.42).astype("float32")

    # calibration batch: broken skull + atlas (the serving input shape)
    calib_full = spherical_shell(SHAPE, seed=777).astype("float32")
    calib_broken, _ = synthesis.skull_random_hole(
        jax.random.key(9999), jnp.asarray(calib_full)
    )
    calib = np.stack(
        [np.asarray(calib_broken, np.float32), atlas], -1
    )[None]
    scales = calibrate_unit_scales("UNetSP", variables, calib)
    print(f"calibrated {len(scales)} unit scales", flush=True)

    model = QATModel("UNetSP", scales=scales)
    optimizer = steps.make_optimizer(
        {"optimizer": "adam", "learning_rate": lr, "weight_decay": 0.0}
    )
    state = steps.TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    handler = problem.FlapRecWithShapePriorDoubleOut()
    train_step = steps.make_train_step(
        model, handler, optimizer,
        {"ce_lambda": 1.0, "dice_lambda": 1.0, "save_dice_plots": False},
        atlas=atlas, compute_dtype=jnp.bfloat16,
    )
    vols = np.stack([
        spherical_shell(SHAPE, seed=100 + i).astype("float32")
        for i in range(8)
    ])
    t0 = time.perf_counter()
    losses = []
    for i in range(steps_n):
        batch = {"image": jnp.asarray(vols[i % 8][None])}
        # offset the data keys so QAT sees fresh craniectomies, not the
        # exact training-run holes
        state, terms = train_step(state, batch, jax.random.key(50_000 + i))
        losses.append(terms["epoch_loss"])
        if (i + 1) % 100 == 0:
            print(f"  qat step {i+1}/{steps_n} "
                  f"loss={float(losses[-1]):.4f}", flush=True)
    print(f"QAT {steps_n} steps in {time.perf_counter()-t0:.0f}s; "
          f"loss {float(losses[0]):.4f} -> {float(losses[-1]):.4f}")

    out_path = ckpt_path.rstrip("/") + "_qat"
    ckpt_mod.save_checkpoint(out_path, steps.TrainState(
        params=state.params, batch_stats=state.batch_stats,
        opt_state=(), step=jnp.zeros((), jnp.int32),
    ))
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
