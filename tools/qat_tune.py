#!/usr/bin/env python
"""Quantization-aware DISTILLATION fine-tune of a trained checkpoint.

Loads an orbax checkpoint (e.g. tools/parity_check.py --ckpt output),
calibrates per-unit activation scales, then fine-tunes the weights so
the FAKE-QUANTIZED forward (ops/qat.py — simulates the int8 engine's
arithmetic) reproduces the FROZEN float forward's output probabilities
on fresh synthetic craniectomies, and saves ``<ckpt>_qat``. Measure
with ``tools/parity_check.py --ckpt <ckpt>_qat``.

Why distillation and not the task loss: the int8 parity metric is mask
AGREEMENT with the float model (which agrees with the reference torch
implementation >= 0.996). The task loss barely sees the sliver-thin
flap (~0.1% of voxels), so task-loss QAT lets the quantized masks drift
from the float masks while the loss stays flat — MEASURED: 800
task-loss steps moved fq-vs-float flap Dice 0.973 -> 0.937. Matching
the teacher's probabilities supervises every voxel of both heads
directly, boundary voxels included.

Usage: PYTHONPATH=. python tools/qat_tune.py --ckpt PATH [--steps 800]
           [--lr 1e-4]

Before saving, the PLAIN (un-quantized) forward is re-checked against
the pre-QAT masks — QAT must not trade real-forward accuracy for
fq-forward accuracy (a full-STE variant measurably did; ops/qat.py uses
clipped STE for this reason). The script aborts if the plain-forward
masks collapse.
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
    import optax

    from ctunet_tpu import checkpoint as ckpt_mod
    from ctunet_tpu import steps
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models import build_model
    from ctunet_tpu.ops import synthesis
    from ctunet_tpu.ops.qat import QATModel, calibrate_unit_scales

    variables = ckpt_mod.load_any(ckpt_path, "UNetSP")
    atlas = spherical_shell(SHAPE, radius_frac=0.42).astype("float32")
    atlas_j = jnp.asarray(atlas)

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

    student = QATModel("UNetSP", scales=scales)
    teacher = build_model("UNetSP", compute_dtype="bfloat16")
    teacher_vars = jax.tree.map(jnp.asarray, variables)  # frozen anchor
    batch_stats = variables["batch_stats"]

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(variables["params"])
    params = variables["params"]

    @jax.jit
    def distill_step(params, opt_state, vol, key):
        # fresh virtual craniectomy (offset key space vs the training
        # run so QAT sees new holes)
        broken, _ = synthesis.skull_random_hole(key, vol)
        x = jnp.stack(
            [broken.astype(jnp.bfloat16), atlas_j.astype(jnp.bfloat16)],
            -1,
        )[None]
        t_out = jax.lax.stop_gradient(
            teacher.apply(teacher_vars, x, False)
        )

        def loss_fn(p):
            s_out = student.apply(
                {"params": p, "batch_stats": batch_stats}, x
            )
            return sum(
                jnp.mean(jnp.square(
                    a.astype(jnp.float32) - b.astype(jnp.float32)
                ))
                for a, b in zip(jax.tree.leaves(s_out),
                                jax.tree.leaves(t_out))
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    vols = [
        jnp.asarray(spherical_shell(SHAPE, seed=100 + i).astype("float32"))
        for i in range(8)
    ]

    # held-out plain-forward reference masks (collapse guard)
    plain_fwd = jax.jit(lambda v, x: teacher.apply(v, x, False))

    def plain_masks(var):
        outs = plain_fwd(var, jnp.asarray(calib, jnp.bfloat16))
        return [np.argmax(np.asarray(o, np.float32), -1) for o in outs]

    pre_masks = plain_masks(variables)
    t0 = time.perf_counter()
    losses = []
    for i in range(steps_n):
        params, opt_state, loss = distill_step(
            params, opt_state, vols[i % 8], jax.random.key(50_000 + i)
        )
        losses.append(loss)
        if (i + 1) % 100 == 0:
            print(f"  qat step {i+1}/{steps_n} "
                  f"distill_mse={float(losses[-1]):.3e}", flush=True)
    print(f"QAT {steps_n} steps in {time.perf_counter()-t0:.0f}s; "
          f"distill MSE {float(losses[0]):.3e} -> {float(losses[-1]):.3e}")

    # plain-forward collapse guard: the REAL serving forward must still
    # produce the same masks (QAT tunes robustness to rounding, it must
    # not retarget the network onto the clamped fq arithmetic)
    post_masks = plain_masks({"params": params, "batch_stats": batch_stats})
    for name, pre, post in zip(("sk", "fl"), pre_masks, post_masks):
        inter = float(np.sum((pre > 0) & (post > 0)))
        denom = float(np.sum(pre > 0) + np.sum(post > 0))
        d = 2.0 * inter / denom if denom else 1.0
        print(f"  plain-forward {name} mask dice pre->post QAT: {d:.4f} "
              f"(fg {int((pre > 0).sum())} -> {int((post > 0).sum())})")
        if d < 0.9:
            print("ABORT: plain forward diverged under QAT — not saving")
            sys.exit(1)

    out_path = ckpt_path.rstrip("/") + "_qat"
    ckpt_mod.save_checkpoint(out_path, steps.TrainState(
        params=params, batch_stats=batch_stats,
        opt_state=(), step=jnp.zeros((), jnp.int32),
    ))
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
