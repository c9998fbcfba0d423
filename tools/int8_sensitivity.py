#!/usr/bin/env python
"""Per-unit int8 sensitivity sweep (VERDICT r1 item 1b).

Using the engine-faithful fake-quant sim (ops/qat.py) on a trained
checkpoint, measures mask agreement vs the plain float forward when:

- everything is quantized (the int8 engine baseline),
- only WEIGHTS / only ACTIVATIONS are quantized (splits the damage),
- exactly ONE unit's activation output is quantized (16 variants) —
  ranks which unit's requant rounding actually flips flap voxels,
- all units EXCEPT the worst-k are quantized (validates a selective
  bf16 fallback set).

Usage: python tools/int8_sensitivity.py --ckpt .parity_ckpt_10k
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPE = (64, 128, 128)
N_TEST = 5


def main():
    ckpt_path = os.path.abspath(sys.argv[sys.argv.index("--ckpt") + 1])

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import checkpoint as ckpt_mod
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models import build_model
    from ctunet_tpu.ops import qat, synthesis
    from ctunet_tpu.ops.qat import QATModel, calibrate_unit_scales

    variables = ckpt_mod.load_any(ckpt_path, "UNetSP")
    atlas = spherical_shell(SHAPE, radius_frac=0.42).astype("float32")

    tests = []
    for i in range(N_TEST):
        full = spherical_shell(SHAPE, seed=900 + i).astype("float32")
        broken, _ = synthesis.skull_random_hole(
            jax.random.key(5000 + i), jnp.asarray(full)
        )
        tests.append(np.asarray(broken, np.float32))
    x_all = jnp.asarray(
        np.stack(
            [np.stack(tests), np.broadcast_to(atlas, (N_TEST, *SHAPE))], -1
        ),
        jnp.bfloat16,
    )

    calib_full = spherical_shell(SHAPE, seed=777).astype("float32")
    calib_broken, _ = synthesis.skull_random_hole(
        jax.random.key(9999), jnp.asarray(calib_full)
    )
    calib = np.stack(
        [np.asarray(calib_broken, np.float32), atlas], -1
    )[None]
    scales = calibrate_unit_scales("UNetSP", variables, calib)

    plain = build_model("UNetSP", compute_dtype="bfloat16")
    ref = jax.jit(lambda v, x: plain.apply(v, x, False))(variables, x_all)
    ref_sk = np.argmax(np.asarray(ref[0], np.float32), -1)
    ref_fl = np.argmax(np.asarray(ref[1], np.float32), -1)

    def dice(a, b):
        inter = float(np.sum((a > 0) & (b > 0)))
        sa, sb = float((a > 0).sum()), float((b > 0).sum())
        return 2 * inter / (sa + sb) if (sa + sb) else 1.0

    def run(label, sc):
        m = QATModel("UNetSP", scales=sc)
        out = jax.jit(lambda v, x: m.apply(v, x))(variables, x_all)
        sk = np.argmax(np.asarray(out[0], np.float32), -1)
        fl = np.argmax(np.asarray(out[1], np.float32), -1)
        d_sk, d_fl = dice(sk, ref_sk), dice(fl, ref_fl)
        print(f"{label:28s} sk {d_sk:.4f}  fl {d_fl:.4f}", flush=True)
        return d_fl

    run("ALL quantized", scales)

    # split: weights-only / acts-only (sim-local monkeypatch)
    orig_act, orig_w = qat._fq_act, qat._fq_weight
    qat._fq_act = lambda y, s: y
    run("weights only", scales)
    qat._fq_act = orig_act
    qat._fq_weight = lambda w, s: w
    run("activations only", scales)
    qat._fq_weight = orig_w

    # single-unit sweep (activation of that unit + successor weight fold)
    worst = []
    for tag in sorted(scales):
        d_fl = run(f"only {tag}", {tag: scales[tag]})
        worst.append((d_fl, tag))
    worst.sort()
    print("\nworst units (flap):", [(t, round(d, 4)) for d, t in worst[:6]])

    # drop the worst-k from the quantized set
    for k in (1, 2, 3, 4):
        keep = {
            t: s for t, s in scales.items()
            if t not in {t for _, t in worst[:k]}
        }
        run(f"all EXCEPT worst-{k}", keep)


if __name__ == "__main__":
    main()
