#!/usr/bin/env python
"""Run AdaQuant (quant_opt.optimize_rounding) on a trained checkpoint and
measure int8 engine mask parity vs the float forward, with and without
the optimized rounding.

Usage: python tools/adaquant_run.py --ckpt .parity_ckpt_10k
           [--steps 250] [--lr 0.03] [--calib-n 2] [--head 0] [--tail 0]
           [--save /tmp/adaquant.npz] [--learn-scales]

The in-script parity here is ENGINE vs FLOAT-MODEL masks on the 5
held-out test volumes (the cross-framework harness tools/parity_check.py
measures vs the actual torch reference; its bf16-engine column shows the
two agree to ~0.996+, so engine-vs-float is the right fast proxy).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPE = (64, 128, 128)
N_TEST = 5


def arg(name, default, cast):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    ckpt_path = os.path.abspath(arg("--ckpt", ".parity_ckpt_10k", str))
    steps = arg("--steps", 250, int)
    lr = arg("--lr", 0.03, float)
    calib_n = arg("--calib-n", 2, int)
    head = arg("--head", 0.0, float)
    tail = arg("--tail", 0.0, float)
    save = arg("--save", "", str)
    learn_scales = "--learn-scales" in sys.argv

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import checkpoint as ckpt_mod
    from ctunet_tpu import engine_q, quant_opt
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models import build_model
    from ctunet_tpu.ops import synthesis

    variables = ckpt_mod.load_any(ckpt_path, "UNetSP")
    atlas = spherical_shell(SHAPE, radius_frac=0.42).astype("float32")

    # calibration volumes (disjoint seeds from the test set)
    calib = []
    for i in range(calib_n):
        full = spherical_shell(SHAPE, seed=777 + i).astype("float32")
        broken, _ = synthesis.skull_random_hole(
            jax.random.key(9999 + i), jnp.asarray(full)
        )
        calib.append(np.stack([np.asarray(broken, np.float32), atlas], -1))
    calib = np.stack(calib)

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

    plain = build_model("UNetSP", compute_dtype="bfloat16")
    ref = jax.jit(lambda v, x: plain.apply(v, x, False))(variables, x_all)
    ref_sk = np.argmax(np.asarray(ref[0], np.float32), -1)
    ref_fl = np.argmax(np.asarray(ref[1], np.float32), -1)

    def dice(a, b):
        inter = float(np.sum((a > 0) & (b > 0)))
        sa, sb = float((a > 0).sum()), float((b > 0).sum())
        return 2 * inter / (sa + sb) if (sa + sb) else 1.0

    def engine_masks(ropt, imp=None):
        fn = engine_q.build_predict_q(
            "UNetSP", variables, jnp.asarray(calib[0], jnp.bfloat16),
            bf16_head=head, bf16_tail=tail, round_opt=ropt,
            import_scales=imp,
        )
        out = fn(x_all)
        return (np.argmax(np.asarray(out[0], np.float32), -1),
                np.argmax(np.asarray(out[1], np.float32), -1))

    # scales export (cheap rebuild; calibration runs once inside)
    scales: dict = {}
    m_sk, m_fl = engine_masks(None)
    print(f"RTN engine (h={head} t={tail}):   sk {dice(m_sk, ref_sk):.4f}"
          f"  fl {dice(m_fl, ref_fl):.4f}", flush=True)
    engine_q.build_predict_q(
        "UNetSP", variables, jnp.asarray(calib[0], jnp.bfloat16),
        bf16_head=head, bf16_tail=tail, export_scales=scales, jit=False,
    )

    import time
    t0 = time.perf_counter()
    refined: dict = {}
    ropt = quant_opt.optimize_rounding(
        "UNetSP", variables, calib, scales, steps=steps, lr=lr,
        verbose=True, learn_scales=learn_scales, out_scales=refined,
        bf16_head=head,
    )
    print(f"optimize_rounding: {time.perf_counter()-t0:.0f}s "
          f"(learn_scales={learn_scales})", flush=True)

    m_sk, m_fl = engine_masks(ropt, refined)
    label = "AdaQuant+LS" if learn_scales else "AdaQuant"
    print(f"{label} engine (h={head} t={tail}): "
          f"sk {dice(m_sk, ref_sk):.4f}  fl {dice(m_fl, ref_fl):.4f}",
          flush=True)

    if save:
        flat = {}
        for tag, ov in ropt.items():
            for kk, vv in ov.items():
                flat[f"{tag}:{kk}"] = vv
        np.savez(save, **flat)
        print(f"saved overrides to {save}")


if __name__ == "__main__":
    main()
