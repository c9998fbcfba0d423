#!/usr/bin/env python
"""TPU-free int8 PTQ parity preview via the engine-faithful simulator.

Runs entirely on CPU (or any backend): simulator calibration
(``quant_opt.simulate_scales``), optional AdaQuant / learned-scales
optimization on calibration volumes, then evaluation of the fixed
quantization on held-out test volumes — flap/skull mask Dice vs the
float forward. Mirrors ``tools/adaquant_run.py`` (which needs the real
engine on a TPU); use this to preview PTQ configs when no chip is
available. The simulation covers every engine rounding except the int8
head (measured mild), so treat results as estimates: the engine numbers
from adaquant_run / parity_check are authoritative.

Usage: python tools/quant_sim_eval.py --ckpt .parity_ckpt_10k
           [--steps 250] [--lr 0.03] [--calib-n 2] [--head 0]
           [--modes rtn,aq,aq_ls]
"""

import os
import sys
import time

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
    modes = arg("--modes", "rtn,aq,aq_ls", str).split(",")

    import jax
    if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
        # the env var alone is not honored once the TPU plugin's
        # sitecustomize has run; force the platform explicitly so the
        # preview never blocks on an unavailable chip
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import checkpoint as ckpt_mod
    from ctunet_tpu import quant_opt
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.ops import synthesis

    variables = ckpt_mod.load_any(ckpt_path, "UNetSP")
    atlas = spherical_shell(SHAPE, radius_frac=0.42).astype("float32")

    def broken(seed_v, seed_k):
        full = spherical_shell(SHAPE, seed=seed_v).astype("float32")
        b, _ = synthesis.skull_random_hole(
            jax.random.key(seed_k), jnp.asarray(full)
        )
        return np.asarray(b, np.float32)

    calib = np.stack([
        np.stack([broken(777 + i, 9999 + i), atlas], -1)
        for i in range(calib_n)
    ])
    tests = np.stack([
        np.stack([broken(900 + i, 5000 + i), atlas], -1)
        for i in range(N_TEST)
    ])

    t0 = time.perf_counter()
    scales = quant_opt.simulate_scales("UNetSP", variables, calib)
    print(f"simulate_scales: {time.perf_counter()-t0:.0f}s", flush=True)

    def masks(out):
        return tuple(
            np.argmax(np.asarray(o, np.float32), -1)
            for o in jax.tree.leaves(out)
        )

    def dice(a, b):
        inter = float(np.sum((a > 0) & (b > 0)))
        sa, sb = float((a > 0).sum()), float((b > 0).sum())
        return 2 * inter / (sa + sb) if (sa + sb) else 1.0

    # float reference masks (sim float path == model forward, tested)
    _, out_f, _ = quant_opt.optimize_rounding(
        "UNetSP", variables, tests, scales, tags=set(),
        return_outputs=True, bf16_head=head,
    )
    ref_sk, ref_fl = masks(out_f)

    def evaluate(label, eval_scales, ropt):
        _, _, out_q = quant_opt.optimize_rounding(
            "UNetSP", variables, tests, eval_scales, tags=set(),
            apply_opt=ropt, return_outputs=True, bf16_head=head,
        )
        m_sk, m_fl = masks(out_q)
        print(f"{label} (h={head}): sim sk {dice(m_sk, ref_sk):.4f}  "
              f"fl {dice(m_fl, ref_fl):.4f}", flush=True)

    if "rtn" in modes:
        evaluate("RTN        ", scales, None)
    if "aq" in modes:
        t0 = time.perf_counter()
        ropt = quant_opt.optimize_rounding(
            "UNetSP", variables, calib, scales, steps=steps, lr=lr,
            bf16_head=head, verbose=True,
        )
        print(f"adaquant: {time.perf_counter()-t0:.0f}s", flush=True)
        evaluate("AdaQuant   ", scales, ropt)
    if "aq_ls" in modes:
        t0 = time.perf_counter()
        refined: dict = {}
        ropt_ls = quant_opt.optimize_rounding(
            "UNetSP", variables, calib, scales, steps=steps, lr=lr,
            learn_scales=True, out_scales=refined, bf16_head=head,
            verbose=True,
        )
        print(f"adaquant+ls: {time.perf_counter()-t0:.0f}s", flush=True)
        evaluate("AdaQuant+LS", refined, ropt_ls)


if __name__ == "__main__":
    main()
