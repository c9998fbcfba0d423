#!/usr/bin/env python
"""End-to-end serving benchmark: NIfTI files on disk -> masks on disk.

Unlike bench.py (device-only throughput), this measures the WHOLE serving
path through the public ``Model`` test entry point: threaded NIfTI decode,
pad + atlas concat, whole-volume inference (bf16 engine, or int8 with
``--int8``), device fetch, argmax, and NIfTI writes — with the trainer's
pipelined dispatch (predictions stay in flight while writes happen on a
thread pool).

Synthetic 224x304x304 broken skulls are staged as uint8 NIfTI (the
reference's preprocessed-volume format). Prints one JSON line.

Usage: python tools/bench_serve.py [--n 16] [--int8] [--xla] [--profile]
           [--fg-crop] [--scan K]

``--fg-crop``: serve the foreground bbox + margin (``b_fg_crop``).
``--scan K``: batch K volumes through one lax.scan dispatch
(``i_serve_scan`` — the productized bench-headline dispatch mode).

``--profile`` prints per-stage loop-blocking times (decode wait, pad,
upload, dispatch, fetch+unpack, write drain) to attribute the gap between
the device rate and the end-to-end rate.
"""

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPE = (224, 304, 304)


def stage_dataset(root: str, n: int) -> str:
    import numpy as np

    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.utils import nifti

    os.makedirs(root, exist_ok=True)
    paths = []
    base = spherical_shell(SHAPE, seed=11).astype(np.uint8)
    for i in range(n):
        # distinct volumes (roll z) so decode caching can't cheat
        vol = np.roll(base, i, axis=0)
        p = os.path.join(root, f"skull_{i:03d}.nii.gz")
        nifti.write(p, nifti.NiftiImage(data=vol))
        paths.append(p)
    csv = os.path.join(root, "files.csv")
    with open(csv, "w") as f:
        # header row first: the CSV convention is pandas-read with a header
        # (reference ``datasets.py:81``)
        f.write("image,mask\n")
        f.write("\n".join(f"{p}," for p in paths) + "\n")
    return csv


def main() -> None:
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 16

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import Model, checkpoint, steps
    from ctunet_tpu.data.atlas import register_atlas
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models import build_model

    root = tempfile.mkdtemp(prefix="serve_bench_")
    try:
        csv = stage_dataset(os.path.join(root, "data"), n)
        register_atlas(SHAPE, spherical_shell(SHAPE, radius_frac=0.42))

        # Stage a checkpoint (random-init weights; serving cost is
        # weight-independent) where the test entry point expects it.
        model = build_model("UNetSP", compute_dtype="bfloat16")
        x0 = jnp.zeros((1, *SHAPE, 2), jnp.bfloat16)
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.key(0), x0, False
        )
        ws = os.path.join(root, "ws")
        ckpt = os.path.join(
            ws, "UNetSP_FlapRecWithShapePriorDoubleOut", "model",
            "serve.ckpt",
        )
        os.makedirs(os.path.dirname(ckpt), exist_ok=True)
        state = steps.TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=(), step=jnp.zeros((), jnp.int32),
        )
        checkpoint.save_checkpoint(ckpt, state)

        params = dict(
            train_flag=False, test_flag=True, name="serve",
            model_class="UNetSP",
            problem_handler="FlapRecWithShapePriorDoubleOut",
            device="tpu", batch_size=1, workspace_path=ws,
            test_files_csv=csv, n_workers=4, compute_dtype="bfloat16",
            log_every=0, seed=0,
            use_engine="--xla" not in sys.argv,
            use_int8="--int8" in sys.argv,
            serve_profile="--profile" in sys.argv,
            fg_crop="--fg-crop" in sys.argv,
            serve_scan=(int(sys.argv[sys.argv.index("--scan") + 1])
                        if "--scan" in sys.argv else 1),
        )
        t0 = time.perf_counter()
        Model(params=params)
        wall = time.perf_counter() - t0

        pred_dir = os.path.join(root, "data", "pred_serve")
        outs = sorted(
            os.path.join(pred_dir, f) for f in os.listdir(pred_dir)
            if f.endswith("_fl.nii.gz")
        )
        assert len(outs) == n, (len(outs), n)
        # wall includes one-time compile+calibration; the marginal rate
        # from output mtimes (first written -> last written) excludes it.
        mtimes = sorted(os.path.getmtime(p) for p in outs)
        span = mtimes[-1] - mtimes[0]
        print(json.dumps({
            "metric": "end-to-end serving, NIfTI in -> masks out, "
                      "UNetSP 224x304x304",
            "mode": ("int8" if params["use_int8"] else
                     ("engine" if params["use_engine"] else "xla"))
                    + ("+fg_crop" if params["fg_crop"] else "")
                    + (f"+scan{params['serve_scan']}"
                       if params["serve_scan"] > 1 else ""),
            "volumes": n,
            "wall_s": round(wall, 2),
            "volumes_per_sec_incl_compile": round(n / wall, 3),
            "volumes_per_sec_marginal": (
                round((n - 1) / span, 3) if span > 0 else None
            ),
            # steady state: rate over the second half of the outputs —
            # the first half absorbs the lazy engine builds and the
            # scan-shape compiles (with --scan, group 1 warms the
            # engine and compiles scan K-1, group 2 compiles scan K)
            "volumes_per_sec_tail": (
                round((n - n // 2) / (mtimes[-1] - mtimes[n // 2 - 1]), 3)
                if n >= 4 and mtimes[-1] > mtimes[n // 2 - 1] else None
            ),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
