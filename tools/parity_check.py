#!/usr/bin/env python
"""Trained-checkpoint cross-framework parity (VERDICT round-1 item 5).

Trains UNetSP at the reference's 128-res configuration on synthetic skulls
(on-device synthesis, Dice+CE, Adam — the ``FlapRecSP2O_128.ini`` recipe),
exports the trained variables to the reference's torch state_dict layout,
runs BOTH frameworks on the same held-out broken skulls, and reports the
Dice overlap between the two implementations' output masks.

Writes ``PARITY.json`` at the repo root; ``bench.py`` surfaces it as the
``parity`` field. Target: >= 0.999 mask Dice (BASELINE.json metric).

Usage: PYTHONPATH=. python tools/parity_check.py [--steps N]
           [--ckpt PATH] [--csv FILES.csv [--atlas ATLAS.nii.gz]]
           [--configs h:t:aq,...]

``--ckpt``: orbax checkpoint path. When it exists, training is SKIPPED
and the checkpoint is evaluated (cheap engine-variant re-measurement on
the same trained weights); otherwise the freshly trained variables are
saved there.

``--csv``: REAL-DATA runbook (VERDICT r2 weak #7 / BASELINE.json north
star). A CSV of complete-skull NIfTI paths (one per line, optional
header) — e.g. preprocessed autoimplant2020 volumes. The harness applies
the same fixed-seed virtual craniectomies to them and reports
cross-framework mask Dice on the real anatomy. All volumes must share
one shape with each dim divisible by 16; ``--atlas`` supplies the
matching skull atlas (default: the registered atlas for that shape, or
a spherical-shell stand-in with a loud warning). Requires ``--ckpt``
with trained weights for that resolution. Exact invocation once
autoimplant2020 is mounted:

  PYTHONPATH=. python tools/parity_check.py \
      --ckpt /path/to/trained_128 \
      --csv ~/headctools/autoimplant2020/complete_skulls.csv \
      --atlas ~/headctools/assets/atlas/reg/atlas_128.nii.gz
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPE = (64, 128, 128)
N_TEST = 5


def train(steps_n: int):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import problem, steps
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models import build_model

    model = build_model("UNetSP", compute_dtype="bfloat16")
    x = jnp.zeros((1, *SHAPE, 2), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False
    )
    optimizer = steps.make_optimizer(
        {"optimizer": "adam", "learning_rate": 1e-3, "weight_decay": 0.0}
    )
    state = steps.TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    handler = problem.FlapRecWithShapePriorDoubleOut()
    atlas = spherical_shell(SHAPE, radius_frac=0.42).astype("float32")
    train_step = steps.make_train_step(
        model, handler, optimizer,
        {"ce_lambda": 1.0, "dice_lambda": 1.0, "save_dice_plots": False},
        atlas=atlas, compute_dtype=jnp.bfloat16,
    )
    # Pre-stage the whole 8-volume training set on device once: a per-step
    # 4 MB f32 upload through the staging tunnel costs more than the step
    # itself (measured ~700 ms/step vs ~60 ms compute), and the synthesis
    # is already on-device so nothing else crosses the link per step.
    vols = jnp.stack([
        jnp.asarray(spherical_shell(SHAPE, seed=100 + i).astype("float32"))
        for i in range(8)
    ])
    t0 = time.perf_counter()
    losses = []
    for i in range(steps_n):
        batch = {"image": vols[i % 8][None]}
        state, terms = train_step(state, batch, jax.random.key(i))
        losses.append(terms["epoch_loss"])
        if (i + 1) % 200 == 0:
            print(f"  step {i+1}/{steps_n} loss={float(losses[-1]):.4f}",
                  flush=True)
    print(f"trained {steps_n} steps in {time.perf_counter()-t0:.0f}s; "
          f"loss {float(losses[0]):.3f} -> {float(losses[-1]):.3f}")
    return model, {"params": state.params, "batch_stats": state.batch_stats}, atlas


def main():
    steps_n = 3000
    if "--steps" in sys.argv:
        steps_n = int(sys.argv[sys.argv.index("--steps") + 1])
    ckpt_path = None
    if "--ckpt" in sys.argv:
        ckpt_path = os.path.abspath(sys.argv[sys.argv.index("--ckpt") + 1])

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import engine
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models.torch_port import export_state_dict
    from ctunet_tpu.ops import synthesis

    if ckpt_path and os.path.exists(ckpt_path):
        from ctunet_tpu import checkpoint as ckpt_mod
        from ctunet_tpu.models import build_model

        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        print(f"loading trained checkpoint {ckpt_path} (skip training)")
        # the --steps default would mislabel a loaded checkpoint; infer
        # the step count from the checkpoint name (".._10k") if present
        base = os.path.basename(ckpt_path)
        if "10k" in base:
            steps_n = 10000
        model = build_model("UNetSP", compute_dtype="bfloat16")
        variables = ckpt_mod.load_any(ckpt_path, "UNetSP")
        atlas = spherical_shell(SHAPE, radius_frac=0.42).astype("float32")
    else:
        model, variables, atlas = train(steps_n)
        if ckpt_path:
            from ctunet_tpu import checkpoint as ckpt_mod
            from ctunet_tpu import steps as _steps

            ckpt_mod.save_checkpoint(ckpt_path, _steps.TrainState(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                opt_state=(), step=jnp.zeros((), jnp.int32),
            ))
            print(f"saved trained checkpoint to {ckpt_path}")

    # Weights fingerprint: --merge is only valid against the SAME
    # checkpoint; a merge over retrained weights would silently publish
    # mixed-provenance parity numbers (ADVICE r3).
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(variables["params"]):
        h.update(np.asarray(leaf, np.float32).tobytes())
    ckpt_fingerprint = h.hexdigest()[:16]

    # Held-out test inputs: broken skulls (fixed-seed virtual craniectomy)
    # — synthetic shells by default, REAL complete skulls with --csv.
    shape = SHAPE
    if "--csv" in sys.argv:
        csv_path = sys.argv[sys.argv.index("--csv") + 1]
        from ctunet_tpu.utils import nifti

        paths = []
        with open(csv_path) as f:
            for line in f:
                p = line.strip().split(",")[0]
                if p and not p.lower().startswith(("filepath", "path")):
                    paths.append(os.path.expanduser(p))
        assert paths, f"no file paths in {csv_path}"
        fulls = []
        for p in paths:
            vol = (np.asarray(nifti.read(p).data) > 0).astype("float32")
            fulls.append(vol)
            assert vol.shape == fulls[0].shape, (
                f"{p}: shape {vol.shape} != {fulls[0].shape} — preprocess "
                f"to one resolution first (reference uses headctools)"
            )
        shape = fulls[0].shape
        assert all(s % 16 == 0 for s in shape), (
            f"dims of {shape} must divide by 16 (pad volumes first)"
        )
        if "--atlas" in sys.argv:
            atlas = (np.asarray(nifti.read(
                os.path.expanduser(sys.argv[sys.argv.index("--atlas") + 1])
            ).data) > 0).astype("float32")
            assert atlas.shape == shape, (atlas.shape, shape)
        else:
            from ctunet_tpu.data.atlas import get_atlas

            try:
                atlas = np.asarray(get_atlas(shape), np.float32)
            except Exception:
                print("WARNING: no atlas registered for "
                      f"{shape}; using a spherical-shell stand-in — "
                      "pass --atlas for real-data parity", flush=True)
                atlas = spherical_shell(shape, radius_frac=0.42).astype(
                    "float32")
        print(f"real-data parity: {len(fulls)} volumes at {shape} "
              f"from {csv_path}", flush=True)
    else:
        fulls = [
            spherical_shell(shape, seed=900 + i).astype("float32")
            for i in range(N_TEST)
        ]
    tests = []
    for i, full in enumerate(fulls):
        broken, _ = synthesis.skull_random_hole(
            jax.random.key(5000 + i), jnp.asarray(full)
        )
        tests.append(np.asarray(broken, np.float32))
    tests = np.stack(tests)
    atlas_b = np.broadcast_to(atlas, tests.shape)
    x_all = np.stack([tests, atlas_b], -1)  # (N, D, H, W, 2)

    # --- this framework: fused engine (bf16, the serving path) ---
    predict = engine.build_predict("UNetSP", variables)
    outs = predict(jnp.asarray(x_all, jnp.bfloat16))
    ours_sk = np.argmax(np.asarray(outs[0], np.float32), -1)
    ours_fl = np.argmax(np.asarray(outs[1], np.float32), -1)

    # --- int8 quantized engine, calibrated on a DISJOINT broken skull ---
    from ctunet_tpu import engine_q

    calib_full = spherical_shell(SHAPE, seed=777).astype("float32")
    calib_broken, _ = synthesis.skull_random_hole(
        jax.random.key(9999), jnp.asarray(calib_full)
    )
    calib = jnp.asarray(
        np.stack([np.asarray(calib_broken, np.float32), atlas], -1),
        jnp.bfloat16,
    )
    q_masks = {}  # (head, tail, adaquant) -> (sk, fl)
    configs = [
        (0, 0, 0), (0, 1, 0), (0, 2, 0),
        (0.5, 0, 0), (1, 0, 0), (1.5, 0, 0), (2, 0, 0),
        (1, 0.5, 0), (1, 1, 0), (1.5, 0.5, 0),
        (0, 0, 1), (0.5, 0, 1), (1, 0, 1),
        (0, 0, 2), (0.5, 0, 2),
    ]
    if "--configs" in sys.argv:
        configs = [
            tuple(float(v) for v in triple.split(":"))
            for triple in
            sys.argv[sys.argv.index("--configs") + 1].split(",")
        ]
    try:
        for head, tail, aq in configs:
            if aq:
                # aq=1: AdaQuant weight rounding; aq=2: + learned scales
                predict_q = engine_q.build_predict_q_opt(
                    "UNetSP", variables, calib,
                    bf16_tail=tail, bf16_head=head,
                    learn_scales=(aq >= 2),
                )
            else:
                predict_q = engine_q.build_predict_q(
                    "UNetSP", variables, calib,
                    bf16_tail=tail, bf16_head=head,
                )
            outs_q = predict_q(jnp.asarray(x_all, jnp.bfloat16))
            q_masks[(head, tail, aq)] = (
                np.argmax(np.asarray(outs_q[0], np.float32), -1),
                np.argmax(np.asarray(outs_q[1], np.float32), -1),
            )
            print(f"  int8 engine (head={head}, tail={tail}, "
                  f"adaquant={bool(aq)}) done", flush=True)
    except Exception as e:
        print(f"int8 engine skipped: {type(e).__name__}: {e}", flush=True)

    # --- QAT-tuned weights (tools/qat_tune.py output), int8 columns ---
    # Evaluated against the SAME reference masks (from the pre-QAT
    # weights): the protected behavior is agreement with the reference
    # torch forward, and QAT must close the int8 gap without moving the
    # plain-forward masks (dice_*_engine_bf16_qat records that too).
    qat_masks = {}  # label suffix -> (sk, fl)
    if "--qat-ckpt" in sys.argv:
        from ctunet_tpu import checkpoint as ckpt_mod

        qat_path = os.path.abspath(
            sys.argv[sys.argv.index("--qat-ckpt") + 1])
        print(f"evaluating QAT checkpoint {qat_path}", flush=True)
        variables_qat = ckpt_mod.load_any(qat_path, "UNetSP")
        predict_bq = engine.build_predict("UNetSP", variables_qat)
        outs_bq = predict_bq(jnp.asarray(x_all, jnp.bfloat16))
        qat_masks["bf16_qat"] = (
            np.argmax(np.asarray(outs_bq[0], np.float32), -1),
            np.argmax(np.asarray(outs_bq[1], np.float32), -1),
        )
        for label, aq in (("int8_qat", 0), ("int8_qat_aq", 1)):
            build = (engine_q.build_predict_q_opt if aq
                     else engine_q.build_predict_q)
            predict_q = build("UNetSP", variables_qat, calib)
            outs_q = predict_q(jnp.asarray(x_all, jnp.bfloat16))
            qat_masks[label] = (
                np.argmax(np.asarray(outs_q[0], np.float32), -1),
                np.argmax(np.asarray(outs_q[1], np.float32), -1),
            )
            print(f"  QAT {label} done", flush=True)

    # and a true-f32 forward (f32-built model, same params) for a
    # dtype-insensitivity reference against the torch f32 run
    from ctunet_tpu.models import build_model

    model32 = build_model("UNetSP", compute_dtype="float32")
    fwd = jax.jit(lambda v, x: model32.apply(v, x, False))
    outs32 = fwd(variables, jnp.asarray(x_all, jnp.float32))
    ours32_sk = np.argmax(np.asarray(outs32[0], np.float32), -1)
    ours32_fl = np.argmax(np.asarray(outs32[1], np.float32), -1)

    # --- reference implementation (its own torch code, CPU) ---
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "refmodels", "/root/reference/ctunet/pytorch/models.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    tm = ref.UNetSP()
    full_sd = tm.state_dict()
    full_sd.update({
        k: torch.tensor(v) for k, v in
        export_state_dict(variables, "UNetSP").items()
    })
    tm.load_state_dict(full_sd)
    tm.eval()
    ref_sk, ref_fl = [], []
    with torch.no_grad():
        for i in range(N_TEST):
            xt = torch.tensor(x_all[i][None]).permute(0, 4, 1, 2, 3)
            o_sk, o_fl = tm(xt)
            ref_sk.append(o_sk.numpy().argmax(1)[0])
            ref_fl.append(o_fl.numpy().argmax(1)[0])
            print(f"  torch reference volume {i+1}/{N_TEST} done", flush=True)
    ref_sk = np.stack(ref_sk)
    ref_fl = np.stack(ref_fl)

    def dice(a, b):
        inter = float(np.sum((a > 0) & (b > 0)))
        sa, sb = float(np.sum(a > 0)), float(np.sum(b > 0))
        return 2.0 * inter / (sa + sb) if (sa + sb) else 1.0

    report = {
        "metric": "cross-framework mask Dice on 5 synthetic skulls "
                  "(trained 128-res UNetSP; this impl vs reference torch "
                  "impl running the exported checkpoint)",
        "train_steps": steps_n,
        "dice_sk_engine_bf16": round(dice(ours_sk, ref_sk), 6),
        "dice_fl_engine_bf16": round(dice(ours_fl, ref_fl), 6),
        "dice_sk_xla_f32": round(dice(ours32_sk, ref_sk), 6),
        "dice_fl_xla_f32": round(dice(ours32_fl, ref_fl), 6),
        **{
            k: v
            for (head, tail, aq), (m_sk, m_fl) in sorted(q_masks.items())
            for k, v in {
                (f"dice_sk_engine_int8_h{head}_t{tail}"
                 + ("_aq_ls" if aq >= 2 else "_aq" if aq else "")).replace(".5", "h"):
                    round(dice(m_sk, ref_sk), 6),
                (f"dice_fl_engine_int8_h{head}_t{tail}"
                 + ("_aq_ls" if aq >= 2 else "_aq" if aq else "")).replace(".5", "h"):
                    round(dice(m_fl, ref_fl), 6),
            }.items()
        },
        **{
            k: v
            for label, (m_sk, m_fl) in sorted(qat_masks.items())
            for k, v in {
                f"dice_sk_engine_{label}": round(dice(m_sk, ref_sk), 6),
                f"dice_fl_engine_{label}": round(dice(m_fl, ref_fl), 6),
            }.items()
        },
        "foreground_voxels_sk": int((ref_sk > 0).sum()),
        "foreground_voxels_fl": int((ref_fl > 0).sum()),
        "ckpt_fingerprint": ckpt_fingerprint,
    }
    out_path = os.path.join(REPO, "PARITY.json")
    if "--merge" in sys.argv and os.path.exists(out_path):
        # Partial re-measurement of the SAME checkpoint (e.g. adding QAT
        # columns with a restricted --configs list): keep every previously
        # measured column, overwrite the ones measured this run. The
        # sha256 params fingerprint guards against merging numbers from
        # different weights (ADVICE r3).
        with open(out_path) as f:
            merged = json.load(f)
        old_fp = merged.get("ckpt_fingerprint")
        if old_fp is not None and old_fp != ckpt_fingerprint:
            raise SystemExit(
                f"--merge refused: PARITY.json was measured on checkpoint "
                f"{old_fp}, this run evaluates {ckpt_fingerprint}. Run "
                f"without --merge to replace the report."
            )
        merged.update(report)
        report = merged
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
