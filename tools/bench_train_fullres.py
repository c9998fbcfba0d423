#!/usr/bin/env python
"""Whole-volume 224x304x304 train-step timing (the reference's headline
training config, ``examples/UNetSPDO/FlapRecSP2O.ini``).

Times the full jitted step (on-device synthesis + bf16 fwd/bwd with remat
+ optax update) and reports ms/step, with the conv implementation and the
step loss printed so impl experiments can be compared for BOTH speed and
exactness (same seed => same synthesis => identical loss trajectories).

Usage: PYTHONPATH=. python tools/bench_train_fullres.py
           [--impl xla|xla_dw|chain] [--packed] [--iters N]
           [--shape D,H,W] [--fg-crop [D,H,W]]

``--fg-crop``: foreground-crop training (``b_fg_crop_train``) — crops
each volume to the skull bbox + margin at a static size before
synthesis. With no explicit size, the size is planned from the bench
skull exactly like the trainer plans it from the dataset.

``--packed`` routes the step through the packed-RESIDENT training graph
(models/packed_resident.py).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    impl = "xla"
    if "--impl" in sys.argv:
        impl = sys.argv[sys.argv.index("--impl") + 1]
    n_iters = 5
    if "--iters" in sys.argv:
        n_iters = int(sys.argv[sys.argv.index("--iters") + 1])
    shape = (224, 304, 304)
    if "--shape" in sys.argv:
        shape = tuple(
            int(v) for v in sys.argv[sys.argv.index("--shape") + 1].split(",")
        )

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from ctunet_tpu import problem, steps
    from ctunet_tpu.data.synthetic import spherical_shell
    from ctunet_tpu.models import build_model
    from ctunet_tpu.ops import packed_conv

    packed_conv.set_conv_impl(impl)
    if "--chain-min-pack" in sys.argv:
        from ctunet_tpu.ops import chain_conv_train

        mp = int(sys.argv[sys.argv.index("--chain-min-pack") + 1])
        chain_conv_train.set_chain_min_pack(mp)
        impl = impl + f"(minpack{mp})"
    model = build_model("UNetSP", compute_dtype="bfloat16")
    packed = "--packed" in sys.argv
    if packed:
        from ctunet_tpu.models.packed_resident import PackedResidentModel

        policy = "default"
        if "--remat" in sys.argv:
            policy = sys.argv[sys.argv.index("--remat") + 1]
        model = PackedResidentModel(
            model, "UNetSP", use_remat=(policy != "none"),
            remat_policy=policy if policy != "none" else "default",
        )
        impl = impl + f"+packed_resident({policy})"
    x = jnp.zeros((1, *shape, 2), jnp.bfloat16)
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
    atlas = spherical_shell(shape, radius_frac=0.42).astype("float32")
    # keep the host numpy shell: planning the fg crop from the uploaded
    # device array would fetch ~4 MB D2H, the large-transfer class that
    # wedges the axon staging tunnel (ADVICE r4 / docs/tpu_tunnel.md)
    img_host = spherical_shell(shape, radius_frac=0.4)[None].astype("float32")
    batch = {"image": jnp.asarray(img_host)}
    fg_size = None
    if "--fg-crop" in sys.argv:
        nxt = (sys.argv[sys.argv.index("--fg-crop") + 1]
               if sys.argv.index("--fg-crop") + 1 < len(sys.argv) else "")
        if "," in nxt:
            fg_size = tuple(int(v) for v in nxt.split(","))
        else:
            fg_size = steps.fg_crop_size_for(
                [img_host[0]], shape, margin=16, multiple=16,
            )
        impl = impl + f"+fg_crop{fg_size}"
        print(f"fg-crop training window: {fg_size}", flush=True)
    train_step = steps.make_train_step(
        model, handler, optimizer,
        {"ce_lambda": 1.0, "dice_lambda": 1.0, "save_dice_plots": False},
        atlas=atlas, compute_dtype=jnp.bfloat16, fg_crop_size=fg_size,
    )
    t0 = time.perf_counter()
    state, terms = train_step(state, batch, jax.random.key(0))
    loss0 = float(terms["epoch_loss"])  # forces sync (tunnel-honest)
    print(f"[{impl}] compile+first: {time.perf_counter()-t0:.1f}s "
          f"loss={loss0:.6f}", flush=True)
    losses = [loss0]
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        state, terms = train_step(state, batch, jax.random.key(i + 1))
        losses.append(float(terms["epoch_loss"]))
        times.append(time.perf_counter() - t0)
    best = min(times) * 1000
    print(f"[{impl}] {shape} train step: best {best:.0f} ms "
          f"({1000.0/best:.2f} steps/s); losses "
          f"{' '.join(f'{v:.6f}' for v in losses)}", flush=True)

    if "--profile" in sys.argv:
        # device-time top-op attribution (VERDICT r2 weak #2: no post-
        # packed-resident full-res profile was recorded) — reuses
        # bench.py's xplane breakdown
        import json

        import bench as _bench

        holder = {"s": state}

        def _once():
            holder["s"], t = train_step(
                holder["s"], batch, jax.random.key(99)
            )
            float(t["epoch_loss"])

        prof = _bench.profile_breakdown(_once, iters=3)
        if prof:
            print(json.dumps({"train_profile": prof}), flush=True)


if __name__ == "__main__":
    main()
