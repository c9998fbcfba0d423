#!/usr/bin/env python
"""AOT compile-only memory analysis of full-res train-step variants.

Lowers + compiles the train step WITHOUT executing it and prints XLA's
memory analysis (argument/output/temp/generated-code bytes) plus the
largest HLO temp buffers from the buffer-assignment dump. Iterating on
OOM fixes (e.g. the packed-resident graph's backward temps) this way
costs one remote compile per variant instead of a full run.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/mem_train.py
           [--impl xla|xla_dw] [--packed] [--policy dots|nothing|default]
           [--shape D,H,W]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    shape = (224, 304, 304)
    if "--shape" in sys.argv:
        shape = tuple(
            int(v) for v in sys.argv[sys.argv.index("--shape") + 1].split(",")
        )
    impl = "xla"
    if "--impl" in sys.argv:
        impl = sys.argv[sys.argv.index("--impl") + 1]
    packed = "--packed" in sys.argv
    policy = "default"
    if "--policy" in sys.argv:
        policy = sys.argv[sys.argv.index("--policy") + 1]

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
    handler = problem.FlapRecWithShapePriorDoubleOut()
    atlas = spherical_shell(shape, radius_frac=0.42).astype("float32")

    model = build_model("UNetSP", compute_dtype="bfloat16")
    x0 = jnp.zeros((1, *shape, 2), jnp.bfloat16)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x0, False)
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    if packed:
        from ctunet_tpu.models.packed_resident import PackedResidentModel

        model = PackedResidentModel(
            model, "UNetSP", use_remat=True, remat_policy=policy
        )

    optimizer = steps.make_optimizer(
        {"optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 0.0}
    )
    state = steps.TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    train_step = steps.make_train_step(
        model, handler, optimizer,
        {"ce_lambda": 1.0, "dice_lambda": 1.0, "save_dice_plots": False},
        atlas=atlas, compute_dtype=jnp.bfloat16,
    )
    batch = {"image": jnp.zeros((1, *shape), jnp.float32)}

    import time
    t0 = time.perf_counter()
    lowered = train_step.lower(state, batch, jax.random.key(0))
    try:
        compiled = lowered.compile()
    except Exception as e:
        print(f"COMPILE FAILED ({time.perf_counter()-t0:.0f}s):")
        msg = str(e)
        print(msg[:4000])
        # surface the biggest allocations from the OOM report
        import re
        sizes = re.findall(
            r"Size: ([\d.]+)([MG]) \n\s+Shape: (\S+)", msg
        ) or re.findall(r"(\d+\.\d+)(G|M)\b[^\n]*\n\s*Shape: (\S+)", msg)
        for s_, u, sh in sizes[:20]:
            print(f"  {s_}{u}  {sh}")
        sys.exit(1)
    print(f"compiled in {time.perf_counter()-t0:.0f}s "
          f"(impl={impl} packed={packed} policy={policy})")
    ma = compiled.memory_analysis()
    print(ma)
    ga = getattr(ma, "temp_size_in_bytes", None)
    if ga is not None:
        print(f"temp {ga/2**30:.2f} GiB; args "
              f"{ma.argument_size_in_bytes/2**30:.2f} GiB; output "
              f"{ma.output_size_in_bytes/2**30:.2f} GiB")


if __name__ == "__main__":
    main()
