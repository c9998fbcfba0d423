"""Subprocess worker for tests/test_distributed.py.

Runs the PUBLIC ``Model`` train loop as one rank of a 2-process
``jax.distributed`` group on the CPU backend (2 virtual devices per
process -> 4 global devices), then dumps the scalar history to JSON for
the parent test to compare against the single-process run.

Usage: python _dist_worker.py <rank> <coord> <root> <csv> <out_prefix>
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    rank = int(sys.argv[1])
    coord = sys.argv[2]
    root = sys.argv[3]
    csv = sys.argv[4]
    out_prefix = sys.argv[5]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ctunet_tpu import Model
    from ctunet_tpu.data import spherical_shell
    from ctunet_tpu.data.atlas import register_atlas

    register_atlas((32, 32, 32), spherical_shell((32, 32, 32)))

    m = Model(params=dict(
        train_flag=True,
        test_flag=False,
        name="dist2p",
        model_class="UNetSP",
        problem_handler="FlapRecWithShapePriorDoubleOut",
        n_epochs=2,
        batch_size=4,
        dice_lambda=1.0,
        ce_lambda=1.0,
        optimizer="adam",
        learning_rate=1e-3,
        momentum=0.99,
        weight_decay=0.0,
        # SHARED workspace: orbax's multihost save barriers on the target
        # path, so all ranks must agree on it (the realistic deployment
        # is a shared filesystem)
        workspace_path=os.path.join(root, "ws_dist"),
        train_files_csv=csv,
        validation_files_csv=csv,
        autosave_epochs=0,
        save_dice_plots=True,
        n_workers=2,
        compute_dtype="float32",
        remat=False,
        log_every=0,
        seed=0,
        mesh_data=4,
        distributed=True,
        dist_coordinator=coord,
        dist_num_processes=2,
        dist_process_id=rank,
    ))
    hist = {
        k: [v for _, v in vals] for k, vals in m.writer.history.items()
    }
    hist["_process_count"] = m.process_count
    hist["_local_batch"] = m.data["train_loader"].batch_size // 2
    with open(f"{out_prefix}.{rank}.json", "w") as f:
        json.dump(hist, f)


if __name__ == "__main__":
    main()
