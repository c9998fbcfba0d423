"""Self-contained quickstart: train + predict on synthetic skulls.

No external data needed — generates thin spherical shells, registers a
synthetic atlas, trains UNetSP for a few epochs, then writes predictions.
Useful as a smoke test of the full stack on any backend:

    python examples/synthetic_quickstart/run.py [epochs]
"""

import os
import sys
import tempfile

import ctunet_tpu
from ctunet_tpu.data import make_dataset, spherical_shell
from ctunet_tpu.data.atlas import register_atlas

epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
root = tempfile.mkdtemp(prefix="ctunet_tpu_quickstart_")
csv = make_dataset(os.path.join(root, "data"), n=8, shape=(64, 64, 64))
register_atlas((64, 64, 64), spherical_shell((64, 64, 64)))

params = dict(
    train_flag=True,
    test_flag=True,
    name="quickstart",
    model_class="UNetSP",
    problem_handler="FlapRecWithShapePriorDoubleOut",
    n_epochs=epochs,
    batch_size=2,
    dice_lambda=1.0,
    ce_lambda=1.0,
    optimizer="adam",
    learning_rate=1e-3,
    momentum=0.99,
    weight_decay=0.0,
    workspace_path=os.path.join(root, "workspace"),
    train_files_csv=csv,
    validation_files_csv=csv,
    test_files_csv=csv,
    autosave_epochs=0,
    save_dice_plots=True,
    n_workers=2,
    seed=0,
)
model = ctunet_tpu.Model(params=params)
print("\nWorkspace:", params["workspace_path"])
print("Predictions:", os.path.join(os.path.dirname(csv), "pred_quickstart"))
