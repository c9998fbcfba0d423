"""Config-driven trainer/predictor — the framework's orchestration layer.

Parity target: the reference ``Model`` class (``ctunet/pytorch/Model.py:
24-562``): the constructor parses the config, resolves the workspace, binds
the problem handler and datasets, then trains and/or tests according to the
flags. Public surface matches (``Model(cfg_file)``, ``Model(params=dict)``,
CLI ``ctunet-tpu <cfg.ini>``), while the internals are TPU-native:

- one jitted, donated train step fusing on-device synthesis + atlas concat +
  bf16 forward/backward (remat per block) + optax update (see ``steps.py``);
- batch data parallelism via a ``jax.sharding.Mesh`` (replaces
  ``nn.DataParallel``, ``Model.py:481-486``) with XLA-inserted collectives;
- threaded host decode + device prefetch (replaces DataLoader workers);
- orbax checkpoints carrying params+BN stats+optimizer state+step, with the
  reference's best/periodic/ini-snapshot semantics (``Model.py:266-296``)
  and transparent resume from reference torch ``.pt`` files;
- TensorBoard scalars with the reference's tag scheme
  ``{phase}/epoch/{key}`` (``Model.py:382-405``).
"""

from __future__ import annotations

import os
import sys
from shutil import copyfile
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import checkpoint as ckpt
from . import problem as _problem  # noqa: F401  (registers handlers)
from . import registry, steps
from .data import atlas as atlas_mod
from .data.pipeline import HostLoader, device_prefetch
from .models import (
    DOUBLE_OUTPUT_MODELS,
    MODEL_INPUT_CHANNELS,
    build_model,
)
from .parallel import batch_sharding, make_mesh, replicate_tree
from .utils import (
    default_params,
    makedir,
    print_params_dict,
    set_cfg_params,
    tic,
    toc_eps,
)

# Spatial divisibility required per model (2^n_pool_levels).
_POOL_MULTIPLE = {
    "UNet5b2i3o": 32,
    "UNetSPSmall": 32,
}


def _np_corners(offs, sizes):
    """The 8 corner coordinates of a crop box (canvas coords)."""
    import itertools

    return [
        tuple(o if lo else o + s - 1 for o, s, lo in zip(offs, sizes, bits))
        for bits in itertools.product((True, False), repeat=len(offs))
    ]


class _ScalarWriter:
    """TensorBoard scalar writer + in-memory history.

    Uses the framework's own dependency-free tfevents writer
    (``utils/tb_writer.py``) — no torch/tensorboard import needed at
    runtime, so TB logging works on a bare TPU VM exactly like the
    reference's ``SummaryWriter`` (``Model.py:138``). A failure to open
    the log directory warns loudly instead of degrading silently."""

    def __init__(self, logdir: Optional[str]):
        self.history: Dict[str, list] = {}
        from .utils.tb_writer import make_writer

        self._tb = make_writer(logdir)

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self.history.setdefault(tag, []).append((step, float(value)))
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()


class Model:
    """Config-driven train/test entry point (ref ``Model.py:24-145``)."""

    def __init__(self, cfg_file=None, params: Optional[Dict] = None):
        if cfg_file and params:
            params = None
            print(
                "You provided both a cfg file and a params dictionary. Only "
                "the cfg file will be used"
            )
        if cfg_file is None and params is None:
            print("No configuration file provided.")

        # CLI passes argv as a list (ref ``Model.py:44``).
        cfg_file = cfg_file[0] if isinstance(cfg_file, list) else cfg_file
        if cfg_file and not os.path.exists(cfg_file):
            raise FileNotFoundError(
                f"The configuration file does not exists ({cfg_file})."
            )

        self.params = default_params()
        if params is not None:
            self.params.update(params)
        if not params:
            parsed = set_cfg_params(cfg_file, self.params)
            if parsed is not None:
                self.params = parsed

        self.cfg_path = cfg_file
        self.resolve_out_folder()

        # Multi-host bring-up FIRST (before any device query): after it,
        # jax.devices() is the GLOBAL device list and the jitted steps are
        # the same SPMD programs — XLA reduces grads over ICI within a
        # host's slice and DCN across hosts (parallel/distributed.py).
        from .parallel.distributed import initialize_from_params

        self.process_index, self.process_count = initialize_from_params(
            self.params
        )

        self.problem_handler = registry.get_problem(
            self.params["problem_handler"]
        )()
        self.write_predictions = self.problem_handler.write_predictions

        # Device/mesh selection: 'cpu' forces host; anything else ('cuda',
        # 'tpu', None) uses the default backend (ref ``Model.py:122-126``).
        if str(self.params.get("device")) == "cpu":
            try:
                self.devices = jax.devices("cpu")
            except RuntimeError:
                # cpu not among JAX_PLATFORMS (e.g. platform pinned by the
                # environment); force it if no backend is live yet.
                try:
                    jax.config.update("jax_platforms", "cpu")
                    self.devices = jax.devices("cpu")
                except Exception:
                    print(
                        "WARNING: cpu backend unavailable; falling back to "
                        "the default backend."
                    )
                    self.devices = jax.devices()
        else:
            self.devices = jax.devices()
        # Default mesh: use all devices for batch DP only when the global
        # batch divides evenly; otherwise run single-device (explicit
        # mesh_data overrides).
        mesh_data = self.params.get("mesh_data") or 0
        if mesh_data == 0:
            bs = int(self.params.get("batch_size") or 1)
            nd = len(self.devices)
            mesh_data = nd if (nd > 0 and bs % nd == 0) else 1
            if mesh_data == 1 and nd > 1:
                print(
                    f"NOTE: batch_size={bs} does not divide over {nd} "
                    "devices; running single-device. Set i_mesh_data (and/or "
                    "i_mesh_spatial) to shard explicitly."
                )
        self.mesh = make_mesh(
            mesh_data,
            self.params.get("mesh_spatial") or 1,
            self.devices,
        )
        self._data_sharding = (
            batch_sharding(self.mesh)
            if self.mesh.devices.size > 1
            else None
        )

        if self.params.get("debug_nans"):
            jax.config.update("jax_debug_nans", True)

        self.models: Dict[str, Any] = {"main": None}
        self.state: Optional[steps.TrainState] = None
        self.data: Dict[str, Any] = {
            "train_loader": None,
            "validation_loader": None,
            "test_loader": None,
        }

        self.load_datasets()

        self.current_epoch = 0
        self.best_model = {"epoch": 1, "value": None}
        self.losses_and_metrics: Dict[str, list] = {}
        self._atlas = None
        self._from_pairs = False
        self._rng_key = jax.random.key(int(self.params.get("seed") or 0))

        # rank 0 owns TB events (other ranks keep the in-memory history
        # for their console lines; scalars are identical across ranks —
        # the loss is computed over the GLOBAL batch inside jit)
        self.writer = _ScalarWriter(
            self.params.get("tensorboard_run_path")
            if self.process_index == 0 else None
        )

        if self.params.get("train_flag") is True:
            self.train()
        if self.params.get("test_flag") is True:
            self.test()

    # ------------------------------------------------------------------
    # Paths / config
    # ------------------------------------------------------------------

    def resolve_out_folder(self) -> None:
        """Workspace layout (ref ``Model.py:407-446``):
        ``workspace/<ModelClass>_<Handler>/model/<name>.ckpt`` plus a
        ``runs/`` TensorBoard dir."""
        if not self.params.get("workspace_path"):
            raise AttributeError("workspace_path not defined in the ini file.")
        wsp = self.params["workspace_path"] = os.path.expanduser(
            self.params["workspace_path"]
        )
        makedir(wsp)

        mc, hd = self.params["model_class"], self.params["problem_handler"]
        run_name = f"{mc}_{hd}"
        model_folder = os.path.join(wsp, run_name, "model")
        makedir(model_folder)

        name = self.params.get("name")
        res_path = self.params.get("resume_model") or ""
        res_filename = os.path.splitext(os.path.split(res_path)[1])[0]

        if name in ("", None) and res_path in ("", None):
            raise AttributeError(
                "You should set at least a name or a path of a previously "
                "trained model for lookup."
            )

        self.params["model_path"] = res_path if res_path != "" else None
        self.params["name"] = (
            res_filename if not name and res_path else name
        )

        if not self.params.get("force_resumed"):
            self.params["model_path"] = os.path.join(
                model_folder, self.params["name"] + ".ckpt"
            )

        if self.params.get("tensorboard_run_path") is None:
            tb_name = run_name + "_" + self.params["name"]
            self.params["tensorboard_run_path"] = os.path.join(
                wsp, "runs", tb_name
            )

    # ------------------------------------------------------------------
    # Data
    # ------------------------------------------------------------------

    def get_loader(self, dataset_class, dataset, batch_size=1, shuffle=True,
                   n_workers=0, single_file=None, rank_shard=True):
        """Build a HostLoader (ref ``Model.get_dataloader``,
        ``Model.py:147-187``; sampling with replacement per quirk Q4).

        ``rank_shard``: in multi-host runs, load only this process's
        slice of each global batch (train/val paths; the test path loads
        everything and runs on rank 0 only)."""
        ds = dataset_class(dataset, "", single_file=single_file)
        nproc = self.process_count if rank_shard else 1
        return HostLoader(
            ds,
            batch_size=batch_size,
            shuffle=shuffle,
            replacement=True,
            n_workers=n_workers or 2,
            seed=int(self.params.get("seed") or 0),
            process_id=self.process_index if rank_shard else 0,
            num_processes=nproc,
        )

    def load_datasets(self) -> None:
        """ref ``Model.load_datasets`` (``Model.py:189-224``)."""
        handler = self.problem_handler
        if self.params.get("train_flag"):
            self.data["train_loader"] = self.get_loader(
                handler.train_dataset_class,
                self.params["train_files_csv"],
                batch_size=self.params["batch_size"],
                n_workers=self.params.get("n_workers"),
            )
            self.data["validation_loader"] = self.get_loader(
                handler.train_dataset_class,
                self.params["validation_files_csv"],
                batch_size=self.params["batch_size"],
                n_workers=self.params.get("n_workers"),
            )
        if self.params.get("test_flag"):
            if self.params.get("test_files_csv") or self.params.get("single_file"):
                self.data["test_loader"] = self.get_loader(
                    handler.test_dataset_class,
                    self.params.get("test_files_csv"),
                    batch_size=1,  # ref ``Model.py:221``
                    shuffle=False,
                    single_file=self.params.get("single_file"),
                    rank_shard=False,  # test() runs whole on rank 0
                )

    # ------------------------------------------------------------------
    # Model / state initialization
    # ------------------------------------------------------------------

    def _sample_shape(self):
        for key in ("train_loader", "test_loader", "validation_loader"):
            loader = self.data.get(key)
            if loader is not None:
                sample = loader.dataset[0]
                return tuple(sample["image"].shape), ("flap" in sample)
        raise RuntimeError("No dataset available to infer the input shape.")

    def _build_model(self):
        model = build_model(
            self.params["model_class"],
            compute_dtype=self.params.get("compute_dtype") or "bfloat16",
            param_dtype=self.params.get("param_dtype") or "float32",
            use_checkpoint=bool(self.params.get("remat", True)),
        )
        if self.params.get("packed_train"):
            from .models.packed_resident import (
                PackedResidentModel,
                supports,
            )

            if supports(self.params["model_class"]):
                # packed-RESIDENT training graph: activations stay
                # W-packed between ops (lane-dense layouts; see
                # models/packed_resident.py). Param tree unchanged;
                # indivisible shapes fall back per-call.
                model = PackedResidentModel(
                    model, self.params["model_class"],
                    use_remat=bool(self.params.get("remat", True)),
                )
            else:
                print(
                    "b_packed_train: unsupported model family "
                    f"({self.params['model_class']}); standard graph."
                )
        return model

    def _fg_train_size(self, im_shape):
        """Static foreground-crop window for ``b_fg_crop_train``.

        ``s_fg_train_size`` overrides; otherwise the elementwise-max
        ``plan_crop`` size over EVERY train + validation volume (the bbox
        scan is cheap relative to the decode, which happens per epoch
        anyway; ADVICE r4: a partial scan silently truncated unsampled
        volumes). For pair datasets the bbox covers image|flap — the flap
        fills the defect outside the broken skull's bbox. The snap
        multiple covers the model's pool depth so the packed-resident
        training graph stays applicable. Returns None (train
        whole-canvas) when cropping gains nothing. Sets
        ``self._fg_margin``/``self._fg_multiple`` for the step builders
        so planning and runtime use identical parameters."""
        if not self.params.get("fg_crop_train"):
            return None
        multiple = 16
        try:
            from .models import packed_resident

            cfg = packed_resident._CONFIGS.get(self.params["model_class"])
            if cfg:
                multiple = max(16, 2 ** cfg["n_blocks"])
        except Exception:
            pass
        margin = int(self.params.get("fg_margin") or 16)
        self._fg_margin, self._fg_multiple = margin, multiple
        override = str(self.params.get("fg_train_size") or "").strip()
        if override:
            size = tuple(int(v) for v in
                         override.replace("x", ",").split(","))
            assert len(size) == 3, f"s_fg_train_size: {override!r}"
            assert all(s % multiple == 0 for s in size), (
                f"s_fg_train_size {size} must divide by {multiple}")
            return size
        loader = self.data.get("train_loader")
        if loader is None:
            return None

        def fg_volumes():
            n_total = 0
            for key in ("train_loader", "validation_loader"):
                ld = self.data.get(key)
                if ld is None:
                    continue
                ds = ld.dataset
                n_total += len(ds)
                for i in range(len(ds)):
                    sample = ds[i]
                    vol = np.asarray(sample["image"], np.float32)
                    if "flap" in sample:
                        vol = np.maximum(
                            vol, np.asarray(sample["flap"], np.float32)
                        )
                    yield vol
            self._fg_n_scanned = n_total

        size = steps.fg_crop_size_for(
            fg_volumes(), im_shape, margin=margin, multiple=multiple,
        )
        if size is None:
            print("fg_crop_train: no shrink on this dataset — training "
                  "whole volumes")
        else:
            print(f"fg_crop_train: {im_shape} -> {size} "
                  f"(scanned all {getattr(self, '_fg_n_scanned', '?')} "
                  f"train+val volumes, margin {margin}, snap {multiple})")
        return size

    def _maybe_atlas(self, im_shape):
        if getattr(self.problem_handler, "append_atlas", False):
            self._atlas = atlas_mod.load_atlas(
                im_shape, self.params.get("atlas_dir")
            )

    def initialize_models(self, load_out: bool = False) -> None:
        """ref ``Model.initialize_models`` (``Model.py:493-508``)."""
        im_shape, from_pairs = self._sample_shape()
        self._from_pairs = from_pairs
        self._maybe_atlas(im_shape)
        model = self._build_model()
        self.models["main"] = model

        n_ch = MODEL_INPUT_CHANNELS[self.params["model_class"]]
        # Init at the pool-multiple-padded shape (params are shape-agnostic;
        # non-multiple volumes are edge-padded on the test path anyway).
        multiple = _POOL_MULTIPLE.get(self.params["model_class"], 16)
        init_shape = tuple(s + (-s % multiple) for s in im_shape)
        dummy = jnp.zeros(
            (1, *init_shape, n_ch),
            jnp.dtype(self.params.get("compute_dtype") or "bfloat16"),
        )
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.key(int(self.params.get("seed") or 0)), dummy, False
        )

        if load_out:
            loaded = self._load_variables(self.params["model_path"])
            variables = {**variables, **loaded}
        elif self.params.get("resume_model") not in ("", None):
            loaded = self._load_variables(self.params["resume_model"])
            variables = {**variables, **loaded}

        self._variables = variables

        if self.params.get("show_model_summary"):
            from .utils.misc import model_summary

            model_summary(model, variables, dummy.shape)

    def _load_variables(self, path: str):
        """Load from orbax dir or reference torch .pt (ref
        ``Model.load_model``, ``Model.py:448-472``, incl. the fallback to
        resume_model when the workspace model is missing)."""
        cond = (
            self.params.get("train_flag") is False
            and self.params.get("test_flag") is True
            and (self.params.get("resume_model") or "") != ""
            and not os.path.exists(path)
        )
        if cond:
            path = self.params["resume_model"]
            print("using 'resume_model' trained model for predicting..")
        return ckpt.load_any(path, self.params["model_class"])

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------

    def train(self) -> None:
        """Training loop (ref ``Model.train``, ``Model.py:226-264``)."""
        from .ops import packed_conv

        packed_conv.set_conv_impl(self.params.get("conv_impl") or "xla")
        self.initialize_models()
        optimizer = steps.make_optimizer(self.params)
        variables = self._variables
        state = steps.TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh.devices.size > 1:
            state = replicate_tree(state, self.mesh)
        self.state = state

        loss_cfg = {
            k: self.params.get(k)
            for k in ("ce_lambda", "dice_lambda", "save_dice_plots")
        }
        compute_dtype = jnp.dtype(
            self.params.get("compute_dtype") or "bfloat16"
        )
        model = self.models["main"]
        handler = self.problem_handler
        tps = int(self.params.get("train_patch_size") or 0)
        train_patch = (tps, tps, tps) if tps > 0 else None
        fg_size = (None if train_patch is not None
                   else self._fg_train_size(self._sample_shape()[0]))
        fg_kw = {}
        if fg_size is not None:
            fg_kw = dict(fg_margin=self._fg_margin,
                         fg_multiple=self._fg_multiple)
        train_step = steps.make_train_step(
            model, handler, optimizer, loss_cfg,
            atlas=self._atlas, compute_dtype=compute_dtype,
            from_pairs=self._from_pairs, train_patch=train_patch,
            fg_crop_size=fg_size, **fg_kw,
        )
        eval_step = steps.make_eval_step(
            model, handler, loss_cfg,
            atlas=self._atlas, compute_dtype=compute_dtype,
            from_pairs=self._from_pairs, train_patch=train_patch,
            fg_crop_size=fg_size, **fg_kw,
        )
        if self.process_count > 1:
            # multi-host: compile-then-barrier so no rank hits the first
            # collective while another is still compiling (Gloo context
            # init has a hard ~30 s timeout; see parallel/distributed.py)
            from .parallel.distributed import sync_compiled

            train_step = sync_compiled(train_step, "train")
            eval_step = sync_compiled(eval_step, "eval")

        print_params_dict(self.params)

        # Failure recovery (SURVEY.md §5: the reference has none beyond
        # manual resume): on SIGTERM/SIGINT — e.g. a TPU-VM preemption
        # notice — finish the current batch, checkpoint, and exit cleanly
        # so `resume_model` continues from the interrupted state.
        import signal

        interrupted = {"flag": False}
        prev_handlers = {}

        def _on_signal(signum, frame):
            interrupted["flag"] = True
            print(
                f"signal {signum} received: checkpointing after the "
                "current batch..."
            )

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread
                pass
        self._interrupted = interrupted

        n_epochs = int(self.params["n_epochs"])
        try:
            self._train_epochs(
                n_epochs, train_step, eval_step, interrupted
            )
        finally:
            for sig, h in prev_handlers.items():
                try:
                    signal.signal(sig, h)
                except ValueError:
                    pass
            self.writer.close()

        self._variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }

    def _train_epochs(self, n_epochs, train_step, eval_step,
                      interrupted) -> None:
        for n_epoch in range(1, n_epochs + 1):
            ep_time = tic()
            self.current_epoch = n_epoch
            print("Epoch: ", n_epoch)

            profile_dir = self.params.get("profile_dir") or ""
            if profile_dir and n_epoch == 1:
                # jax.profiler trace of the first epoch (SURVEY.md §5:
                # replaces the reference's wall-clock-only instrumentation).
                with jax.profiler.trace(os.path.expanduser(profile_dir)):
                    self._forward_pass_train(train_step, n_epoch)
            else:
                self._forward_pass_train(train_step, n_epoch)
            self.update_plots_tensorboard_avg("train", n_epoch)

            self._forward_pass_eval(eval_step, n_epoch)
            ep_loss_v = self.update_plots_tensorboard_avg("val", n_epoch)

            if n_epoch == 1 or (
                ep_loss_v is not None
                and (
                    self.best_model["value"] is None
                    or ep_loss_v < self.best_model["value"]
                )
            ):
                if self.best_model["value"] is not None:
                    print(
                        "New best model found. Overwriting saved model. "
                        f"(new best val loss: {ep_loss_v:.5f} vs "
                        f"{self.best_model['value']:.5f})"
                    )
                self.best_model["value"] = ep_loss_v
                self.best_model["epoch"] = n_epoch

            toc_eps(ep_time, n_epoch, n_epochs)

            autosave = int(self.params.get("autosave_epochs") or 0)
            if autosave and (n_epoch % autosave) == 0:
                self.save_main_model(self.cfg_path, True)
                if self.params.get("test_flag"):
                    self.test()

            self.save_main_model()

            if interrupted["flag"]:
                print(
                    f"interrupted at epoch {n_epoch}: emergency checkpoint "
                    "saved; resume with s_resume_model."
                )
                self.save_main_model(self.cfg_path, True)
                break

    def _accumulate(self, terms: Dict[str, Any]):
        """Accumulate per-batch scalars WITHOUT forcing a device sync:
        values stay device arrays until the epoch average (or a console
        print) needs them, so step dispatch pipelines across batches
        (a host<->device roundtrip per step costs ~30 ms on this setup)."""
        for k, v in terms.items():
            self.losses_and_metrics.setdefault(k, []).append(v)
        return terms["epoch_loss"]

    def _forward_pass_train(self, train_step, n_epoch: int) -> None:
        print("Phase: train.")
        loader = self.data["train_loader"]
        log_every = int(self.params.get("log_every") or 0)
        n = len(loader)
        for idx, batch in enumerate(
            device_prefetch(
                iter(loader),
                depth=int(self.params.get("prefetch_depth") or 2),
                sharding=self._data_sharding,
            )
        ):
            key = jax.random.fold_in(
                jax.random.fold_in(self._rng_key, n_epoch), idx
            )
            dev_batch = {
                k: v for k, v in batch.items() if not isinstance(v, list)
            }
            self.state, terms = train_step(self.state, dev_batch, key)
            loss = self._accumulate(terms)
            if log_every and (idx + 1) % log_every == 0:
                print(
                    "    Batch {}/{} ({:.0f}%)\tLoss: {:.6f}".format(
                        idx + 1, n, 100.0 * (idx + 1) / n, float(loss)
                    )
                )
            if getattr(self, "_interrupted", {}).get("flag"):
                break  # preemption: finish epoch bookkeeping + checkpoint

    def _forward_pass_eval(self, eval_step, n_epoch: int) -> None:
        print("Phase: val.")
        loader = self.data["validation_loader"]
        handler = self.problem_handler
        want_hd = bool(self.params.get("save_hd_plots"))
        if want_hd and not getattr(self, "_hd_warned", False):
            self._hd_warned = True
            print(
                "  note: save_hd_plots computes an exact host-side "
                "Hausdorff EDT per val batch (label maps fetched as "
                "uint8); at large volumes this adds seconds per batch."
            )
        for idx, batch in enumerate(
            device_prefetch(iter(loader), sharding=self._data_sharding)
        ):
            key = jax.random.fold_in(
                jax.random.fold_in(self._rng_key, 1_000_000 + n_epoch), idx
            )
            dev_batch = {
                k: v for k, v in batch.items() if not isinstance(v, list)
            }
            terms, (out, targets) = eval_step(self.state, dev_batch, key)
            self._accumulate(terms)
            if want_hd and self.process_count > 1:
                if not getattr(self, "_hd_mh_warned", False):
                    self._hd_mh_warned = True
                    print(
                        "  note: save_hd_plots skipped in multi-host runs "
                        "(host Hausdorff needs the full label maps on one "
                        "host); on-device metrics are unaffected."
                    )
                want_hd = False
            if want_hd and hasattr(handler, "host_metrics"):
                hm = handler.host_metrics(out, targets, self.params)
                for k, v in hm.items():
                    self.losses_and_metrics.setdefault(k, []).append(
                        float(v)
                    )

    def update_plots_tensorboard_avg(
        self, phase: str, i: int, type: str = "epoch",
        print_to_console: bool = False,
    ) -> Optional[float]:
        """Average + log accumulated scalars (ref ``Model.py:382-405``)."""
        ep_loss = None
        if "epoch_loss" in self.losses_and_metrics:
            vals = [float(v) for v in self.losses_and_metrics["epoch_loss"]]
            if vals:
                ep_loss = float(np.mean(vals))
        for key, vals in self.losses_and_metrics.items():
            if not vals:
                continue
            avg = sum(float(v) for v in vals) / len(vals)
            self.writer.add_scalar(f"{phase}/{type}/{key}", float(avg), i)
            self.losses_and_metrics[key] = []
            if print_to_console:
                print(f"{type} {i} average: {float(avg)}.")
        return ep_loss

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------

    def save_main_model(self, cfg_file=None, save_checkpoint=False) -> None:
        """Best-model overwrite + periodic checkpoints + ini snapshot
        (ref ``Model.save_main_model``, ``Model.py:266-296``).

        Multi-host: EVERY rank calls the orbax save — orbax's own
        multihost protocol barriers all processes and lets only the
        primary write array data; gating it to rank 0 deadlocks rank 0 in
        orbax's ``sync_global_processes`` (measured: Gloo context timeout
        in the 2-process test). The decision to save is rank-invariant
        (losses are replicated scalars), and the workspace must be a
        SHARED path in multi-host runs. Pure host-side extras (ini
        snapshot, prints) stay rank-0-only."""
        rank0 = getattr(self, "process_index", 0) == 0
        path = self.params["model_path"]
        dir_m, fname = os.path.split(path)
        if rank0:
            makedir(dir_m)
        if self.current_epoch == self.best_model["epoch"]:
            ckpt.save_checkpoint(
                path, self.state,
                extra={"epoch": self.current_epoch,
                       "model_class": self.params["model_class"]}
                if rank0 else None,
            )

        if rank0 and cfg_file and self.current_epoch == 1:
            copyfile(cfg_file, path.replace(".ckpt", "_params.ini"))

        if save_checkpoint:
            dir_chk = os.path.join(dir_m, "checkpoints")
            new_sfx = f"_ep{self.current_epoch}.ckpt"
            chk_p = os.path.join(dir_chk, fname.replace(".ckpt", new_sfx))
            if rank0:
                makedir(dir_chk)
            ckpt.save_checkpoint(
                chk_p, self.state,
                extra={"epoch": self.current_epoch} if rank0 else None,
            )
            if rank0:
                print("Checkpoint saved ({})".format(save_checkpoint))

        if rank0:
            print("Model saved ({})".format(path))

    # ------------------------------------------------------------------
    # Inference
    # ------------------------------------------------------------------

    def test(self) -> None:
        """Prediction pass (ref ``Model.test``, ``Model.py:298-322``).

        Multi-host: runs on rank 0 only (predictions are host-written
        files; the test loader is built UNsharded so rank 0 sees every
        volume). Scale-out serving uses ``engine.build_dp_predict``."""
        if getattr(self, "process_index", 0) != 0:
            return
        if self.models["main"] is None and self.params.get("name"):
            self.initialize_models(load_out=not bool(self.state))
        elif self.models["main"] is None and self.params.get("resume_model"):
            self.initialize_models()

        if (
            self.params.get("test_flag")
            and not self.params.get("test_files_csv")
            and not self.params.get("single_file")
        ):
            print("No csv provided for testing")
            return
        if not self.params.get("single_file"):
            print(
                "Images to test: ",
                os.path.split(self.params["test_files_csv"] or "")[0],
            )
            print_params_dict(self.params)
        self._forward_pass_test()

    def _current_variables(self):
        if self.state is not None:
            return {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }
        return {
            "params": self._variables["params"],
            "batch_stats": self._variables.get("batch_stats", {}),
        }

    def _maybe_engine(self, variables, compute_dtype):
        """Build the fused Pallas engine predict when enabled/supported
        (TPU serving path); None otherwise."""
        from . import engine

        backend = self.devices[0].platform if self.devices else ""
        use_engine = (
            bool(self.params.get("use_engine", True))
            and engine.supports(self.params["model_class"])
            and backend not in ("cpu",)
        )
        if not use_engine:
            return None
        try:
            return engine.build_predict(
                self.params["model_class"], variables,
                compute_dtype=compute_dtype,
            )
        except Exception as e:
            print(
                f"engine unavailable ({type(e).__name__}: {e}); "
                "falling back to XLA forward."
            )
            return None

    def _make_whole_volume_predict(self, model, variables, compute_dtype,
                                   atlas=None):
        """Whole-volume predict: fused Pallas engine on TPU when supported,
        plain jitted model.apply otherwise."""
        eng = self._maybe_engine(variables, compute_dtype)
        if eng is not None:
            # Opt-in int8 serving (``b_use_int8``): post-training
            # quantization calibrated lazily on the first test volume OF
            # EACH SHAPE — the quantized plan (pool kinds, decoder repack
            # targets) is shape-specific, so a mixed-size test set gets
            # one build per shape instead of a retrace crash; ValueError
            # (unchainable shape) falls back to the bf16 engine.
            use_q = bool(self.params.get("use_int8"))
            q_by_shape: dict = {}

            # the atlas is a serving-time constant: upload it ONCE (the
            # old per-call jnp.asarray re-sent ~40 MB per volume over the
            # host link)
            atlas_dev = (
                None if atlas is None
                else jax.device_put(jnp.asarray(atlas, compute_dtype))
            )

            def predict(variables_unused, images, offsets=None):
                chans = [images.astype(compute_dtype)]
                if atlas_dev is not None:
                    at = atlas_dev
                    if tuple(images.shape[1:]) != tuple(at.shape):
                        # foreground-crop serving: keep the atlas prior
                        # registered by slicing it at the crop offsets
                        offs = jnp.asarray(
                            offsets if offsets is not None else (0, 0, 0),
                            jnp.int32,
                        )
                        at = jax.lax.dynamic_slice(
                            at, (offs[0], offs[1], offs[2]),
                            images.shape[1:],
                        )
                    chans.append(jnp.broadcast_to(at[None], images.shape))
                x = jnp.stack(chans, axis=-1)
                shape = tuple(x.shape[1:])
                if use_q and shape not in q_by_shape:
                    from . import engine_q

                    builders = [("int8", engine_q.build_predict_q, {})]
                    if self.params.get("int8_adaquant"):
                        # AdaQuant first; its failures (unsupported model
                        # family for the simulator, optimizer issues)
                        # fall back to the PLAIN int8 build, not bf16
                        builders.insert(0, (
                            "int8+adaquant", engine_q.build_predict_q_opt,
                            dict(
                                adaquant_steps=int(
                                    self.params.get("int8_adaquant_steps")
                                    or 250
                                ),
                                learn_scales=bool(
                                    self.params.get("int8_learn_scales")
                                ),
                            ),
                        ))
                    q_by_shape[shape] = None
                    for label, builder, extra in builders:
                        try:
                            if label == "int8+adaquant":
                                # the AdaQuant rounding SIMULATION (f32
                                # activation ladder) OOMs 16 GB HBM at
                                # crop windows >= ~240; the serving loop
                                # stages a smaller host-side calibration
                                # window (margin-16 bbox) when cropping —
                                # overrides are weight-space, scales
                                # still calibrate on x[0] at the full
                                # serving shape
                                hint = getattr(
                                    self, "_int8_calib_hint", None)
                                if (hint is not None
                                        and hint[0].size < x[0].size):
                                    extra = dict(
                                        extra, calib_batch=hint)
                            qfn = builder(
                                self.params["model_class"], variables,
                                x[0],
                                compute_dtype=compute_dtype,
                                calib_quantile=float(
                                    self.params.get("int8_calib_quantile")
                                    or 1.0
                                ),
                                bf16_tail=float(
                                    self.params.get("int8_bf16_tail") or 0
                                ),
                                bf16_head=float(
                                    self.params.get("int8_bf16_head") or 0
                                ),
                                **extra,
                            )
                            # the returned jitted fn traces lazily on
                            # first call — force the trace NOW so
                            # trace-time failures (VMEM tile-fit
                            # ValueError, Pallas shape asserts) hit this
                            # guard and fall back instead of crashing
                            # serving later
                            jax.eval_shape(qfn, x)
                            q_by_shape[shape] = qfn
                            print(
                                f"serving: calibrated {label} engine for "
                                f"{shape}. note: int8 PTQ can flip"
                                " boundary voxels on thin structures"
                                " (with adaquant, the default: measured"
                                " flap-mask Dice >=0.99 vs the bf16"
                                " engine's ~0.996; plain PTQ 0.93-0.99,"
                                " checkpoint-dependent — PARITY.md)."
                                " Serve bf16 where exact mask parity"
                                " matters."
                            )
                            break
                        except (ValueError, KeyError, AssertionError,
                                jax.errors.JaxRuntimeError) as e:
                            # JaxRuntimeError: device/tunnel-side
                            # build failures (e.g. the axon
                            # remote-compile body limit) must fall
                            # back like shape failures, not crash
                            # the serving loop.
                            purge = isinstance(
                                e, jax.errors.JaxRuntimeError)
                            print(
                                f"{label} engine unavailable ({e}); "
                                "trying the next serving mode."
                            )
                        else:
                            purge = False
                        # purge AFTER the handler exits: while inside
                        # the except block the live exception's
                        # traceback pins the failed build's frames (the
                        # OOM'd activation ladders), so a gc there
                        # frees nothing and even the bf16 fallback's
                        # uploads kept OOMing (round-5 serve runs).
                        # Python drops `e` + exc_info at block exit;
                        # only then can the buffers actually release.
                        if purge:
                            import gc

                            gc.collect()
                            jax.clear_caches()
                    if q_by_shape[shape] is None:
                        print("serving the bf16 engine.")
                fn = q_by_shape.get(shape) if use_q else None
                if fn is not None:
                    return fn(x)
                return eng(x)

            return predict
        return steps.make_predict_fn(
            model, atlas=atlas, compute_dtype=compute_dtype
        )

    def _make_patch_predict(self, model, variables, compute_dtype,
                            atlas_p=None):
        """Sliding-window predict serving each patch through the fused
        Pallas engine when available; with ``b_use_int8`` the per-patch
        engine is quantized, calibrated on the central patch of the first
        volume — built lazily so calibration sees real data before the
        scan traces."""
        from .ops.sliding_window import make_sliding_window_fn

        eng = self._maybe_engine(variables, compute_dtype)
        ps = int(self.params.get("patch_size") or 128)
        sw_kwargs = dict(
            patch_size=ps,
            overlap=float(self.params.get("patch_overlap") or 0.5),
            atlas=atlas_p,
            compute_dtype=compute_dtype,
            patch_batch=int(self.params.get("patch_batch") or 1),
        )
        sw_state: dict = {"fn": None}

        def predict(vs, padded):
            if sw_state["fn"] is None:
                apply_fn = None if eng is None else (lambda v, x: eng(x))
                if eng is not None and self.params.get("use_int8"):
                    from . import engine_q

                    vol = jnp.asarray(padded[0], compute_dtype)
                    ctr = [max(0, (s - ps) // 2) for s in vol.shape]
                    chans = [jax.lax.dynamic_slice(vol, ctr, (ps, ps, ps))]
                    if atlas_p is not None:
                        chans.append(jax.lax.dynamic_slice(
                            jnp.asarray(atlas_p, compute_dtype),
                            ctr, (ps, ps, ps),
                        ))
                    calib = jnp.stack(chans, axis=-1)
                    builders = [("int8", engine_q.build_predict_q, {})]
                    if self.params.get("int8_adaquant"):
                        # AdaQuant failures fall back to plain int8 (see
                        # the whole-volume path), then bf16
                        builders.insert(0, (
                            "int8+adaquant", engine_q.build_predict_q_opt,
                            dict(
                                adaquant_steps=int(
                                    self.params.get("int8_adaquant_steps")
                                    or 250
                                ),
                                learn_scales=bool(
                                    self.params.get("int8_learn_scales")
                                ),
                            ),
                        ))
                    for label, builder, extra in builders:
                        try:
                            q = builder(
                                self.params["model_class"], variables,
                                calib, compute_dtype=compute_dtype,
                                calib_quantile=float(
                                    self.params.get("int8_calib_quantile")
                                    or 1.0
                                ),
                                bf16_tail=float(
                                    self.params.get("int8_bf16_tail") or 0
                                ),
                                bf16_head=float(
                                    self.params.get("int8_bf16_head") or 0
                                ),
                                **extra,
                            )
                            # force the trace inside the guard (see the
                            # whole-volume path): trace-time tile-fit /
                            # shape failures fall back instead of
                            # crashing
                            jax.eval_shape(q, calib[None])
                            apply_fn = lambda v, x: q(x)  # noqa: E731
                            print(f"patch serving: calibrated {label} "
                                  "engine.")
                            break
                        except (ValueError, KeyError, AssertionError,
                                jax.errors.JaxRuntimeError) as e:
                            # JaxRuntimeError: device/tunnel-side
                            # build failures (e.g. the axon
                            # remote-compile body limit) must fall
                            # back like shape failures, not crash
                            # the serving loop.
                            purge = isinstance(
                                e, jax.errors.JaxRuntimeError)
                            print(
                                f"{label} engine unavailable ({e}); "
                                "trying the next patch-serving mode."
                            )
                        else:
                            purge = False
                        # purge AFTER the handler exits: while inside
                        # the except block the live exception's
                        # traceback pins the failed build's frames (the
                        # OOM'd activation ladders), so a gc there
                        # frees nothing and even the bf16 fallback's
                        # uploads kept OOMing (round-5 serve runs).
                        # Python drops `e` + exc_info at block exit;
                        # only then can the buffers actually release.
                        if purge:
                            import gc

                            gc.collect()
                            jax.clear_caches()
                    else:
                        print("serving patches on the bf16 engine.")
                sw_state["fn"] = make_sliding_window_fn(
                    model, apply_fn=apply_fn, **sw_kwargs
                )
            return sw_state["fn"](vs, padded)

        return predict

    def _forward_pass_test(self) -> None:
        print("Phase: test.")
        if self.params.get("largest_cc"):
            from .ops.postprocess import largest_cc

            self.problem_handler.postprocess = largest_cc
        model = self.models["main"]
        variables = self._current_variables()
        compute_dtype = jnp.dtype(
            self.params.get("compute_dtype") or "bfloat16"
        )

        multiple = _POOL_MULTIPLE.get(self.params["model_class"], 16)
        # Pad the atlas with the same edge padding applied to the images so
        # the atlas channel stays registered on non-multiple input sizes.
        atlas_p = self._atlas
        if atlas_p is not None:
            apads = [(0, -s % multiple) for s in np.shape(atlas_p)]
            if any(p[1] for p in apads):
                atlas_p = np.pad(np.asarray(atlas_p), apads)

        if self.params.get("patch_inference"):
            predict = self._make_patch_predict(
                model, variables, compute_dtype, atlas_p
            )
        else:
            predict = self._make_whole_volume_predict(
                model, variables, compute_dtype, atlas=atlas_p
            )
        # Serving pipeline: decode prefetch is threaded in the loader;
        # predict dispatch runs ahead of device_get + NIfTI writes
        # (``depth`` volumes in flight, writes on a small thread pool), so
        # the chip computes volume i+1 while volume i is fetched/written.
        # Host<->device traffic is minimized TPU-natively: binary volumes
        # upload as packed bits (1/32 of f32), the argmax runs ON DEVICE,
        # and binary masks come back packed (5 MB instead of 332 MB of f32
        # probabilities at 224x304x304).
        import collections
        import concurrent.futures as cf
        import time as _time

        from .ops import foreground

        # Foreground cropping (``b_fg_crop``): run the engine on the
        # nonzero bounding box + margin, paste the mask back on host.
        # Whole-volume path only; offsets snap to the pool multiple so
        # pooling grids stay aligned (ops/foreground.py; parity measured
        # by tools/parity_check.py --crop).
        fg_on = bool(self.params.get("fg_crop")) and not bool(
            self.params.get("patch_inference")
        )
        fg_margin = int(self.params.get("fg_margin") or 16)

        depth = max(1, int(self.params.get("prefetch_depth") or 2))
        pending: collections.deque = collections.deque()
        write_futs = []
        # opt-in stage attribution (``b_serve_profile``): wall time the
        # serving loop BLOCKS on each stage, so the end-to-end gap vs the
        # device rate is attributable (decode wait / pad / upload /
        # dispatch / fetch+unpack / write-in-flight)
        prof: Dict[str, float] = collections.defaultdict(float)
        prof_on = bool(self.params.get("serve_profile"))

        def _t(key, fn, *a, **k):
            if not prof_on:
                return fn(*a, **k)
            t0 = _time.perf_counter()
            r = fn(*a, **k)
            prof[key] += _time.perf_counter() - t0
            return r

        @jax.jit
        def _hardify(out):
            def f(v):
                m = jnp.argmax(v, -1).astype(jnp.uint8)
                if v.shape[-1] == 2 and m.ndim == 4:
                    # binary mask: 8 voxels/byte for the host fetch
                    return jnp.packbits(
                        m.reshape(m.shape[0], -1), axis=-1
                    )
                return m
            return jax.tree.map(f, out)

        def _upload(padded):
            """Packed-bits upload for binary volumes; plain otherwise
            (shared protocol with the training path:
            :func:`ctunet_tpu.data.pipeline.put_packed_or_none`)."""
            from .data.pipeline import put_packed_or_none

            packed = put_packed_or_none(padded)
            return packed if packed is not None else jax.device_put(padded)

        def flush_one(pool):
            out, batch, padded_shape, crop_info = pending.popleft()
            images = batch["image"]

            def unpad_np(a):
                a = np.asarray(jax.device_get(a))
                if a.ndim == 2 and a.dtype == np.uint8:
                    # packed binary mask -> (B, D, H, W)
                    n = int(np.prod(padded_shape))
                    a = np.unpackbits(a, axis=-1, count=n).reshape(
                        (a.shape[0],) + padded_shape
                    )
                if crop_info is not None:
                    offs, full_shape = crop_info
                    # Background fill = the model's constant empty-space
                    # class, read off a crop CORNER that sits in empty
                    # input (the margin guarantees one unless the bbox
                    # touches the canvas edge on every axis).
                    bg = 0
                    for corner in _np_corners(offs, a.shape[-3:]):
                        probe = tuple(
                            min(c, s - 1)
                            for c, s in zip(corner, images.shape[1:])
                        )
                        if images[(0,) + probe] == 0:
                            local = tuple(
                                c - o for c, o in zip(corner, offs)
                            )
                            bg = int(a[(0,) + local])
                            break
                    a = foreground.paste_full(a, offs, full_shape, bg)
                sl = tuple(slice(0, s) for s in images.shape[1:])
                return a[(slice(None),) + sl]

            out = _t("fetch+unpack", jax.tree.map, unpad_np, out)
            write_futs.append(pool.submit(
                self.write_predictions,
                out, batch["filepath"], self.params["name"], images,
            ))

        # Scan-of-K dispatch (``i_serve_scan``): group K decoded volumes
        # into ONE ``lax.scan`` program — amortizes the per-dispatch host
        # gap (~2.6 ms/volume under the axon tunnel) and the per-volume
        # upload overhead into one dispatch per K. Per-volume variable
        # crop shapes would defeat a naive scan, so the group shares a
        # STATIC pool-aligned window (the fg-crop-train trick,
        # ``steps.fg_crop_size_for``): a running elementwise-max of the
        # group's planned crop sizes, each volume sliced at its OWN
        # offsets (the offsets ride through the scan so the atlas prior
        # stays registered per volume). The reference serves one volume
        # per forward (``Model.py:324-380``, batch 1).
        serve_scan = max(1, int(self.params.get("serve_scan") or 1))
        scan_fns: Dict = {}
        scan_static: Dict = {}  # canvas -> running static crop size
        warmed: set = set()

        def dispatch_one(batch, cropped, crop_info):
            """Upload one (1, D, H, W) volume, dispatch, enqueue fetch."""
            if (self.params.get("use_int8")
                    and self.params.get("int8_adaquant")):
                # host-side AdaQuant calibration hint: the margin-16
                # bbox window of this volume (+ the atlas slice at the
                # same canvas offsets) — lets the int8 builder run the
                # memory-hungry rounding simulation on a window that
                # fits HBM even when the serving window doesn't
                self._int8_calib_hint = None
                plan16 = foreground.plan_crop(
                    cropped[0], margin=min(16, fg_margin),
                    multiple=multiple,
                )
                if plan16 is not None:
                    sl16 = foreground.crop_slices(*plan16)
                    chans = [cropped[0][sl16]]
                    if atlas_p is not None:
                        g_offs = (tuple(
                            o + p for o, p in zip(crop_info[0], plan16[0])
                        ) if crop_info is not None else plan16[0])
                        chans.append(np.asarray(atlas_p)[
                            foreground.crop_slices(g_offs, plan16[1])
                        ])
                    self._int8_calib_hint = np.stack(
                        chans, -1).astype(np.float32)[None]
            up = _t("upload", _upload, cropped)
            out = _t("dispatch", lambda: _hardify(
                predict(variables, up, crop_info[0])
                if crop_info is not None
                else predict(variables, up)
            ))
            pending.append((out, batch, cropped.shape[1:], crop_info))
            if len(pending) >= depth:
                flush_one(pool)

        def dispatch_single(batch, padded, plan):
            crop_info = None
            if plan is not None:
                offs, sizes = plan
                full_shape = padded.shape[1:]
                padded = np.ascontiguousarray(
                    padded[(slice(None),)
                           + foreground.crop_slices(offs, sizes)]
                )
                crop_info = (offs, full_shape)
            dispatch_one(batch, padded, crop_info)

        def _get_scan_fn(k, size):
            key = (k,) + tuple(size)
            if key not in scan_fns:
                @jax.jit
                def scan_fn(vs, images, offsets):
                    def body(c, xo):
                        x1, off = xo
                        return c, _hardify(predict(vs, x1[None], off))

                    _, outs = jax.lax.scan(body, 0, (images, offsets))
                    return outs

                scan_fns[key] = scan_fn
            return scan_fns[key]

        def dispatch_group(group):
            items, group[:] = list(group), []
            if not items:
                return
            canvas = items[0][1].shape
            if len(items) == 1 or any(
                it[1].shape != canvas for it in items
            ):
                for b, p, pl in items:
                    dispatch_single(b, p, pl)
                return
            canvas_sp = canvas[1:]
            if fg_on and all(it[2] is not None for it in items):
                need = tuple(
                    max(it[2][1][ax] for it in items) for ax in range(3)
                )
                cur = scan_static.get(canvas_sp, (0, 0, 0))
                size = tuple(
                    min(c, s + (-s % multiple))
                    for c, s in zip(
                        canvas_sp,
                        (max(n, p) for n, p in zip(need, cur)),
                    )
                )
                scan_static[canvas_sp] = size
            else:
                size = canvas_sp
            if size == canvas_sp:
                offs_k = [(0, 0, 0)] * len(items)
                crop_infos = [None] * len(items)
                vols = [it[1][0] for it in items]
            else:
                offs_k, crop_infos, vols = [], [], []
                for b, p, pl in items:
                    # the shared window >= this volume's planned window,
                    # so clamping the offsets into the canvas keeps the
                    # bbox covered (window start only ever moves DOWN)
                    offs = tuple(
                        min(o, c - s)
                        for o, c, s in zip(pl[0], canvas_sp, size)
                    )
                    offs_k.append(offs)
                    crop_infos.append((offs, canvas_sp))
                    vols.append(np.ascontiguousarray(
                        p[(slice(None),)
                          + foreground.crop_slices(offs, size)]
                    )[0])
            if tuple(size) not in warmed:
                # the int8/bf16 engine for a NEW shape is built lazily
                # from a concrete calibration volume — a scan trace only
                # carries tracers, so warm it with one real dispatch and
                # scan the rest of the group
                warmed.add(tuple(size))
                b, p, pl = items.pop(0)
                dispatch_one(b, vols.pop(0)[None], crop_infos.pop(0))
                offs_k.pop(0)
                if not items:
                    return
            stacked = np.ascontiguousarray(np.stack(vols))
            up = _t("upload", _upload, stacked)
            fn = _get_scan_fn(len(items), size)
            offsets = np.asarray(offs_k, np.int32)
            outs = _t("dispatch", lambda: fn(variables, up, offsets))
            for k, (b, p, pl) in enumerate(items):
                out_k = jax.tree.map(lambda a, _k=k: a[_k], outs)
                pending.append((out_k, b, tuple(size), crop_infos[k]))
                if len(pending) >= depth:
                    flush_one(pool)

        n_batches = 0
        t_loop0 = _time.perf_counter()
        group: list = []
        with cf.ThreadPoolExecutor(2) as pool:
            it = iter(self.data["test_loader"])
            while True:
                batch = _t("decode-wait", next, it, None)
                if batch is None:
                    break
                n_batches += 1
                images = batch["image"]
                pads = [(0, -s % multiple) for s in images.shape[1:]]
                padded = _t("pad", np.pad, images, [(0, 0)] + pads)
                plan = None
                if fg_on and padded.shape[0] == 1:
                    plan = foreground.plan_crop(
                        padded[0], margin=fg_margin, multiple=multiple
                    )
                if serve_scan > 1 and padded.shape[0] == 1:
                    group.append((batch, padded, plan))
                    if len(group) >= serve_scan:
                        dispatch_group(group)
                else:
                    dispatch_single(batch, padded, plan)
            dispatch_group(group)
            while pending:
                flush_one(pool)
            t_drain0 = _time.perf_counter()
            for f in write_futs:
                self.out_paths = f.result()
            prof["write-drain"] += _time.perf_counter() - t_drain0
        if prof_on and n_batches:
            total = _time.perf_counter() - t_loop0
            print("serving profile (loop-blocking seconds, "
                  f"{n_batches} batches, {total:.2f}s total):")
            for k, v in sorted(prof.items(), key=lambda kv: -kv[1]):
                print(f"  {k:<14s} {v:8.2f}s  ({v / n_batches * 1000:7.1f} "
                      "ms/batch)")
            other = total - sum(prof.values())
            print(f"  {'other':<14s} {other:8.2f}s  "
                  f"({other / n_batches * 1000:7.1f} ms/batch)")


def load_ini_file(ini_file: str) -> None:
    """Create a Model from an ini path (ref ``Model.py:549-551``)."""
    Model(ini_file)


def cli() -> None:
    """Console entry point: ``ctunet-tpu <cfg.ini>`` (ref ``Model.py:554-557``)."""
    if len(sys.argv) > 1:
        Model([sys.argv[1]])


if __name__ == "__main__":
    if len(sys.argv) > 1:
        Model([sys.argv[1]])
