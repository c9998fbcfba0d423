"""Train/eval step + optimizer tests: the jitted training core."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ctunet_tpu import problem, steps
from ctunet_tpu.data.synthetic import spherical_shell
from ctunet_tpu.models import build_model


@pytest.fixture(scope="module")
def setup():
    model = build_model("UNetSP", compute_dtype="float32",
                        use_checkpoint=False)
    s = 16
    x = jnp.zeros((1, s, s, s, 2), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False
    )
    handler = problem.FlapRecWithShapePriorDoubleOut()
    atlas = spherical_shell((s, s, s)).astype(np.float32)
    batch = {
        "image": jnp.stack(
            [jnp.asarray(spherical_shell((s, s, s), seed=i), jnp.float32)
             for i in range(2)]
        )
    }
    return model, variables, handler, atlas, batch


def _state(variables, optimizer):
    return steps.TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def test_train_step_decreases_loss(setup):
    model, variables, handler, atlas, batch = setup
    opt = steps.make_optimizer(
        {"optimizer": "adam", "learning_rate": 3e-3, "weight_decay": 0.0}
    )
    state = _state(variables, opt)
    cfg = {"ce_lambda": 1.0, "dice_lambda": 1.0, "save_dice_plots": False}
    train = steps.make_train_step(
        model, handler, opt, cfg, atlas=atlas,
        compute_dtype=jnp.float32, donate=False,
    )
    losses = []
    for i in range(8):
        state, terms = train(state, batch, jax.random.key(7))  # fixed key
        losses.append(float(terms["epoch_loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_train_step_metrics_keys(setup):
    model, variables, handler, atlas, batch = setup
    opt = steps.make_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
    state = _state(variables, opt)
    cfg = {"ce_lambda": 1.0, "dice_lambda": 1.0, "save_dice_plots": True}
    train = steps.make_train_step(
        model, handler, opt, cfg, atlas=atlas,
        compute_dtype=jnp.float32, donate=False,
    )
    _, terms = train(state, batch, jax.random.key(0))
    assert set(terms) == {
        "ce_sk", "ce_fl", "dice_loss_sk", "dice_loss_fl",
        "dice_coef_sk", "dice_coef_fl", "epoch_loss",
    }
    # weighted-term bookkeeping: total = sum of loss terms
    total = sum(
        float(terms[k]) for k in ("ce_sk", "ce_fl", "dice_loss_sk",
                                  "dice_loss_fl")
    )
    assert float(terms["epoch_loss"]) == pytest.approx(total, rel=1e-5)


def test_eval_step_no_param_mutation(setup):
    model, variables, handler, atlas, batch = setup
    opt = steps.make_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
    state = _state(variables, opt)
    ev = steps.make_eval_step(
        model, handler, {"ce_lambda": 1.0, "dice_lambda": 0.0},
        atlas=atlas, compute_dtype=jnp.float32,
    )
    terms, (out, targets) = ev(state, batch, jax.random.key(0))
    assert np.isfinite(float(terms["epoch_loss"]))
    full, flap = out
    assert full.shape[0] == 2


def test_from_pairs_path(setup):
    model, variables, handler, atlas, _ = setup
    opt = steps.make_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
    state = _state(variables, opt)
    s = 16
    broken = jnp.stack(
        [jnp.asarray(spherical_shell((s, s, s)), jnp.float32)] * 2
    )
    flap = jnp.zeros_like(broken).at[:, 4:6, 4:6, 4:6].set(1.0)
    train = steps.make_train_step(
        model, handler, opt, {"ce_lambda": 1.0, "dice_lambda": 1.0},
        atlas=atlas, compute_dtype=jnp.float32, from_pairs=True,
        donate=False,
    )
    _, terms = train(state, {"image": broken, "flap": flap},
                     jax.random.key(0))
    assert np.isfinite(float(terms["epoch_loss"]))


@pytest.mark.parametrize(
    "name", ["adam", "adamw", "rmsprop", "sgd"]
)
def test_make_optimizer_variants(name):
    opt = steps.make_optimizer(
        {"optimizer": name, "learning_rate": 1e-3, "momentum": 0.9,
         "weight_decay": 1e-4}
    )
    params = {"w": jnp.ones((4, 4))}
    st = opt.init(params)
    grads = {"w": jnp.full((4, 4), 0.5)}
    updates, _ = opt.update(grads, st, params, value=jnp.asarray(1.0))
    assert jax.tree.leaves(updates)[0].shape == (4, 4)


def test_make_optimizer_unknown_raises():
    with pytest.raises(KeyError):
        steps.make_optimizer({"optimizer": "lion", "learning_rate": 1e-3})


def test_scheduler_reduces_lr_on_plateau():
    """Plateau scheduler scales updates down after `patience` flat steps
    (torch ReduceLROnPlateau defaults, stepped per batch — quirk Q4)."""
    opt = steps.make_optimizer(
        {"optimizer": "sgd", "learning_rate": 1.0, "scheduler": True}
    )
    params = {"w": jnp.ones(())}
    st = opt.init(params)
    grads = {"w": jnp.asarray(1.0)}
    first = None
    for i in range(15):
        updates, st = opt.update(grads, st, params, value=jnp.asarray(5.0))
        if first is None:
            first = float(updates["w"])
    assert abs(float(updates["w"])) < abs(first)  # lr reduced


def test_patch_training(setup):
    """Random-crop patch training: 32^3 volumes trained at 16^3 patches,
    atlas cropped at matched offsets."""
    import numpy as np

    model = build_model("UNetSP", compute_dtype="float32",
                        use_checkpoint=False)
    s = 32
    x = jnp.zeros((1, 16, 16, 16, 2), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False
    )
    opt = steps.make_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
    state = steps.TrainState(
        variables["params"], variables["batch_stats"],
        opt.init(variables["params"]), jnp.zeros((), jnp.int32),
    )
    handler = __import__("ctunet_tpu.problem", fromlist=["problem"])
    handler = handler.FlapRecWithShapePriorDoubleOut()
    atlas = spherical_shell((s, s, s)).astype(np.float32)
    batch = {
        "image": jnp.stack(
            [jnp.asarray(spherical_shell((s, s, s), seed=i), jnp.float32)
             for i in range(2)]
        )
    }
    train = steps.make_train_step(
        model, handler, opt, {"ce_lambda": 1.0, "dice_lambda": 1.0},
        atlas=atlas, compute_dtype=jnp.float32, donate=False,
        train_patch=(16, 16, 16),
    )
    state2, terms = train(state, batch, jax.random.key(0))
    assert np.isfinite(float(terms["epoch_loss"]))
    # different keys crop different patches -> different losses
    _, terms_b = train(state, batch, jax.random.key(5))
    assert float(terms["epoch_loss"]) != float(terms_b["epoch_loss"])


def test_crop_fn_atlas_alignment():
    """The atlas crop must use the same offsets as the image crop."""
    import numpy as np

    vol = jnp.asarray(
        np.arange(8 * 8 * 8, dtype=np.float32).reshape(8, 8, 8)
    )
    crop = steps.make_crop_fn((4, 4, 4), np.asarray(vol))
    batch, atlas_b = crop(jax.random.key(1), {"image": vol[None]})
    # identical source volume and atlas -> identical crops
    np.testing.assert_array_equal(
        np.asarray(batch["image"][0]), np.asarray(atlas_b[0])
    )
    assert batch["image"].shape == (1, 4, 4, 4)


def test_fg_crop_fn_covers_foreground():
    """Foreground crop: offsets snap to the multiple, the window covers
    the bbox + margin, and the atlas is sliced at the same offsets."""
    vol = np.zeros((32, 32, 32), np.float32)
    vol[10:18, 6:14, 12:20] = 1.0  # bbox lows: 10, 6, 12
    atlas = np.arange(32 ** 3, dtype=np.float32).reshape(32, 32, 32)
    crop = steps.make_fg_crop_fn((16, 16, 16), atlas, margin=2, multiple=4)
    batch, atlas_b = crop(jax.random.key(0), {"image": jnp.asarray(vol)[None]})
    img_c = np.asarray(batch["image"][0])
    assert img_c.shape == (16, 16, 16)
    # all foreground voxels are inside the crop
    assert img_c.sum() == vol.sum()
    # offsets = floor((lo - margin)/4)*4 = (8, 4, 8); atlas matches
    np.testing.assert_array_equal(
        np.asarray(atlas_b[0]), atlas[8:24, 4:20, 8:24]
    )


def test_fg_crop_fn_union_with_flap_and_lost_counter():
    """Pair mode: offsets come from the UNION bbox of image|flap (the flap
    fills the defect outside the broken skull's bbox — ADVICE r4 high),
    and fg_lost counts any foreground the static window misses."""
    img = np.zeros((32, 32, 32), np.float32)
    img[20:28, 20:28, 20:28] = 1.0   # broken skull high in the canvas
    flap = np.zeros((32, 32, 32), np.float32)
    flap[2:6, 2:6, 2:6] = 1.0        # flap low in the canvas
    crop = steps.make_fg_crop_fn((32, 32, 32), None, margin=2, multiple=2)
    batch, _ = crop(jax.random.key(0), {
        "image": jnp.asarray(img)[None], "flap": jnp.asarray(flap)[None]
    })
    # canvas-size window from the union bbox -> offsets 0, nothing lost
    assert np.asarray(batch["image"][0]).sum() == img.sum()
    assert np.asarray(batch["flap"][0]).sum() == flap.sum()
    assert int(batch["fg_lost"][0]) == 0

    # a 16-window cannot cover both: the union offsets anchor at the flap
    # (low corner), and fg_lost reports the truncated skull voxels
    crop16 = steps.make_fg_crop_fn((16, 16, 16), None, margin=2, multiple=2)
    b16, _ = crop16(jax.random.key(0), {
        "image": jnp.asarray(img)[None], "flap": jnp.asarray(flap)[None]
    })
    assert np.asarray(b16["flap"][0]).sum() == flap.sum()
    assert int(b16["fg_lost"][0]) == int(img.sum())

    # image-only mode still reports lost voxels for an oversized bbox
    wide = np.zeros((32, 32, 32), np.float32)
    wide[0:32:4, 0, 0] = 1.0
    bw, _ = crop16(jax.random.key(0), {"image": jnp.asarray(wide)[None]})
    assert int(bw["fg_lost"][0]) == int(wide[16:, 0, 0].sum())


def test_fg_crop_train_step_reports_lost_metric(setup):
    """fg_lost_voxels surfaces in the train-step metrics (0 when the
    window covers the foreground)."""
    model = build_model("UNetSP", compute_dtype="float32",
                        use_checkpoint=False)
    x = jnp.zeros((1, 16, 16, 16, 2), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False
    )
    opt = steps.make_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
    state = steps.TrainState(
        variables["params"], variables["batch_stats"],
        opt.init(variables["params"]), jnp.zeros((), jnp.int32),
    )
    handler = problem.FlapRecWithShapePriorDoubleOut()
    s = 32
    atlas = spherical_shell((s, s, s)).astype(np.float32)
    # radius 0.15*32 ≈ 4.8 -> bbox diameter ~10: fits the 16-window
    batch = {
        "image": jnp.asarray(
            spherical_shell((s, s, s), radius_frac=0.15).astype(np.float32)
        )[None]
    }
    step = steps.make_train_step(
        model, handler, opt, {"ce_lambda": 1.0, "dice_lambda": 1.0},
        atlas=atlas, compute_dtype=jnp.float32, donate=False,
        fg_crop_size=(16, 16, 16), fg_margin=2, fg_multiple=2,
    )
    _, terms = step(state, batch, jax.random.key(0))
    assert "fg_lost_voxels" in terms
    assert int(terms["fg_lost_voxels"]) == 0


def test_fg_crop_size_for_plans_shared_window():
    vols = []
    for lo in (4, 8):
        v = np.zeros((32, 32, 32), np.float32)
        v[lo:lo + 10, lo:lo + 6, lo:lo + 8] = 1.0
        vols.append(v)
    size = steps.fg_crop_size_for(vols, (32, 32, 32), margin=2,
                                  multiple=8)
    assert size is not None
    # covers the larger bbox + margins, snapped up to 8
    assert all(s % 8 == 0 for s in size)
    assert all(s <= 32 for s in size)
    # a volume filling the canvas -> no gain -> None
    full = np.ones((32, 32, 32), np.float32)
    assert steps.fg_crop_size_for([full], (32, 32, 32)) is None


def test_fg_crop_training_step(setup):
    """fg_crop_size: the step runs on the crop; with a canvas-size window
    the offsets clamp to zero and the loss matches the no-crop step."""
    model = build_model("UNetSP", compute_dtype="float32",
                        use_checkpoint=False)
    s = 32
    x = jnp.zeros((1, 16, 16, 16, 2), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False
    )
    opt = steps.make_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
    state = steps.TrainState(
        variables["params"], variables["batch_stats"],
        opt.init(variables["params"]), jnp.zeros((), jnp.int32),
    )
    handler = problem.FlapRecWithShapePriorDoubleOut()
    atlas = spherical_shell((s, s, s)).astype(np.float32)
    # shell centered in a 32-canvas: radius ~0.35*32 -> bbox well inside
    batch = {
        "image": jnp.stack(
            [jnp.asarray(
                spherical_shell((s, s, s), seed=i, radius_frac=0.3),
                jnp.float32)
             for i in range(2)]
        )
    }
    cfg = {"ce_lambda": 1.0, "dice_lambda": 1.0}
    train_crop = steps.make_train_step(
        model, handler, opt, cfg, atlas=atlas, compute_dtype=jnp.float32,
        donate=False, fg_crop_size=(16, 16, 16),
    )
    _, terms = train_crop(state, batch, jax.random.key(0))
    assert np.isfinite(float(terms["epoch_loss"]))

    train_full = steps.make_train_step(
        model, handler, opt, cfg, atlas=atlas, compute_dtype=jnp.float32,
        donate=False,
    )
    train_id = steps.make_train_step(
        model, handler, opt, cfg, atlas=atlas, compute_dtype=jnp.float32,
        donate=False, fg_crop_size=(s, s, s),
    )
    _, t_full = train_full(state, batch, jax.random.key(3))
    _, t_id = train_id(state, batch, jax.random.key(3))
    assert float(t_full["epoch_loss"]) == float(t_id["epoch_loss"])
