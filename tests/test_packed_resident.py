"""Packed-resident training graph == the flax graph (values, grads, BN).

models/packed_resident.py keeps activations W-packed between ops; it must
be numerically equivalent to the standard UNet forward in f32: same
outputs, same parameter gradients, same batch-stats updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.models import build_model
from ctunet_tpu.models.packed_resident import PackedResidentModel, supports

# heavyweight (CPU-interpret / e2e): full-suite lane only
pytestmark = pytest.mark.slow


def _setup(model_class, shape, cin, seed=0):
    m = build_model(model_class, compute_dtype="float32",
                    use_checkpoint=False)
    x0 = jnp.zeros((1, *shape, cin), jnp.float32)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(seed), x0,
                                              False)
    # non-trivial running stats so eval mode is discriminative
    vs = {
        "params": vs["params"],
        "batch_stats": jax.tree.map(
            lambda s: s * 1.1 + 0.03, vs["batch_stats"]
        ),
    }
    return m, vs


@pytest.mark.parametrize("model_class,cin", [
    ("UNetSP", 2), ("UNet4b1i3o", 1), ("UNetDO", 1), ("UNetSPSmall", 2),
])
def test_packed_resident_forward_matches_flax(rng, model_class, cin):
    shape = (32, 32, 32) if model_class == "UNetSPSmall" else (16, 16, 32)
    m, vs = _setup(model_class, shape, cin)
    pm = PackedResidentModel(m, model_class, use_remat=False)
    x = jnp.asarray(rng.random((2, *shape, cin)).astype(np.float32))

    for train in (False, True):
        want, wmut = m.apply(vs, x, train, mutable=["batch_stats"])
        got, gmut = pm.apply(vs, x, train, mutable=["batch_stats"])
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-5, rtol=2e-5
            )
        # batch-stats updates identical (train) / unchanged (eval)
        gl = jax.tree.leaves(gmut["batch_stats"])
        wl = jax.tree.leaves(wmut["batch_stats"])
        assert len(gl) == len(wl)
        for g, w in zip(gl, wl):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-5
            )


def test_packed_resident_grads_match_flax(rng):
    shape = (16, 16, 32)
    m, vs = _setup("UNetSP", shape, 2)
    pm = PackedResidentModel(m, "UNetSP", use_remat=True)  # remat path
    x = jnp.asarray(rng.random((1, *shape, 2)).astype(np.float32))

    def loss(apply):
        def f(params):
            out, _ = apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(jnp.square(o)) for o in jax.tree.leaves(out))
        return f

    l1, g1 = jax.value_and_grad(loss(m.apply))(vs["params"])
    l2, g2 = jax.value_and_grad(loss(pm.apply))(vs["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        # f32 summation-order noise across ~1e4-element contractions
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=4e-3,
            err_msg=str(p1),
        )


def test_packed_resident_fallback_on_indivisible(rng):
    """Spatial dims not divisible by 2**n_blocks route to the wrapped
    flax apply (the packed path never sees them)."""

    class _Spy:
        dtype = jnp.float32

        def __init__(self):
            self.calls = 0

        def apply(self, variables, x, train=False, mutable=None):
            self.calls += 1
            return "flax-ran"

    spy = _Spy()
    pm = PackedResidentModel(spy, "UNetSP")
    out = pm.apply({}, jnp.zeros((1, 8, 8, 24, 2)), False)
    assert out == "flax-ran" and spy.calls == 1


def test_packed_resident_rejects_unknown():
    m, vs = _setup("UNetSP", (16, 16, 16), 2)
    assert supports("UNetSP") and not supports("recAE_v2_fixed")
    with pytest.raises(ValueError):
        PackedResidentModel(m, "recAE_v2_fixed")


def test_packed_train_model_loop_matches_standard(tmp_path):
    """Public Model loop with b_packed_train reproduces the standard
    graph's loss history (f32, same seed/data)."""
    from ctunet_tpu import Model
    from ctunet_tpu.data import make_dataset, spherical_shell
    from ctunet_tpu.data.atlas import register_atlas

    csv = make_dataset(str(tmp_path / "d"), n=2, shape=(32, 32, 32), seed=5)
    register_atlas((32, 32, 32), spherical_shell((32, 32, 32)))

    def run(tag, **over):
        m = Model(params=dict(
            train_flag=True, test_flag=False, name=tag,
            model_class="UNetSP",
            problem_handler="FlapRecWithShapePriorDoubleOut",
            device="cpu", n_epochs=2, batch_size=2, dice_lambda=1.0,
            ce_lambda=1.0, optimizer="adam", learning_rate=1e-3,
            momentum=0.99, weight_decay=0.0,
            workspace_path=str(tmp_path / f"ws_{tag}"),
            train_files_csv=csv, validation_files_csv=csv,
            test_files_csv=csv, autosave_epochs=0, save_dice_plots=False,
            n_workers=1, compute_dtype="float32", remat=False,
            log_every=0, seed=0, mesh_data=1, **over,
        ))
        return [v for _, v in m.writer.history["train/epoch/epoch_loss"]]

    std = run("std", packed_train=False)
    pkd = run("pkd", packed_train=True)
    assert len(std) == len(pkd) == 2
    np.testing.assert_allclose(pkd, std, rtol=2e-4, atol=2e-5)


def test_packed_pool_backward_finite_on_denormals(rng):
    """Round-5 regression: the packed pool's backward must stay finite
    and gradient-conserving even when activations are denormal. The
    first dense-lane rewrite reconstructed the window max through a
    0/1-selection MATMUL and bit-compared it against the input — a
    backend that approximates the matmul (CPU oneDNN flushes denormals)
    then misses the equality, the tie count hits 0, and g/0 NaNs the
    step (observed key-dependently in whole-model training). The
    shipped backward builds the equality path elementwise."""
    from ctunet_tpu.models.packed_resident import _make_pool2_packed

    p, c = 16, 7
    for scale in (1.0, 1e-40):
        xq = jnp.asarray(
            rng.standard_normal((1, 16, 16, 2, p * c)).astype(np.float32)
            * scale
        )
        pool = _make_pool2_packed(p, c)
        y, vjp = jax.vjp(pool, xq)
        g = jnp.asarray(
            rng.standard_normal(y.shape).astype(np.float32)
        )
        (dx,) = vjp(g)
        assert bool(jnp.isfinite(dx).all()), f"NaN/inf grads at {scale=}"
        # every output's gradient is fully distributed over its window
        np.testing.assert_allclose(
            float(dx.astype(jnp.float64).sum()),
            float(g.astype(jnp.float64).sum()), rtol=1e-4,
        )  # f32 divide/accumulate noise over ~28k elements
