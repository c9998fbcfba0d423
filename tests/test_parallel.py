"""Mesh/sharding tests on the 8-virtual-device CPU backend
(SURVEY.md §4: the JAX analog of a fake distributed backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.parallel import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    replicate_tree,
    volume_sharding,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh(8, 1)
    assert m.shape == {DATA_AXIS: 8, SPATIAL_AXIS: 1}
    m = make_mesh(4, 2)
    assert m.shape == {DATA_AXIS: 4, SPATIAL_AXIS: 2}
    m = make_mesh(0, 2)  # auto: all remaining on data
    assert m.shape == {DATA_AXIS: 4, SPATIAL_AXIS: 2}


def test_make_mesh_too_many_raises():
    with pytest.raises(ValueError):
        make_mesh(16, 1)


def test_batch_sharding_places_batch():
    mesh = make_mesh(8, 1)
    sh = batch_sharding(mesh)
    x = jax.device_put(np.zeros((8, 4, 4, 4), np.float32), sh)
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (1, 4, 4, 4)


def test_spatial_sharding_splits_depth():
    mesh = make_mesh(1, 8)
    sh = volume_sharding(mesh, spatial_dim=1)
    x = jax.device_put(np.zeros((1, 32, 4, 4), np.float32), sh)
    assert x.addressable_shards[0].data.shape == (1, 4, 4, 4)


def test_replicate_tree():
    mesh = make_mesh(8, 1)
    tree = {"w": np.ones((3, 3), np.float32)}
    rep = replicate_tree(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_sharded_conv_matches_single_device(rng):
    """A 3D conv over a spatially-sharded volume must equal the unsharded
    result — XLA SPMD inserts the halo exchange."""
    mesh = make_mesh(1, 8)
    x = rng.standard_normal((1, 32, 8, 8, 2)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 2, 4)).astype(np.float32)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    ref = jax.jit(conv)(jnp.asarray(x), jnp.asarray(w))
    xs = jax.device_put(x, volume_sharding(mesh, 1))
    out = jax.jit(conv)(xs, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dp_gradient_matches_single_device(rng):
    """Data-parallel loss gradients over the mesh == single-device grads
    (the DataParallel-replacement correctness gate)."""
    from ctunet_tpu.models.unet import UNet

    mesh = make_mesh(8, 1)
    model = UNet(i_size=2, n_blocks=2, out_channels=2, use_checkpoint=False)
    x = rng.standard_normal((8, 8, 8, 8, 1)).astype(np.float32)
    y = (rng.random((8, 8, 8, 8, 2)) > 0.5).astype(np.float32)
    vs = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), jnp.asarray(x[:1]), False
    )

    def loss(params, batch_stats, x, y):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, True,
            mutable=["batch_stats"],
        )
        return jnp.mean((out - y) ** 2)

    g_single = jax.jit(jax.grad(loss))(
        vs["params"], vs["batch_stats"], jnp.asarray(x), jnp.asarray(y)
    )
    params_r = replicate_tree(vs["params"], mesh)
    stats_r = replicate_tree(vs["batch_stats"], mesh)
    sh = batch_sharding(mesh)
    g_dp = jax.jit(jax.grad(loss))(
        params_r, stats_r, jax.device_put(x, sh), jax.device_put(y, sh)
    )
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        )
