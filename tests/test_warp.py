"""Spatial augmentation tests (affine, elastic, cranioplasty chain)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.data.synthetic import spherical_shell
from ctunet_tpu.ops import warp


@pytest.fixture
def skull():
    return jnp.asarray(spherical_shell((24, 24, 24)), jnp.float32)


def test_affine_identity(skull):
    out = warp.affine_warp(
        skull, jnp.eye(3), jnp.zeros(3), order=0
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(skull))


def test_affine_translation():
    vol = jnp.zeros((8, 8, 8)).at[4, 4, 4].set(1.0)
    # translate +2 in z: voxel moves from 4 to 6
    out = warp.affine_warp(vol, jnp.eye(3), jnp.asarray([2.0, 0.0, 0.0]))
    out = np.asarray(out)
    assert out[6, 4, 4] == 1.0 and out[4, 4, 4] == 0.0


def test_affine_preserves_binary(skull):
    out = warp.random_affine(jax.random.key(0), skull, p=1.0)
    assert set(np.unique(np.asarray(out))).issubset({0.0, 1.0})


def test_random_affine_p_zero(skull):
    out = warp.random_affine(jax.random.key(0), skull, p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(skull))


def test_elastic_deforms_but_preserves_topology_roughly(skull):
    out = warp.random_elastic(jax.random.key(1), skull, p=1.0)
    out = np.asarray(out)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    # deformed but same order of magnitude of foreground voxels
    n0, n1 = np.asarray(skull).sum(), out.sum()
    assert n1 > 0.5 * n0 and n1 < 2.0 * n0
    assert not np.array_equal(out, np.asarray(skull))


def test_elastic_locked_borders():
    """Displacement at volume borders must be ~zero (locked control points),
    so border voxels stay put."""
    vol = jnp.ones((16, 16, 16))
    out = warp.random_elastic(jax.random.key(2), vol, p=1.0)
    out = np.asarray(out)
    # corners sample the identity grid -> stay 1 (no out-of-bounds zeros)
    assert out[0, 0, 0] == 1.0 and out[-1, -1, -1] == 1.0


def test_flip_s(skull):
    out = warp.random_flip_s(jax.random.key(0), skull, p=1.0)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.flip(skull, 0))
    )


def test_cranioplasty_transform_contract(skull):
    broken, (full, flap) = warp.cranioplasty_transform(
        jax.random.key(3), skull
    )
    broken, full, flap = map(np.asarray, (broken, full, flap))
    assert set(np.unique(full)).issubset({0.0, 1.0})
    # flap subset of (possibly warped) full skull; broken+flap <= full+noise
    assert np.all(flap <= full)
    assert flap.sum() >= 0
    assert broken.shape == skull.shape


def test_cranioplasty_vmap(skull):
    keys = jax.random.split(jax.random.key(0), 2)
    batch = jnp.stack([skull, skull])
    broken, (full, flap) = jax.vmap(warp.cranioplasty_transform)(keys, batch)
    assert broken.shape == (2, 24, 24, 24)
