"""On-device virtual-craniectomy synthesis tests (reference behavior:
``ctunet/pytorch/transforms.py``; see SURVEY.md §2 C5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.data.synthetic import spherical_shell
from ctunet_tpu.ops import synthesis as syn


@pytest.fixture
def skull():
    return jnp.asarray(spherical_shell((32, 32, 32)), jnp.float32)


def test_sphere_mask_geometry():
    keep = np.asarray(syn.sphere_keep_mask((16, 16, 16), jnp.array([8.0, 8.0, 8.0]), 3.0))
    assert keep[8, 8, 8] == 0  # center inside -> removed
    assert keep[8, 8, 11] == 0  # distance 3 <= 3 inside (ref: <=)
    assert keep[8, 8, 12] == 1  # distance 4 outside
    assert keep[0, 0, 0] == 1


def test_box_mask_geometry():
    keep = np.asarray(syn.box_keep_mask((16, 16, 16), jnp.array([8.0, 8.0, 8.0]), 2.0))
    assert keep[8, 8, 8] == 0
    assert keep[6, 6, 6] == 0  # chebyshev 2 <= 2
    assert keep[5, 8, 8] == 1  # chebyshev 3


def test_flap_mask_contains_cube_and_cylinders():
    shape = (32, 32, 32)
    center = jnp.array([16.0, 16.0, 16.0])
    keep = np.asarray(syn.flap_keep_mask(shape, center, 8.0, 2.0))
    assert keep[16, 16, 16] == 0  # inside cube
    removed = 1 - keep
    # Cylinders extend below the cube in y (at y approx center-size/2).
    cube_only = np.asarray(
        1 - syn.box_keep_mask(shape, center * (31.0 / 32.0), 4.0)
    )
    assert removed.sum() > cube_only.sum()  # holes add volume
    assert removed.sum() < removed.size * 0.5  # but it's still local


def test_random_nonzero_voxel_uniform(skull):
    hits = set()
    for i in range(32):
        c, any_nz = syn.random_nonzero_voxel(jax.random.key(i), skull)
        c = np.asarray(c, np.int32)
        assert bool(any_nz)
        assert skull[c[0], c[1], c[2]] > 0  # always lands on bone
        hits.add(tuple(c.tolist()))
    assert len(hits) > 16  # spread out, not a fixed point


def test_random_nonzero_voxel_empty():
    _, any_nz = syn.random_nonzero_voxel(
        jax.random.key(0), jnp.zeros((8, 8, 8))
    )
    assert not bool(any_nz)


def test_random_blank_patch_partition(skull):
    """broken + flap must exactly partition the skull voxels."""
    broken, flap = syn.random_blank_patch(jax.random.key(3), skull)
    broken, flap = np.asarray(broken), np.asarray(flap)
    np.testing.assert_array_equal(broken + flap, np.asarray(skull))
    assert (broken * flap).sum() == 0
    assert flap.sum() > 0  # with prob=1 on a nonempty skull, a hole exists


def test_random_blank_patch_prob_zero(skull):
    broken, flap = syn.random_blank_patch(jax.random.key(0), skull, prob=0.0)
    np.testing.assert_array_equal(np.asarray(broken), np.asarray(skull))
    assert np.asarray(flap).sum() == 0


def test_random_blank_patch_empty_image():
    empty = jnp.zeros((16, 16, 16))
    broken, flap = syn.random_blank_patch(jax.random.key(0), empty)
    assert np.asarray(broken).sum() == 0
    assert np.asarray(flap).sum() == 0


def test_salt_and_pepper_density():
    key = jax.random.key(0)
    img = jnp.ones((24, 24, 24))
    out = np.asarray(syn.salt_and_pepper(key, img, p=1.0, noise_density=0.5))
    assert set(np.unique(out)).issubset({0.0, 1.0})
    assert 0 < (out == 0).mean() < 0.6  # pepper applied but bounded


def test_salt_and_pepper_p_zero(skull):
    out = syn.salt_and_pepper(jax.random.key(0), skull, p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(skull))


def test_flap_rec_transform_shapes_and_types(skull):
    broken, (full, flap) = syn.flap_rec_transform(jax.random.key(1), skull)
    assert broken.shape == skull.shape
    assert full.shape == skull.shape and flap.shape == skull.shape
    np.testing.assert_array_equal(np.asarray(full), np.asarray(skull))
    # flap is a subset of the skull
    assert np.all(np.asarray(flap) <= np.asarray(full))


def test_flap_rec_transform_vmap_batch(skull):
    keys = jax.random.split(jax.random.key(0), 4)
    batch = jnp.stack([skull] * 4)
    broken, (full, flap) = jax.vmap(syn.flap_rec_transform)(keys, batch)
    assert broken.shape == (4, 32, 32, 32)
    flaps = np.asarray(flap)
    # different keys -> different holes
    assert not np.array_equal(flaps[0], flaps[1])


def test_random_flip_deterministic_axis(skull):
    out = syn.random_flip(jax.random.key(0), skull, probability=1.0)
    assert np.asarray(out).sum() == np.asarray(skull).sum()


def test_random_flip_prob_zero(skull):
    out = syn.random_flip(jax.random.key(0), skull, probability=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(skull))
