"""Postprocessing tests: threshold + largest connected component."""

import jax.numpy as jnp
import numpy as np

from ctunet_tpu.ops.postprocess import largest_cc, largest_cc_device, threshold


def _two_blobs():
    m = np.zeros((16, 16, 16), np.float32)
    m[2:8, 2:8, 2:8] = 1.0  # big: 216 voxels
    m[12:14, 12:14, 12:14] = 1.0  # small: 8 voxels
    return m


def test_threshold():
    v = jnp.asarray([0.2, 0.5, 0.9])
    np.testing.assert_array_equal(np.asarray(threshold(v)), [0, 1, 1])


def test_largest_cc_host():
    m = _two_blobs()
    out = largest_cc(m)
    assert out.sum() == 216
    assert out[3, 3, 3] == 1 and out[12, 12, 12] == 0


def test_largest_cc_host_empty():
    out = largest_cc(np.zeros((4, 4, 4)))
    assert out.sum() == 0


def test_largest_cc_host_single():
    m = np.zeros((8, 8, 8), np.float32)
    m[2:4, 2:4, 2:4] = 1
    np.testing.assert_array_equal(largest_cc(m), m)


def test_largest_cc_device_matches_host():
    m = _two_blobs()
    out_d = np.asarray(largest_cc_device(jnp.asarray(m)))
    np.testing.assert_array_equal(out_d, largest_cc(m))


def test_largest_cc_device_diagonals_disconnected():
    """6-connectivity: diagonal touch is NOT connected."""
    m = np.zeros((8, 8, 8), np.float32)
    m[2:5, 2:5, 2:5] = 1.0  # 27 voxels
    m[5, 5, 5] = 1.0  # diagonal neighbor only
    out = np.asarray(largest_cc_device(jnp.asarray(m)))
    assert out.sum() == 27 and out[5, 5, 5] == 0
    np.testing.assert_array_equal(out, largest_cc(m))
