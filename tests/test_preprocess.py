"""On-device ingest tests: HU window, resample, pad/unpad, morphology."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops import preprocess as pp


def test_hu_window_binarize():
    vol = jnp.asarray([[[-1000.0, 0.0], [200.0, 3000.0]]])
    out = np.asarray(pp.hu_window(vol, lo=-100, hi=1500, threshold=150))
    np.testing.assert_array_equal(out, [[[0, 0], [1, 1]]])


def test_hu_window_normalize():
    vol = jnp.asarray([[[-100.0, 700.0, 1500.0, 9999.0]]])
    out = np.asarray(pp.hu_window(vol, lo=-100, hi=1500, binarize=False))
    np.testing.assert_allclose(out, [[[0.0, 0.5, 1.0, 1.0]]])


def test_resample_to_shape_identity(rng):
    vol = jnp.asarray(rng.random((8, 8, 8)), jnp.float32)
    out = pp.resample_to_shape(vol, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-6)


def test_resample_to_spacing_shape():
    vol = jnp.zeros((10, 20, 20))
    out = pp.resample_to_spacing(vol, spacing=(2.0, 1.0, 1.0))
    assert out.shape == (20, 20, 20)


def test_fixed_pad_unpad_roundtrip(rng):
    vol = jnp.asarray(rng.random((5, 6, 7)), jnp.float32)
    padded, padding = pp.fixed_pad(vol, (8, 8, 8))
    assert padded.shape == (8, 8, 8)
    back = pp.unpad(padded, padding)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vol))


def test_fixed_pad_too_small_raises():
    with pytest.raises(ValueError):
        pp.fixed_pad(jnp.zeros((9, 9, 9)), (8, 8, 8))


def test_pad_to_multiple():
    padded, padding = pp.pad_to_multiple(jnp.zeros((17, 32, 33)), 16)
    assert padded.shape == (32, 32, 48)
    assert padding == ((0, 15), (0, 0), (0, 15))


def test_erode_dilate_inverse_on_solid():
    vol = jnp.zeros((12, 12, 12)).at[4:8, 4:8, 4:8].set(1.0)
    er = pp.erode(vol)
    assert np.asarray(er).sum() == 2 * 2 * 2  # 4^3 cube erodes to 2^3
    di = pp.dilate(er)
    # dilation of the eroded cube stays inside the original
    assert np.all(np.asarray(di) <= np.asarray(vol))


def test_dilate_grows_single_voxel():
    vol = jnp.zeros((7, 7, 7)).at[3, 3, 3].set(1.0)
    di = np.asarray(pp.dilate(vol))
    assert di.sum() == 7  # 6-neighborhood + center
    assert di[3, 3, 3] == 1 and di[2, 3, 3] == 1 and di[3, 3, 4] == 1
    assert di[2, 2, 3] == 0  # no diagonal


def test_dilate_border_no_wrap():
    vol = jnp.zeros((4, 4, 4)).at[0, 0, 0].set(1.0)
    di = np.asarray(pp.dilate(vol))
    assert di[3, 0, 0] == 0 and di[0, 3, 0] == 0 and di[0, 0, 3] == 0


def test_erode_dilate_random():
    vol = jnp.zeros((8, 8, 8)).at[2:6, 2:6, 2:6].set(1.0)
    out = pp.erode_dilate(jax.random.key(0), vol, p=1.0)
    s = np.asarray(out).sum()
    # eroded 4^3 -> 2^3 = 8, or dilated 4^3 -> 64 + 6 faces of 16 = 160
    assert s in (8, 160)
    out_id = pp.erode_dilate(jax.random.key(0), vol, p=0.0)
    np.testing.assert_array_equal(np.asarray(out_id), np.asarray(vol))
