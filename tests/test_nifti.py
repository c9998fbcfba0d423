"""NIfTI-1 codec tests: round-trip fidelity of data + physical space."""

import numpy as np
import pytest

from ctunet_tpu.utils import nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize(
    "dtype", [np.uint8, np.int16, np.float32, np.float64]
)
def test_roundtrip_data(tmp_path, suffix, dtype, rng):
    data = (rng.random((5, 7, 9)) * 100).astype(dtype)
    path = str(tmp_path / f"vol{suffix}")
    nifti.write(path, nifti.NiftiImage(data))
    back = nifti.read(path)
    np.testing.assert_array_equal(back.data, data)
    assert back.data.dtype == dtype


def test_roundtrip_affine(tmp_path):
    affine = np.array(
        [
            [0.0, -0.97, 0.1, 12.5],
            [0.97, 0.0, 0.0, -30.25],
            [0.0, 0.1, 2.5, 4.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    img = nifti.NiftiImage(np.zeros((4, 4, 4), np.uint8), affine)
    path = str(tmp_path / "aff.nii.gz")
    nifti.write(path, img)
    back = nifti.read(path)
    np.testing.assert_allclose(back.affine, affine, atol=1e-5)


def test_metadata_accessors():
    affine = np.diag([2.0, 3.0, 4.0, 1.0])
    affine[:3, 3] = [10.0, 20.0, 30.0]
    img = nifti.NiftiImage(np.zeros((2, 2, 2), np.uint8), affine)
    assert img.spacing == (2.0, 3.0, 4.0)
    # RAS->LPS flips the sign of x and y origin, like SimpleITK does.
    assert img.origin == (-10.0, -20.0, 30.0)
    d = np.array(img.direction).reshape(3, 3)
    np.testing.assert_allclose(d, np.diag([-1.0, -1.0, 1.0]))


def test_with_data_preserves_space(rng):
    affine = np.diag([1.0, 1.0, 1.5, 1.0])
    img = nifti.NiftiImage(np.zeros((3, 3, 3), np.uint8), affine)
    out = img.with_data(np.ones((3, 3, 3), np.float32))
    np.testing.assert_array_equal(out.affine, affine)
    assert out.data.dtype == np.float32


def test_zyx_convention(tmp_path):
    """Array index order must be [z,y,x] like sitk.GetArrayFromImage."""
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    path = str(tmp_path / "conv.nii")
    nifti.write(path, nifti.NiftiImage(data))
    back = nifti.read(path)
    assert back.data.shape == (2, 3, 4)
    np.testing.assert_array_equal(back.data, data)


def test_scl_slope_applied(tmp_path):
    # Hand-craft a header with scl_slope=2, scl_inter=1.
    path = str(tmp_path / "scl.nii")
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    nifti.write(path, nifti.NiftiImage(data))
    import struct

    with open(path, "r+b") as f:
        raw = bytearray(f.read())
        struct.pack_into("<f", raw, 112, 2.0)
        struct.pack_into("<f", raw, 116, 1.0)
        f.seek(0)
        f.write(raw)
    back = nifti.read(path)
    np.testing.assert_allclose(back.data, data * 2.0 + 1.0)


def test_bool_written_as_uint8(tmp_path):
    data = np.zeros((2, 2, 2), bool)
    data[0, 0, 0] = True
    path = str(tmp_path / "b.nii.gz")
    nifti.write(path, nifti.NiftiImage(data))
    back = nifti.read(path)
    assert back.data.dtype == np.uint8
    assert back.data[0, 0, 0] == 1


def test_read_header_only(tmp_path):
    """header_only parses the affine without decoding the data (cheap
    with_data templates for prediction writers)."""
    from ctunet_tpu.utils import nifti

    data = (np.random.default_rng(3).random((8, 10, 12)) * 9).astype(
        np.uint8
    )
    affine = np.eye(4)
    affine[:3, 3] = [4.0, -5.5, 6.25]
    affine[0, 0] = 2.0
    p = str(tmp_path / "v.nii.gz")
    nifti.write(p, nifti.NiftiImage(data=data, affine=affine))

    full = nifti.read(p)
    hdr = nifti.read(p, header_only=True)
    np.testing.assert_allclose(hdr.affine, full.affine)
    assert hdr.data.size == 0 and hdr.data.dtype == full.data.dtype
    out = str(tmp_path / "m.nii.gz")
    nifti.write(out, hdr.with_data(np.ones_like(data)))
    back = nifti.read(out)
    np.testing.assert_allclose(back.affine, full.affine)
    assert (back.data == 1).all()
