"""Dataset / host-pipeline / atlas-registry tests."""

import numpy as np
import pytest

from ctunet_tpu.data import atlas as atlas_mod
from ctunet_tpu.data import datasets as ds
from ctunet_tpu.data.pipeline import HostLoader, device_prefetch
from ctunet_tpu.data.synthetic import make_dataset, spherical_shell
from ctunet_tpu.utils import nifti


@pytest.fixture(scope="module")
def csvfile(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return make_dataset(str(root), n=4, shape=(8, 8, 8))


def test_dataset_len_and_sample(csvfile):
    d = ds.NiftiImageDataset(csvfile)
    assert len(d) == 4
    s = d[0]
    assert s["image"].shape == (8, 8, 8)
    assert s["image"].dtype == np.float32
    assert s["filepath"].endswith(".nii.gz")


def test_dataset_single_file(csvfile):
    import os

    f = os.path.join(os.path.dirname(csvfile), "skull_001.nii.gz")
    d = ds.NiftiImageDataset(single_file=f)
    assert len(d) == 1
    assert d[0]["filepath"] == f


def test_preaugmented_pair(tmp_path):
    """Rows with the already_augmented id yield (broken, flap) pairs
    (ref datasets.py:216-230)."""
    import csv as csvmod

    broken = spherical_shell((8, 8, 8))
    flap = np.zeros_like(broken)
    flap[2:4, 2:4, 2:4] = 1
    bp = str(tmp_path / "sk_nfg_d.nii.gz")
    fp = str(tmp_path / "sk_nfg_flap.nii.gz")
    nifti.write(bp, nifti.NiftiImage(broken))
    nifti.write(fp, nifti.NiftiImage(flap))
    cp = str(tmp_path / "files.csv")
    with open(cp, "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerow(["image", "mask"])
        w.writerow([bp, fp])
    d = ds.FlapRecWShapePrior2OTrainDataset(cp)
    s = d[0]
    assert "flap" in s
    np.testing.assert_array_equal(s["flap"], flap.astype(np.float32))


def test_host_loader_batches(csvfile):
    d = ds.NiftiImageDataset(csvfile)
    loader = HostLoader(d, batch_size=2, n_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 8, 8, 8)
    assert len(batches[0]["filepath"]) == 2


def test_host_loader_with_replacement(csvfile):
    """Sampling with replacement (quirk Q4): draws can repeat."""
    d = ds.NiftiImageDataset(csvfile)
    loader = HostLoader(d, batch_size=4, n_workers=1, seed=1,
                        replacement=True)
    seen = []
    for _ in range(8):
        for b in loader:
            seen.extend(b["filepath"])
    assert len(set(seen)) <= 4
    # with replacement over many epochs, some batch repeats a file
    dup_found = any(
        len(set(  # one epoch draw
            seen[i : i + 4]
        )) < 4
        for i in range(0, len(seen), 4)
    )
    assert dup_found


def test_host_loader_no_shuffle_order(csvfile):
    d = ds.NiftiImageDataset(csvfile)
    loader = HostLoader(d, batch_size=1, shuffle=False, n_workers=1)
    names = [b["filepath"][0] for b in loader]
    assert names == sorted(names)


def test_device_prefetch_passthrough(csvfile):
    d = ds.NiftiImageDataset(csvfile)
    loader = HostLoader(d, batch_size=2, n_workers=1)
    out = list(device_prefetch(iter(loader), depth=2))
    assert len(out) == 2
    import jax

    assert isinstance(out[0]["image"], jax.Array)
    assert isinstance(out[0]["filepath"], list)


def test_device_prefetch_packs_binary_exactly():
    """Binary float volumes cross the link as packed bits and come back
    bit-exact; non-binary data transfers raw. Works under a batch
    NamedSharding (8 virtual devices)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    rng = np.random.default_rng(0)
    binary = (rng.random((2, 16, 64, 64)) > 0.7).astype(np.float32)
    nonbin = rng.random((2, 16, 64, 64)).astype(np.float32)
    batches = [{"image": binary, "raw": nonbin, "filepath": ["a", "b"]}]
    out = list(device_prefetch(iter(batches), depth=1))[0]
    assert isinstance(out["image"], jax.Array)
    assert out["image"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out["image"]), binary)
    np.testing.assert_array_equal(np.asarray(out["raw"]), nonbin)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    sh = NamedSharding(mesh, PartitionSpec("data"))
    out = list(device_prefetch(iter(batches), depth=1, sharding=sh))[0]
    np.testing.assert_array_equal(np.asarray(out["image"]), binary)
    # the packed upload keeps the batch dim sharded over the mesh
    assert len(out["image"].sharding.device_set) == 2


def test_put_packed_odd_sizes_roundtrip():
    """Voxel counts not divisible by 8: packbits pads the final byte and
    the device unpack must trim it (count=...) — bit-exact round trip."""
    from ctunet_tpu.data.pipeline import put_packed_or_none

    rng = np.random.default_rng(2)
    v = (rng.random((1, 31, 65, 67)) > 0.4).astype(np.float32)
    out = put_packed_or_none(v)
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out), v)


def test_device_prefetch_mixed_binary_batches():
    """A later non-binary batch for a key that started binary must still
    transfer exactly (the check runs per batch, not once)."""
    rng = np.random.default_rng(1)
    b1 = (rng.random((1, 32, 64, 64)) > 0.5).astype(np.float32)
    b2 = rng.random((1, 32, 64, 64)).astype(np.float32)
    outs = list(device_prefetch(
        iter([{"image": b1}, {"image": b2}]), depth=1
    ))
    np.testing.assert_array_equal(np.asarray(outs[0]["image"]), b1)
    np.testing.assert_array_equal(np.asarray(outs[1]["image"]), b2)


def test_atlas_unknown_size_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="different than the"):
        atlas_mod.load_atlas((3, 3, 3), str(tmp_path))


def test_atlas_register_and_load():
    arr = spherical_shell((8, 8, 8)).astype(np.float32)
    atlas_mod.register_atlas((8, 8, 8), arr)
    got = atlas_mod.load_atlas((8, 8, 8), "/nonexistent")
    np.testing.assert_array_equal(got, arr)


def test_atlas_convention_discovery(tmp_path):
    arr = spherical_shell((6, 10, 12)).astype(np.float32)
    p = str(tmp_path / "atlas_10_6.nii.gz")
    nifti.write(p, nifti.NiftiImage(arr))
    got = atlas_mod.load_atlas((6, 10, 12), str(tmp_path))
    np.testing.assert_array_equal(got, arr)


def test_decode_cache(tmp_path):
    """Decode cache: second read hits RAM; capacity evicts LRU; mtime
    invalidates."""
    import numpy as np

    from ctunet_tpu.data import make_dataset
    from ctunet_tpu.data.datasets import _DecodeCache

    calls = {"n": 0}

    def make_loader(val):
        def load():
            calls["n"] += 1
            return np.full((4, 4, 4), val, np.float32)
        return load

    c = _DecodeCache(max_bytes=2 * 4 * 4 * 4 * 4)  # fits two volumes
    p = str(tmp_path / "a")
    open(p, "w").write("x")
    a1 = c.get(p, make_loader(1.0))
    a2 = c.get(p, make_loader(1.0))
    assert calls["n"] == 1 and a1 is a2
    assert not a1.flags.writeable
    # evict: add two more distinct paths
    for i in range(2):
        q = str(tmp_path / f"b{i}")
        open(q, "w").write("x")
        c.get(q, make_loader(float(i)))
    c.get(p, make_loader(2.0))  # 'a' was evicted -> reload
    assert calls["n"] == 4
