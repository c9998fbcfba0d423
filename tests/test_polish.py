"""Round-2 polish: show_model_summary, view(), hausdorff device-argmax,
nifti per-dtype gzip levels."""

import gzip
import os

import jax
import jax.numpy as jnp
import numpy as np

from ctunet_tpu.ops import losses
from ctunet_tpu.utils import nifti
from ctunet_tpu.utils.misc import model_summary, view


def test_model_summary_counts_params(rng):
    from ctunet_tpu.models import build_model

    m = build_model("UNetSP", compute_dtype="float32")
    x = jnp.zeros((1, 16, 16, 16, 2), jnp.float32)
    v = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x, False)
    s = model_summary(m, v, x.shape, print_out=False)
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(v["params"]))
    assert f"{n:,d}" in s  # total matches the tree
    assert "unet/d0/unit0/conv/kernel" in s


def test_view_writes_png(tmp_path, rng):
    p = view(
        rng.random((8, 12, 10)).astype(np.float32),
        save_path=str(tmp_path / "v.png"),
    )
    assert os.path.exists(p) and os.path.getsize(p) > 0
    # batched channels-last input also accepted
    view(
        rng.random((1, 8, 12, 10, 2)).astype(np.float32),
        save_path=str(tmp_path / "v2.png"),
    )


def test_hausdorff_device_argmax_matches_host(rng):
    """Device-argmax HD == the reference-parity host version."""
    b, d, h, w, c = 2, 8, 10, 12, 3
    logits = jnp.asarray(rng.standard_normal((b, d, h, w, c)), jnp.float32)
    labels = rng.integers(0, c, (b, d, h, w))
    onehot = jnp.asarray(np.eye(c, dtype=np.float32)[labels])
    probs = jax.nn.softmax(logits, axis=-1)
    ref = losses.hausdorff(np.asarray(probs), np.asarray(onehot))
    got = losses.hausdorff_device_argmax(logits, onehot)
    assert got == ref


def test_nifti_gzip_level_per_dtype(tmp_path, rng):
    """uint8 masks use fast gzip; float volumes get real compression."""
    # a float volume with structure: level-6 default should beat level 1
    vol = np.zeros((24, 24, 24), np.float32)
    vol[4:20, 4:20, 4:20] = rng.random((16, 16, 16)).astype(np.float32)
    img = nifti.NiftiImage(vol, np.eye(4))
    p_auto = str(tmp_path / "auto.nii.gz")
    p_fast = str(tmp_path / "fast.nii.gz")
    nifti.write(p_auto, img)
    nifti.write(p_fast, img, compresslevel=1)
    assert os.path.getsize(p_auto) <= os.path.getsize(p_fast)
    # round-trips regardless of level
    back = nifti.read(p_auto)
    np.testing.assert_array_equal(back.data, vol)

    # uint8 path still round-trips
    m = nifti.NiftiImage((vol > 0.5).astype(np.uint8), np.eye(4))
    p_m = str(tmp_path / "m.nii.gz")
    nifti.write(p_m, m)
    np.testing.assert_array_equal(nifti.read(p_m).data, m.data)
