"""Sliding-window patch inference tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops.sliding_window import (
    gaussian_window,
    grid_starts,
    make_sliding_window_fn,
    patch_starts,
)

# heavyweight (CPU-interpret / e2e): full-suite lane only
pytestmark = pytest.mark.slow


def test_patch_starts_cover_volume():
    s = patch_starts(100, 32, 16)
    assert s[0] == 0 and s[-1] == 100 - 32
    # every voxel covered
    covered = np.zeros(100, bool)
    for st in s:
        covered[st : st + 32] = True
    assert covered.all()


def test_patch_starts_small_volume():
    np.testing.assert_array_equal(patch_starts(16, 32, 16), [0])


def test_grid_starts_shape():
    g = grid_starts((64, 64, 64), (32, 32, 32), overlap=0.5)
    assert g.shape[1] == 3
    assert (g >= 0).all() and (g <= 32).all()
    assert len(g) == 27  # 3 starts per axis at 50% overlap


def test_gaussian_window_properties():
    w = gaussian_window((16, 16, 16))
    assert w.shape == (16, 16, 16)
    assert w.max() == pytest.approx(1.0)
    assert w[8, 8, 8] > w[0, 0, 0]
    assert (w > 0).all()


class _Identity:
    """Fake 'model' echoing its input as a 2-channel map."""

    def apply(self, variables, x, train):
        v = x[..., 0:1].astype(jnp.float32)
        return jnp.concatenate([1.0 - v, v], axis=-1)


def test_blending_reconstructs_identity(rng):
    """Tiled identity blending must reproduce the input exactly —
    overlap-weighted averaging of identical values is a no-op."""
    vol = rng.random((1, 40, 40, 40)).astype(np.float32)
    predict = make_sliding_window_fn(
        _Identity(), patch_size=16, overlap=0.5, compute_dtype=jnp.float32
    )
    out = predict({}, jnp.asarray(vol))
    np.testing.assert_allclose(
        np.asarray(out[..., 1]), vol, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), 1.0 - vol, atol=1e-5
    )


class _DoubleOut:
    def apply(self, variables, x, train):
        v = x[..., 0:1].astype(jnp.float32)
        a = jnp.concatenate([1.0 - v, v], axis=-1)
        return a, a * 2.0


def test_double_output_structure(rng):
    vol = rng.random((1, 24, 24, 24)).astype(np.float32)
    predict = make_sliding_window_fn(
        _DoubleOut(), patch_size=16, overlap=0.25, compute_dtype=jnp.float32
    )
    a, b = predict({}, jnp.asarray(vol))
    assert a.shape == (1, 24, 24, 24, 2)
    np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a), atol=1e-5)


def test_atlas_patches_follow_grid(rng):
    """With an atlas, each patch must see the matching atlas window."""
    vol = np.zeros((1, 24, 24, 24), np.float32)
    atlas = rng.random((24, 24, 24)).astype(np.float32)

    class _EchoAtlas:
        def apply(self, variables, x, train):
            v = x[..., 1:2]  # atlas channel
            return jnp.concatenate([v, v], axis=-1)

    predict = make_sliding_window_fn(
        _EchoAtlas(), patch_size=16, overlap=0.5, atlas=atlas,
        compute_dtype=jnp.float32,
    )
    out = predict({}, jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(out[0, ..., 0]), atlas, atol=1e-5)


def test_apply_fn_override(rng):
    """make_sliding_window_fn routes patches through a custom apply_fn
    (the hook the trainer uses to serve patches via the fused engine)."""
    import jax
    import jax.numpy as jnp

    from ctunet_tpu.ops.sliding_window import make_sliding_window_fn

    calls = {"n": 0}

    def apply_fn(variables, x):
        calls["n"] += 1  # traced once; counts traces, not patches
        # constant 2-channel "prediction": class 1 wins everywhere
        return jnp.concatenate(
            [jnp.zeros_like(x[..., :1]), jnp.ones_like(x[..., :1])], -1
        )

    predict = make_sliding_window_fn(
        None, patch_size=8, overlap=0.5, compute_dtype=jnp.float32,
        apply_fn=apply_fn,
    )
    vols = jnp.asarray(rng.random((1, 16, 16, 16)).astype(np.float32))
    out = predict({}, vols)
    assert calls["n"] >= 1
    assert out.shape == (1, 16, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(out[..., 1]), 1.0, atol=1e-6)


class _Conv1:
    """A real (non-constant) patch function: 3D box blur of the image
    channel — sensitive to patch content and boundaries."""

    def apply(self, variables, x, train):
        import jax

        v = x[..., :1].astype(jnp.float32)
        k = jnp.ones((3, 3, 3, 1, 1), jnp.float32) / 27.0
        y = jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.concatenate([y, 1.0 - y], -1)


def test_patch_batch_is_exact(rng):
    """patch_batch=K blends EXACTLY like K=1: same patches, same
    Gaussian weights, only grouped per scan step (grid padding repeats
    the last start, which adds identical value and weight)."""
    vol = rng.random((1, 24, 24, 40)).astype(np.float32)
    outs = {}
    for kb in (1, 3, 4):
        predict = make_sliding_window_fn(
            _Conv1(), patch_size=16, overlap=0.5,
            compute_dtype=jnp.float32, patch_batch=kb,
        )
        outs[kb] = np.asarray(predict({}, jnp.asarray(vol)))
    np.testing.assert_allclose(outs[3], outs[1], atol=1e-6)
    np.testing.assert_allclose(outs[4], outs[1], atol=1e-6)


def test_quarter_overlap_covers_and_blends(rng):
    """overlap=0.25 (the fast patching mode: ~3x fewer patches at
    512-res) still covers every voxel and blends exactly."""
    from ctunet_tpu.ops.sliding_window import grid_starts

    shape = (24, 40, 40)
    s25 = grid_starts(shape, (16, 16, 16), 0.25)
    s50 = grid_starts(shape, (16, 16, 16), 0.5)
    assert len(s25) < len(s50)
    covered = np.zeros(shape, bool)
    for z, y, x in s25:
        covered[z:z + 16, y:y + 16, x:x + 16] = True
    assert covered.all()

    vol = rng.random((1, *shape)).astype(np.float32)
    predict = make_sliding_window_fn(
        _Identity(), patch_size=16, overlap=0.25,
        compute_dtype=jnp.float32, patch_batch=2,
    )
    out = predict({}, jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(out[..., 1]), vol, atol=1e-5)
