"""Constant-region short-circuit ("sparsity skip") in the chain conv kernels.

CT skull volumes are ~95% empty; at row-group granularity roughly half of
a volume's (z, H-band) cells see a completely constant input window. The
chain kernels' ``sparse_gh`` mode detects row-constant windows and
broadcasts one exactly-computed representative row instead of running the
full 27-tap matmul stack. The contract is BIT-EXACTNESS vs the dense
kernel on every input — these tests drive both kernels (bf16 + int8) over
inputs that exercise the skip (empty bands, constant-nonzero bands, fully
empty volumes) and inputs that never skip (dense noise), in interpret
mode, asserting bit equality against ``sparse_gh=0``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu.ops.pallas import conv3d as pc

# heavyweight (CPU-interpret / e2e): full-suite lane only
pytestmark = pytest.mark.slow


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _chain_in(x, pack):
    d, hh, ww, cin = x.shape
    wp = ww // pack
    return pc.to_chain(jnp.asarray(x.reshape(d, hh, wp, pack * cin)), pack)


def _run_bf16(x, w, pack, sparse_gh, gh_expected=None):
    d, hh, ww, cin = x.shape
    cout = w.shape[-1]
    wp = ww // pack
    pw = jnp.asarray(pc.pack_weights(w, pack), jnp.float32)
    pb = jnp.asarray(pc.pack_bias(
        np.linspace(-0.5, 0.5, cout).astype(np.float32), pack))
    xc = _chain_in(x.astype(np.float32), pack)
    out = pc.conv3d_chain(
        xc.astype(jnp.float32), pw, pb, hh, wp, interpret=True,
        out_dtype=jnp.float32, sparse_gh=sparse_gh,
    )
    return np.asarray(out)


CASES = [
    "empty_top_half",     # upper H-band all zeros -> top groups skip
    "constant_band",      # nonzero per-channel constant band -> skips too
    "all_empty",          # whole volume zeros -> everything skips
    "dense",              # noise everywhere -> no group ever skips
]


def _make_input(case, rng, d=4, hh=16, ww=16, cin=3):
    x = rng.standard_normal((d, hh, ww, cin)).astype(np.float32)
    if case == "empty_top_half":
        x[:, : hh // 2] = 0.0
    elif case == "constant_band":
        x[:, : hh // 2] = np.arange(1, cin + 1, dtype=np.float32) * 0.25
    elif case == "all_empty":
        x[:] = 0.0
    return x


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("gh", [-1, 2, 4])
def test_sparse_chain_bf16_bit_exact(rng, case, gh):
    x = _make_input(case, rng)
    w = rng.standard_normal((3, 3, 3, 3, 5)).astype(np.float32) * 0.3
    dense = _run_bf16(x, w, pack=2, sparse_gh=0)
    sparse = _run_bf16(x, w, pack=2, sparse_gh=gh)
    np.testing.assert_array_equal(dense, sparse)


@pytest.mark.parametrize("case", CASES)
def test_sparse_chain_q_bit_exact(rng, case):
    d, hh, ww, cin, cout, pack = 4, 16, 16, 3, 5, 2
    wp = ww // pack
    x = rng.integers(0, 90, (d, hh, ww, cin)).astype(np.int8)
    if case == "empty_top_half":
        x[:, : hh // 2] = 0
    elif case == "constant_band":
        x[:, : hh // 2] = np.arange(1, cin + 1, dtype=np.int8)[None]
    elif case == "all_empty":
        x[:] = 0
    w = rng.integers(-127, 127, (3, 3, 3, cin, cout)).astype(np.int8)
    scale = (rng.random(cout) * 2e-3 + 1e-4).astype(np.float32)
    bias = (rng.standard_normal(cout) * 3.0).astype(np.float32)
    pw8 = jnp.asarray(pc.pack_weights(w.astype(np.float32), pack)
                      .astype(np.int8))
    ps = jnp.asarray(pc.pack_bias(scale, pack))
    pb = jnp.asarray(pc.pack_bias(bias, pack))
    xc = _chain_in(x, pack)
    outs = {}
    for gh in (0, 2, 4, -1):
        outs[gh] = np.asarray(pc.conv3d_chain_q(
            xc, pw8, ps, pb, hh, wp, interpret=True, sparse_gh=gh,
        ))
    for gh in (2, 4, -1):
        np.testing.assert_array_equal(outs[0], outs[gh])


def test_sparse_chain_q_zp_bit_exact(rng):
    """Zero-point mode: empty voxels hold q = -128; the skip must fire on
    the -128-constant region and stay bit-exact."""
    d, hh, ww, cin, cout, pack = 4, 16, 16, 3, 5, 2
    wp = ww // pack
    x = rng.integers(-100, 100, (d, hh, ww, cin)).astype(np.int8)
    x[:, : hh // 2] = -128  # zp-mode "empty"
    w = rng.integers(-127, 127, (3, 3, 3, cin, cout)).astype(np.int8)
    scale = (rng.random(cout) * 2e-3 + 1e-4).astype(np.float32)
    bias = (rng.standard_normal(cout) * 3.0 + 200.0).astype(np.float32)
    pw8 = jnp.asarray(pc.pack_weights(w.astype(np.float32), pack)
                      .astype(np.int8))
    ps = jnp.asarray(pc.pack_bias(scale, pack))
    pb = jnp.asarray(pc.pack_bias(bias, pack))
    xq = jnp.asarray(x.reshape(d, hh, wp, pack * cin))
    xc = pc.to_chain(xq, pack, fill=-128)
    dense = np.asarray(pc.conv3d_chain_q(
        xc, pw8, ps, pb, hh, wp, interpret=True, zp=True, sparse_gh=0))
    sparse = np.asarray(pc.conv3d_chain_q(
        xc, pw8, ps, pb, hh, wp, interpret=True, zp=True, sparse_gh=-1))
    np.testing.assert_array_equal(dense, sparse)


def test_resolve_sparse_gh():
    assert pc._resolve_sparse_gh(None, 152, 24) == 0
    assert pc._resolve_sparse_gh(0, 152, 24) == 0
    assert pc._resolve_sparse_gh(8, 152, 24) == 8
    # auto = TILE-level (one branch per grid step): finer groups were
    # measured a net loss on hardware (see _resolve_sparse_gh docstring)
    assert pc._resolve_sparse_gh(-1, 152, 24) == 152
    assert pc._resolve_sparse_gh(-1, 16, 16) == 16
    # explicit gh == ht is the same tile-level skip
    assert pc._resolve_sparse_gh(16, 16, 16) == 16
