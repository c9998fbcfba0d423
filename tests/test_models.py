"""Model zoo structural tests: registry, shape arithmetic, param-count
parity with the reference's live (non-dead) weights, head algebra.

Golden live-param counts computed from the reference's own torch models
(``/root/reference/ctunet/pytorch/models.py``), excluding the dead center
block (quirk Q1, SURVEY.md §5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctunet_tpu import registry
from ctunet_tpu.models import (
    DOUBLE_OUTPUT_MODELS,
    MODEL_INPUT_CHANNELS,
    UNet,
    build_model,
)

GOLDEN_LIVE_PARAMS = {
    "UNet4b2i3o": 634595,
    "UNet5b2i3o": 833923,
    "UNet4b1i3o": 634406,
    "UNetSP": 634595,
    "UNetSPSmall": 833923,
    "UNetDO": 634406,
    "recAE_v2_fixed": 6770698,
    "UNet4_2IC": 5185084,
}

# Smallest legal spatial size per model (2^n_blocks divisibility).
SPATIAL = {
    "UNet5b2i3o": 32,
    "UNetSPSmall": 32,
}


def _init(name, spatial=None, train=False):
    m = build_model(name, use_checkpoint=False)
    s = spatial or SPATIAL.get(name, 16)
    x = jnp.zeros((1, s, s, s, MODEL_INPUT_CHANNELS[name]))
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x, train)
    return m, vs, x


def test_registry_complete():
    for name in GOLDEN_LIVE_PARAMS:
        assert name in registry.MODEL_REGISTRY, name


def test_registry_unknown_raises():
    with pytest.raises(KeyError, match="Unknown model class"):
        registry.get_model("NotAModel")


@pytest.mark.parametrize("name", sorted(GOLDEN_LIVE_PARAMS))
def test_param_count_parity(name):
    m, vs, _ = _init(name)
    n = sum(p.size for p in jax.tree.leaves(vs["params"]))
    assert n == GOLDEN_LIVE_PARAMS[name]


@pytest.mark.parametrize("name", sorted(GOLDEN_LIVE_PARAMS))
def test_forward_shapes(name):
    m, vs, x = _init(name)
    out = jax.jit(m.apply, static_argnums=(2,))(vs, x, False)
    s = x.shape[1]
    if name in DOUBLE_OUTPUT_MODELS:
        full, flap = out
        assert full.shape == (1, s, s, s, 2)
        assert flap.shape == (1, s, s, s, 2)
    elif name in ("recAE_v2_fixed", "UNet4_2IC"):
        assert out.shape == (1, s, s, s, 2)
        # softmax head sums to 1
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
    else:
        assert out.shape == (1, s, s, s, 3)


def test_unetsp_head_algebra():
    """UNetSP encodings (``models.py:317-330``): full = [bg, flap+fullsk],
    flap = [1-flap, flap] from the sigmoided 3-channel UNet output."""
    m, vs, x = _init("UNetSP")
    key = jax.random.key(1)
    x = jax.random.uniform(key, x.shape)
    full, flap = m.apply(vs, x, False)
    full, flap = np.asarray(full), np.asarray(flap)
    # flap head channels are complementary
    np.testing.assert_allclose(flap[..., 0] + flap[..., 1], 1.0, atol=1e-5)
    # all values come from sigmoids/sums of sigmoids
    assert full[..., 0].min() >= 0 and full[..., 0].max() <= 1
    assert full[..., 1].min() >= 0 and full[..., 1].max() <= 2


def test_unetspsmall_heads_softmaxed():
    m, vs, x = _init("UNetSPSmall")
    full, flap = m.apply(vs, x, False)
    np.testing.assert_allclose(np.asarray(full.sum(-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(flap.sum(-1)), 1.0, atol=1e-5)


def test_train_mode_updates_batch_stats():
    m, vs, x = _init("UNet4b2i3o")
    x = jax.random.uniform(jax.random.key(0), x.shape) * 2.0
    out, mut = m.apply(vs, x, True, mutable=["batch_stats"])
    before = jax.tree.leaves(vs["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    assert changed


def test_generic_unet_options():
    """Exercise the constructor option space (add-skips, no-skips,
    residual) at a tiny size."""
    x = jnp.zeros((1, 8, 8, 8, 1))
    for kwargs in (
        dict(cat=False),
        dict(use_skip_connections=False),
        dict(residual=True),
    ):
        m = UNet(i_size=2, n_blocks=2, out_channels=2,
                 use_checkpoint=False, **kwargs)
        vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x, False)
        y = m.apply(vs, x, False)
        assert y.shape == (1, 8, 8, 8, 2)


def test_remat_matches_no_remat():
    """Activation recompute must not change the function's value."""
    x = jax.random.uniform(jax.random.key(2), (1, 16, 16, 16, 2))
    m_a = build_model("UNet4b2i3o", use_checkpoint=False)
    m_b = build_model("UNet4b2i3o", use_checkpoint=True)
    vs = jax.jit(m_a.init, static_argnums=(2,))(jax.random.key(0), x, False)
    y_a = m_a.apply(vs, x, False)
    y_b = m_b.apply(vs, x, False)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b), atol=1e-6)


def test_bf16_compute_dtype():
    x = jnp.zeros((1, 16, 16, 16, 2), jnp.bfloat16)
    m = build_model("UNetSP", compute_dtype="bfloat16", use_checkpoint=False)
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x, False)
    # params stay f32, conv compute in bf16
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(vs["params"]))
    full, flap = m.apply(vs, x, False)
    assert full.dtype == jnp.bfloat16


def test_maxpool_custom_vjp_gradient(rng):
    """_maxpool's hand VJP == jnp.max's autodiff away from ties."""
    import jax
    import jax.numpy as jnp

    from ctunet_tpu.models.unet import _maxpool

    x = jnp.asarray(rng.random((1, 4, 6, 8, 3)).astype(np.float32))
    # no exact ties in random floats -> both tie conventions agree

    def ref(x):
        b, d, h, w, c = x.shape
        y = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c).max((2, 4, 6))
        return jnp.sum(jnp.sin(y))

    def ours(x):
        return jnp.sum(jnp.sin(_maxpool(x)))

    np.testing.assert_allclose(float(ours(x)), float(ref(x)), rtol=1e-6)
    g_ref = jax.grad(ref)(x)
    g_ours = jax.grad(ours)(x)
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), atol=1e-6
    )


def test_convt2x2_matches_flax_convtranspose(rng):
    """_ConvT2x2 (einsum + depth-to-space) == nn.ConvTranspose with the
    SAME params: identical init param shapes, identical outputs.

    This module replaces nn.ConvTranspose for every k2s2 upconv in the
    shipped variants and must stay checkpoint/param-identical (torch
    ConvTranspose3d weights port through it bit-exactly)."""
    import flax.linen as nn

    from ctunet_tpu.models.unet import _ConvT2x2

    feat, cin = 5, 3
    x = jnp.asarray(rng.random((2, 4, 6, 8, cin)).astype(np.float32))

    ours = _ConvT2x2(feat)
    ref = nn.ConvTranspose(
        feat, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
        transpose_kernel=True, use_bias=True,
    )
    v_ours = ours.init(jax.random.PRNGKey(0), x)
    v_ref = ref.init(jax.random.PRNGKey(0), x)

    # param structure identical: same names, shapes, dtypes
    s_ours = jax.tree.map(lambda a: (a.shape, a.dtype), v_ours["params"])
    s_ref = jax.tree.map(lambda a: (a.shape, a.dtype), v_ref["params"])
    assert s_ours == s_ref

    # share the REF params into ours: outputs must match
    y_ours = ours.apply(v_ref, x)
    y_ref = ref.apply(v_ref, x)
    assert y_ours.shape == y_ref.shape == (2, 8, 12, 16, feat)
    np.testing.assert_allclose(
        np.asarray(y_ours), np.asarray(y_ref), atol=1e-5
    )

    # unbatched (4D) input path
    y4 = ours.apply(v_ref, x[0])
    np.testing.assert_allclose(
        np.asarray(y4), np.asarray(y_ref[0]), atol=1e-5
    )


def test_maxpool_packed_backward_matches_autodiff(rng):
    """The W-packed pooling backward (lane-dense full-res temps) is
    gradient-exact vs jnp.max autodiff, including exact ties."""
    import jax
    import jax.numpy as jnp

    from ctunet_tpu.models.unet import _maxpool2, _pool_pack

    def ref(x):
        b, d, h, w, c = x.shape
        y = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c).max((2, 4, 6))
        return jnp.sum(jnp.sin(y * 3))

    def ours(x):
        return jnp.sum(jnp.sin(_maxpool2(x) * 3))

    # (shape, expected pack): thin channels pack toward 128 lanes; wide
    # channels fall back to the standard-space backward
    cases = [((1, 4, 6, 32, 7), 16), ((2, 4, 4, 16, 14), 8),
             ((1, 2, 2, 6, 200), 1)]
    for shape, want_p in cases:
        assert _pool_pack(shape[3], shape[4]) == want_p
        x = jnp.asarray(rng.random(shape).astype(np.float32))
        np.testing.assert_allclose(float(ours(x)), float(ref(x)), rtol=1e-6)
        g1, g2 = jax.grad(ref)(x), jax.grad(ours)(x)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   atol=1e-6)
        # exact ties (duplicated planes): even tie-splitting matches
        xt = jnp.asarray(np.repeat(
            rng.random((shape[0], shape[1] // 2, *shape[2:]))
            .astype(np.float32), 2, axis=1,
        ))
        g1, g2 = jax.grad(ref)(xt), jax.grad(ours)(xt)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   atol=1e-6)
