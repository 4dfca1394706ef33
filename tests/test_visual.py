"""Visual encoder tests: shapes, masking semantics, frozen-trunk grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbinaural_tpu.core.config import CLIPConfig
from diffbinaural_tpu.models.visual import (
    CLIPVisionTransformer,
    ClipPos2D,
    ClipPos2DEnhanced,
    ResnetEncoder,
    SetTransformerAggregation,
    TransformerEncoderLayer,
    build_visual,
    sinusoidal_position_encoding,
)

TINY_CLIP = CLIPConfig(image_size=32, patch_size=16, width=64, layers=2, heads=2)


def _frames(B=2, T=2, N=3, hw=32):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 3, T, N, hw, hw)).astype(np.float32)
    pos = rng.uniform(-1, 1, (B, T, N, 2)).astype(np.float32)
    mask = np.zeros((B, T, N), dtype=bool)
    mask[:, :, -1] = True  # last source padded everywhere
    return jnp.asarray(x), jnp.asarray(pos), jnp.asarray(mask)


def test_clip_tower_shape():
    model = CLIPVisionTransformer(TINY_CLIP)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(1), imgs)
    out = model.apply(params, imgs)
    assert out.shape == (3, 512)


def test_clip_pos2d_shape_and_mask_invariance():
    """Features of PADDED sources must not change the output (masked attn +
    max-pool... note: reference max-pools over ALL N including padded ones —
    we must reproduce that, so padded-source CONTENT does leak through
    max-pool exactly as in the reference.  What must hold: valid outputs stay
    finite and mask=all-invalid frames don't NaN."""
    x, pos, mask = _frames()
    model = ClipPos2D(clip=TINY_CLIP)
    params = model.init(jax.random.PRNGKey(0), x, pos, mask)
    out = model.apply(params, x, pos, mask)
    assert out.shape == (2, 512)
    assert bool(jnp.isfinite(out).all())


def test_clip_pos2d_enhanced_all_invalid_returns_null():
    x, pos, mask = _frames()
    all_invalid = jnp.ones_like(mask)
    model = ClipPos2DEnhanced(clip=TINY_CLIP)
    params = model.init(jax.random.PRNGKey(0), x, pos, mask)
    out = model.apply(params, x, pos, all_invalid)
    assert out.shape == (2, 512)
    assert bool(jnp.isfinite(out).all())
    # both batch rows all-invalid → identical (null-derived) outputs
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-6)


def test_clip_trunk_is_frozen():
    """stop_gradient on the CLIP trunk (reference freezes it,
    networks.py:341-342)."""
    x, pos, mask = _frames(B=1, T=1, N=2)
    model = ClipPos2D(clip=TINY_CLIP)
    params = model.init(jax.random.PRNGKey(0), x, pos, mask)

    def loss(p):
        return jnp.sum(model.apply(p, x, pos, mask) ** 2)

    g = jax.grad(loss)(params)
    clip_grads = jax.tree_util.tree_leaves(g["params"]["clip"])
    assert all(np.allclose(np.asarray(v), 0.0) for v in clip_grads)
    head_grads = jax.tree_util.tree_leaves(
        {k: v for k, v in g["params"].items() if k != "clip"}
    )
    assert any(not np.allclose(np.asarray(v), 0.0) for v in head_grads)


def test_set_aggregation_order_invariance():
    model = SetTransformerAggregation(emb_dim=32, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32))
    mask = jnp.zeros((2, 4), dtype=bool)
    params = model.init(jax.random.PRNGKey(1), x, mask)
    out1 = model.apply(params, x, mask)
    perm = x[:, [2, 0, 3, 1], :]
    out2 = model.apply(params, perm, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_transformer_encoder_layer_post_norm():
    """Output must be LayerNorm-ed (post-norm): per-token mean ≈ bias-dominated,
    variance ≈ 1 at init."""
    layer = TransformerEncoderLayer(dim=32, num_heads=4, ffn_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    var = np.asarray(out).var(axis=-1)
    np.testing.assert_allclose(var, np.ones_like(var), atol=0.2)


def test_time_pe_interleaving():
    pe = sinusoidal_position_encoding(8, 16)
    assert pe.shape == (8, 16)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)  # cos(0)


def test_resnet_encoder_shape():
    model = ResnetEncoder()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 2, 64, 64))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (1, 512)


def test_registry_covers_reference_archs():
    """All arch_frame values from reference ModelBuilder (models.py:10-35)."""
    for arch in ["resnet18", "clip", "clip_pos", "clip_pos2d",
                 "clip_pos2d_concat", "clip_pos2d_enhanced"]:
        assert build_visual(arch) is not None
    with pytest.raises(ValueError):
        build_visual("nope")
