"""BigVGAN generator tests: shapes, conv-transpose parity vs torch oracle,
snake formula, weight-norm semantics, channels-last resamplers."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from diffbinaural_tpu.core.config import VocoderConfig
from diffbinaural_tpu.models.bigvgan import (
    AMPBlock1,
    Activation1d,
    BigVGAN,
    BinauralBigVGAN,
    WNConv1d,
    WNConvTranspose1d,
    downsample2_nhc,
    snake,
    upsample2_nhc,
)

TINY = VocoderConfig(
    num_mels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


def test_generator_shape_and_range():
    model = BigVGAN(TINY)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    params = model.init(jax.random.PRNGKey(1), mel)
    y = model.apply(params, mel)
    assert y.shape == (2, 1, 16 * 8)  # ∏(4,2) = 8× upsampling
    assert float(jnp.abs(y).max()) <= 1.0  # clamp at final (config default)


def test_binaural_wrapper_shape():
    model = BinauralBigVGAN(TINY)
    l = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    r = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    params = model.init(jax.random.PRNGKey(2), l, r)
    y = model.apply(params, l, r)
    assert y.shape == (2, 2, 16 * 8)
    # shared generator: same mel must give the same waveform on both channels
    y2 = model.apply(params, l, l)
    np.testing.assert_allclose(np.asarray(y2[:, 0]), np.asarray(y2[:, 1]), atol=1e-6)


def test_wn_conv_matches_torch():
    """WNConv1d at init (kernel == v) vs torch.nn.functional.conv1d."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 6)).astype(np.float32)  # (B, T, C)
    conv = WNConv1d(features=4, kernel_size=7, dilation=3)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))

    v = np.asarray(params["params"]["v"])  # (k, in, out)
    w = torch.from_numpy(v.transpose(2, 1, 0).copy())  # (out, in, k)
    ref = F.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1).copy()), w, padding=9, dilation=3
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_wn_conv_transpose_matches_torch():
    """WNConvTranspose1d vs torch conv_transpose1d(k=8, stride=4, pad=2)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 6)).astype(np.float32)
    tconv = WNConvTranspose1d(features=4, kernel_size=8, stride=4)
    params = tconv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(tconv.apply(params, jnp.asarray(x)))

    v = np.asarray(params["params"]["v"])  # (k, out, in)
    w = torch.from_numpy(v.transpose(2, 1, 0).copy())  # (in, out, k)
    ref = F.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1).copy()), w, stride=4, padding=2
    ).numpy().transpose(0, 2, 1)
    assert ours.shape == ref.shape == (2, 64, 4)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "k,u",
    [
        (16, 8),  # polyphase, rate-8 geometry
        (4, 2),   # polyphase, rate-2 production stages
        (4, 4),   # polyphase edge: one tap per phase
        (6, 3),   # u | k but k-u odd: torch emits t*u+1 samples — must
                  # take the lhs-dilated fallback, not the t*u crop
        (7, 3),   # k % u != 0: lhs-dilated fallback
    ],
)
def test_wn_conv_transpose_geometries_match_torch(k, u):
    """Every lowering branch (polyphase and both fallbacks) against the
    torch conv_transpose1d oracle, including output LENGTH."""
    rng = np.random.default_rng(10 * k + u)
    x = rng.standard_normal((2, 11, 5)).astype(np.float32)
    tconv = WNConvTranspose1d(features=3, kernel_size=k, stride=u)
    params = tconv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(tconv.apply(params, jnp.asarray(x)))

    v = np.asarray(params["params"]["v"])  # (k, out, in); g init ⇒ w == v
    w = torch.from_numpy(v.transpose(2, 1, 0).copy())  # (in, out, k)
    ref = F.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1).copy()), w,
        stride=u, padding=(k - u) // 2,
    ).numpy().transpose(0, 2, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_weight_norm_scales_with_g():
    """Doubling g must double the (linear) conv output."""
    x = jnp.ones((1, 16, 3))
    conv = WNConv1d(features=2, kernel_size=3, use_bias=False)
    params = conv.init(jax.random.PRNGKey(0), x)
    y1 = conv.apply(params, x)
    p2 = jax.tree_util.tree_map(lambda a: a, params)
    p2 = {"params": {**p2["params"], "g": p2["params"]["g"] * 2.0}}
    y2 = conv.apply(p2, x)
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-5)


def test_snake_formula():
    """snakebeta(x) = x + sin²(αx)/β with logscale α, β
    (reference activations.py:116-126)."""
    x = np.linspace(-2, 2, 64, dtype=np.float32)
    a, b = 0.3, 0.7
    got = np.asarray(snake(jnp.asarray(x), jnp.exp(a), jnp.exp(b)))
    want = x + (1.0 / (np.exp(b) + 1e-9)) * np.sin(x * np.exp(a)) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nhc_resamplers_match_ncl_reference():
    """Channels-last resamplers must equal the (tested) NCT versions."""
    from diffbinaural_tpu.signal import UpSample1d, DownSample1d

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)  # (B, C, T)
    x_nhc = jnp.asarray(x.transpose(0, 2, 1))

    up_ref = np.asarray(UpSample1d(2, 12)(jnp.asarray(x)))
    up_nhc = np.asarray(upsample2_nhc(x_nhc, 2, 12)).transpose(0, 2, 1)
    np.testing.assert_allclose(up_nhc, up_ref, rtol=1e-4, atol=1e-5)

    dn_ref = np.asarray(DownSample1d(2, 12)(jnp.asarray(x)))
    dn_nhc = np.asarray(downsample2_nhc(x_nhc, 2, 12)).transpose(0, 2, 1)
    np.testing.assert_allclose(dn_nhc, dn_ref, rtol=1e-4, atol=1e-5)


def test_activation1d_preserves_length():
    act = Activation1d(channels=6)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 6))
    params = act.init(jax.random.PRNGKey(1), x)
    y = act.apply(params, x)
    assert y.shape == x.shape


def test_amp_block_residual_structure():
    """AMPBlock output differs from input but keeps shape; zero conv weights
    collapse to identity (pure residual path)."""
    block = AMPBlock1(channels=6, kernel_size=3, dilation=(1, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 6))
    params = block.init(jax.random.PRNGKey(1), x)
    y = block.apply(params, x)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_remove_weight_norm_is_identity():
    """Folding (v, g) must leave the forward numerically unchanged
    (reference remove_weight_norm semantics, bigvgan.py:389-401)."""
    from diffbinaural_tpu.models.bigvgan import remove_weight_norm

    model = BigVGAN(TINY)
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
    params = model.init(jax.random.PRNGKey(1), mel)
    want = model.apply(params, mel)
    folded = remove_weight_norm(params)
    got = model.apply(folded, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)
    # v now IS the kernel: g == ||v||
    v = np.asarray(folded["params"]["conv_pre"]["v"])
    g = np.asarray(folded["params"]["conv_pre"]["g"])
    np.testing.assert_allclose(np.sqrt((v**2).sum(axis=(0, 1))), g, rtol=1e-5)


def test_im2col_lowering_matches_direct():
    """The im2col narrow-conv lowering (one (T, k·C)·(k·C, C) matmul) must
    be a drop-in for the direct conv — values AND gradients — across the
    AMP (k, dilation) pairs, and ineligible shapes (stride>1, wide C) must
    stay on the direct path."""
    from diffbinaural_tpu import models
    from diffbinaural_tpu.models import bigvgan as bv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 96, 24)), jnp.float32)
    conv = bv.WNConv1d(24, 7, dilation=3)
    params = conv.init(jax.random.PRNGKey(0), x)

    def loss(p, xx):
        return jnp.sum(conv.apply(p, xx) ** 2)

    want = np.asarray(conv.apply(params, x))
    gw = jax.grad(loss, argnums=(0, 1))(params, x)
    try:
        bv.NARROW_CONV_LOWERING = "im2col"
        got = np.asarray(conv.apply(params, x))
        gg = jax.grad(loss, argnums=(0, 1))(params, x)
    finally:
        bv.NARROW_CONV_LOWERING = "direct"

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gw), jax.tree_util.tree_leaves(gg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
