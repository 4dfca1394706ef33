"""Fused snake→conv kernel (ops.snake_conv): parity vs the XLA composition
(alias-free snake activation then zero-padded dilated conv), gradients via
the recompute VJP, and the model-level fused AMP path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbinaural_tpu.models.bigvgan import (
    downsample2_nhc,
    snake,
    upsample2_nhc,
)
from diffbinaural_tpu.ops.snake_conv import fused_snake_conv, _plan


def _xla_reference(x, alpha, beta, kernel, bias, dilation, logscale=True):
    a = jnp.exp(alpha) if logscale else alpha
    b = jnp.exp(beta) if logscale else beta
    z = downsample2_nhc(snake(upsample2_nhc(x), a, b))
    pad = (kernel.shape[0] - 1) // 2 * dilation
    y = jax.lax.conv_general_dilated(
        z, kernel, window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + bias


def _world(c, t, k, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    kernel = jnp.asarray(
        (rng.standard_normal((k, c, c)) * 0.02).astype(np.float32)
    )
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    return x, alpha, beta, kernel, bias


@pytest.mark.parametrize(
    "c,t,k,d",
    [
        (128, 192, 3, 1),    # single tile, single co chunk
        (256, 512, 3, 5),    # padless 2 tiles, 2 co chunks, dilated
        (128, 500, 7, 3),    # padded fallback (500 has no divisor tile)
    ],
)
def test_fused_snake_conv_matches_xla(c, t, k, d):
    x, alpha, beta, kernel, bias = _world(c, t, k)
    want = np.asarray(_xla_reference(x, alpha, beta, kernel, bias, d))
    got = np.asarray(
        fused_snake_conv(x, alpha, beta, kernel, bias, dilation=d)
    )
    assert got.shape == want.shape
    # the act's clip-edge convention differs from the XLA composition in
    # the outer ≤3 samples; the conv mixes that over its own reach
    m = (k - 1) // 2 * d + 8
    np.testing.assert_allclose(
        got[:, m:-m], want[:, m:-m], rtol=2e-4, atol=2e-4
    )
    # conv zero padding itself must be exact: the output at the clip edge
    # only differs through the act's edge samples, so it stays bounded
    np.testing.assert_allclose(got[:, :m], want[:, :m], atol=0.5)


def test_plan_modes():
    x512 = jnp.zeros((1, 512, 256))
    assert _plan(x512, 3, 1)["padless"]
    x500 = jnp.zeros((1, 500, 128))
    assert not _plan(x500, 7, 3)["padless"]


def test_fused_snake_conv_gradients():
    c, t, k, d = 128, 256, 3, 3
    x, alpha, beta, kernel, bias = _world(c, t, k, seed=3)

    def loss_f(*a):
        return jnp.sum(fused_snake_conv(*a, dilation=d) ** 2)

    def loss_x(*a):
        return jnp.sum(_xla_reference(*a, d) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(
        x, alpha, beta, kernel, bias
    )
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(
        x, alpha, beta, kernel, bias
    )
    # dx interior (the act VJP drops the ≤8-sample edge-replication adjoint)
    np.testing.assert_allclose(
        np.asarray(gf[0])[:, 16:-16], np.asarray(gx[0])[:, 16:-16],
        rtol=2e-3, atol=2e-3,
    )
    for a, b in zip(gf[1:], gx[1:]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)


def test_fused_snake_conv_bf16_close_to_fp32():
    """bf16 inputs run the lattice + conv matmuls in bf16 (fp32 accum);
    output must stay within bf16 rounding of the fp32 path."""
    c, t, k, d = 128, 256, 3, 1
    x, alpha, beta, kernel, bias = _world(c, t, k, seed=7)
    got32 = np.asarray(
        fused_snake_conv(x, alpha, beta, kernel, bias, dilation=d)
    )
    got16 = np.asarray(
        fused_snake_conv(
            x.astype(jnp.bfloat16), alpha, beta,
            kernel.astype(jnp.bfloat16), bias, dilation=d,
        )
    ).astype(np.float32)
    scale = np.abs(got32).max() + 1e-6
    np.testing.assert_allclose(got16 / scale, got32 / scale, atol=0.04)


def test_amp_block_fused_matches_unfused(monkeypatch):
    """Model-level: AMPBlock1 with the fused gate forced on must match the
    unfused composition on identical params (interior tolerance)."""
    from diffbinaural_tpu.models import bigvgan as bv

    block = bv.AMPBlock1(channels=128, kernel_size=3, dilation=(1, 3))
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 300, 128))
        .astype(np.float32)
    )
    params = block.init(jax.random.PRNGKey(0), x)
    want = np.asarray(block.apply(params, x))

    monkeypatch.setattr(bv, "_snake_conv_fusable", lambda *_: True)
    got = np.asarray(block.apply(params, x))
    np.testing.assert_allclose(got[:, 24:-24], want[:, 24:-24],
                               rtol=2e-4, atol=2e-4)
    assert np.isfinite(got).all()