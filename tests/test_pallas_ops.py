"""Fused alias-free snake kernel: parity vs the XLA composition + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbinaural_tpu.models.bigvgan import (
    downsample2_nhc,
    snake,
    upsample2_nhc,
)
from diffbinaural_tpu.ops import fused_alias_free_snake

EDGE = 4  # boundary samples where edge-handling conventions differ


def _xla_reference(x, alpha, beta, logscale=True):
    a = jnp.exp(alpha) if logscale else alpha
    b = jnp.exp(beta) if logscale else beta
    return downsample2_nhc(snake(upsample2_nhc(x), a, b))


@pytest.mark.parametrize("t", [160, 513])
def test_fused_matches_xla_interior(t):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, 128)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)

    want = np.asarray(_xla_reference(x, alpha, beta))
    got = np.asarray(fused_alias_free_snake(x, alpha, beta, True))
    assert got.shape == want.shape
    np.testing.assert_allclose(
        got[:, EDGE:-EDGE], want[:, EDGE:-EDGE], rtol=1e-5, atol=1e-5
    )
    # edges stay bounded (different but sane replicate conventions)
    np.testing.assert_allclose(got[:, :EDGE], want[:, :EDGE], atol=0.2)


def test_fused_multi_tile_seams():
    """t > t_tile exercises the halo DMA across tile seams."""
    rng = np.random.default_rng(1)
    t = 1200  # > default t_tile=512 → 3 tiles
    x = jnp.asarray(rng.standard_normal((1, t, 128)).astype(np.float32))
    alpha = jnp.zeros(128)
    beta = jnp.zeros(128)
    want = np.asarray(_xla_reference(x, alpha, beta))
    got = np.asarray(fused_alias_free_snake(x, alpha, beta, True))
    np.testing.assert_allclose(
        got[:, EDGE:-EDGE], want[:, EDGE:-EDGE], rtol=1e-5, atol=1e-5
    )


def test_fused_linear_scale_mode():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 96, 128)).astype(np.float32))
    alpha = jnp.ones(128)
    beta = jnp.ones(128)
    want = np.asarray(_xla_reference(x, alpha, beta, logscale=False))
    got = np.asarray(fused_alias_free_snake(x, alpha, beta, False))
    np.testing.assert_allclose(
        got[:, EDGE:-EDGE], want[:, EDGE:-EDGE], rtol=1e-5, atol=1e-5
    )


def test_fused_gradients_match_xla():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 64, 128)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)
    beta = jnp.zeros(128)

    def loss_fused(x_, a_, b_):
        return jnp.sum(fused_alias_free_snake(x_, a_, b_, True) ** 2)

    def loss_xla(x_, a_, b_):
        return jnp.sum(_xla_reference(x_, a_, b_) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, alpha, beta)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, alpha, beta)
    # dx: the fused backward kernel is EXACT in the interior; only the
    # dropped clip-edge replication adjoint (outer ≤8 samples) differs
    np.testing.assert_allclose(
        np.asarray(gf[0])[:, 8:-8], np.asarray(gx[0])[:, 8:-8],
        rtol=1e-4, atol=1e-4,
    )
    # dα/dβ: per-channel reductions pick up the same edge-only difference
    for a, b in zip(gf[1:], gx[1:]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)


def test_multi_tile_alpha_beta_grads():
    """α/β grads across tile seams: each lattice point must contribute
    exactly once (a halo-row double-count here escaped the single-tile
    grad test in an earlier kernel)."""
    rng = np.random.default_rng(11)
    t = 1200  # > bwd row tile → several tiles
    x = jnp.asarray(rng.standard_normal((1, t, 128)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)

    gf = jax.grad(lambda *a: jnp.sum(fused_alias_free_snake(*a, True) ** 2),
                  argnums=(1, 2))(x, alpha, beta)
    gx = jax.grad(lambda *a: jnp.sum(_xla_reference(*a) ** 2),
                  argnums=(1, 2))(x, alpha, beta)
    for a, b in zip(gf, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-3)


@pytest.mark.parametrize("c,t", [(24, 700), (48, 300), (96, 128), (48, 6144)])
def test_packed_narrow_channels_match_xla(c, t):
    """Slab-packed path (C < 128) must match the XLA composition except at
    clip edges."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    want = np.asarray(_xla_reference(x, alpha, beta))
    got = np.asarray(fused_alias_free_snake(x, alpha, beta, True))
    assert got.shape == want.shape
    np.testing.assert_allclose(
        got[:, EDGE:-EDGE], want[:, EDGE:-EDGE], rtol=1e-5, atol=1e-5
    )


def test_packed_gradients_match_xla():
    """Narrow-channel (slab-packed) backward must match the XLA grads in the
    interior too."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 200, 24)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(24).astype(np.float32) * 0.1)
    beta = jnp.zeros(24)

    gf = jax.grad(lambda *a: jnp.sum(fused_alias_free_snake(*a, True) ** 2),
                  argnums=(0, 1, 2))(x, alpha, beta)
    gx = jax.grad(lambda *a: jnp.sum(_xla_reference(*a) ** 2),
                  argnums=(0, 1, 2))(x, alpha, beta)
    np.testing.assert_allclose(
        np.asarray(gf[0])[:, 8:-8], np.asarray(gx[0])[:, 8:-8],
        rtol=1e-4, atol=1e-4,
    )
    for a, b in zip(gf[1:], gx[1:]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)


def test_padless_narrow_gradients_multi_tile():
    """Padless VPU plan, multiple backward tiles (t/R divisible, divisor
    row tile): interior dx and the α/β seam accounting must match XLA."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 5120, 24)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(24).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(24).astype(np.float32) * 0.1)

    from diffbinaural_tpu.ops import alias_free_act as afa

    g = afa._plan(x, bwd=True)
    assert g["padless"] and g["n_t"] >= 2, (g["padless"], g["n_t"])

    gf = jax.grad(lambda *a: jnp.sum(fused_alias_free_snake(*a, True) ** 2),
                  argnums=(0, 1, 2))(x, alpha, beta)
    gx = jax.grad(lambda *a: jnp.sum(_xla_reference(*a) ** 2),
                  argnums=(0, 1, 2))(x, alpha, beta)
    np.testing.assert_allclose(
        np.asarray(gf[0])[:, 8:-8], np.asarray(gx[0])[:, 8:-8],
        rtol=1e-4, atol=1e-4,
    )
    for a, b in zip(gf[1:], gx[1:]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)


def test_padless_matches_padded_plan(monkeypatch):
    """The padless plan must produce bit-identical windows to the padded
    plan (same lattice, same edge semantics) — compare the two fused paths
    directly on a shape eligible for both."""
    from diffbinaural_tpu.ops import alias_free_act as afa

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 1200, 128)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)
    assert afa._plan(x)["padless"]
    got_padless = np.asarray(fused_alias_free_snake(x, alpha, beta, True))

    monkeypatch.setattr(afa, "_divisor_tile", lambda rows, cap: 0)
    assert not afa._plan(x)["padless"]
    got_padded = np.asarray(fused_alias_free_snake(x, alpha, beta, True))
    np.testing.assert_allclose(got_padless, got_padded, rtol=1e-6, atol=1e-6)


def test_fused_bf16_inputs_close_to_fp32():
    """bf16 inputs run the banded matmuls in bf16 (fp32 accumulation) —
    forward and gradients must stay within bf16 rounding of the fp32 path."""
    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.standard_normal((1, 160, 128)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)
    x16 = x32.astype(jnp.bfloat16)

    got32 = np.asarray(fused_alias_free_snake(x32, alpha, beta, True))
    got16 = np.asarray(
        fused_alias_free_snake(x16, alpha, beta, True)
    ).astype(np.float32)
    assert got16.dtype == np.float32 and got16.shape == got32.shape
    # |x| ~ up to ~4 here; bf16 mantissa step ~0.8% relative
    np.testing.assert_allclose(got16, got32, atol=0.12, rtol=0.02)

    g32 = jax.grad(
        lambda x_: jnp.sum(fused_alias_free_snake(x_, alpha, beta, True) ** 2)
    )(x32)
    g16 = jax.grad(
        lambda x_: jnp.sum(
            fused_alias_free_snake(x_, alpha, beta, True).astype(jnp.float32)
            ** 2
        )
    )(x16)
    np.testing.assert_allclose(
        np.asarray(g16, np.float32), np.asarray(g32), atol=0.8, rtol=0.05
    )


def test_fast_sin_mode_matches_exact():
    """DIFFBINAURAL_AFA_SIN=fast (range-reduced cosine polynomial) must be
    numerically indistinguishable from the exact sine forward; 'none' is a
    diagnostic stand-in and must NOT match (guards against the polynomial
    path silently becoming a no-op)."""
    from diffbinaural_tpu.ops import alias_free_act as afa

    rng = np.random.default_rng(3)
    x = jnp.asarray(5.0 * rng.standard_normal((1, 160, 128)), jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(128) * 0.5, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(128) * 0.5, jnp.float32)

    orig = afa._SIN_IMPL
    outs = {}
    try:
        for mode in ("exact", "fast", "none"):
            afa._SIN_IMPL = mode
            outs[mode] = np.asarray(
                fused_alias_free_snake(x, alpha, beta, True)
            )
    finally:
        afa._SIN_IMPL = orig

    np.testing.assert_allclose(outs["fast"], outs["exact"],
                               rtol=1e-6, atol=1e-6)
    assert np.abs(outs["none"] - outs["exact"]).max() > 1e-3
