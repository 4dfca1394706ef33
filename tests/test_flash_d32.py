"""d≤128-specialised flash forward (ops.flash_d32) vs dense attention.

The forward kernel runs interpreted on CPU; the backward chains into the
stock flash kernels which only lower for TPU, so gradient parity is
checked on-chip by ``benchmarks/micro.py flashcheck``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbinaural_tpu.ops.flash_d32 import _fwd, flash_sdpa


def _dense(q, k, v, scale):
    s = jnp.einsum("bhid,bhjd->bhij", q * scale, k,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize("n", [256, 1600, 2048])
def test_forward_matches_dense(n):
    rng = np.random.default_rng(0)
    b, h, d = 2, 2, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        for _ in range(3)
    )
    scale = d**-0.5
    got = np.asarray(flash_sdpa(q, k, v, scale))
    want = np.asarray(_dense(q, k, v, scale))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_residuals_match_softmax_stats():
    """l/m must follow the stock flash convention (m = rowmax of scaled
    scores, l = rowsum of exp(s − m)) — the backward depends on it."""
    rng = np.random.default_rng(1)
    b, h, n, d = 1, 2, 384, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        for _ in range(3)
    )
    o, l, m = _fwd(q, k, v)
    s = np.asarray(
        jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    )
    m_want = s.max(axis=-1)
    l_want = np.exp(s - m_want[..., None]).sum(axis=-1)
    np.testing.assert_allclose(np.asarray(m), m_want, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l), l_want, rtol=1e-5, atol=1e-5)


def test_padded_length_masks_tail():
    """n = 1600 pads to 1664: pad keys must not leak into the softmax."""
    rng = np.random.default_rng(2)
    b, h, n, d = 1, 1, 1600, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        for _ in range(3)
    )
    got = np.asarray(flash_sdpa(q, k, v, d**-0.5))
    want = np.asarray(_dense(q, k, v, d**-0.5))
    assert got.shape == (b, h, n, d)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_masked_tail_with_chunked_inference_path():
    """n = 2300 pads to 2304 = 18·128 with 2304/2 % 128 == 0, so this runs
    the 2-CHUNK inference kernel with the ones-column rowsum — pad keys
    must not leak and the per-chunk rescale merge of the folded l column
    must stay exact.  (n = 2050 → n_pad = 2176 would fall back to 1 chunk:
    2176/2 = 1088 is not a multiple of 128.)"""
    from diffbinaural_tpu.ops import flash_d32 as f32mod

    rng = np.random.default_rng(3)
    b, h, n, d = 1, 2, 2300, 32
    n_pad = f32mod._round_up(n, f32mod.LANE)
    assert n_pad >= 2048 and (n_pad // 2) % f32mod.LANE == 0, (
        "test geometry no longer selects the 2-chunk path"
    )
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        for _ in range(3)
    )
    got = np.asarray(flash_sdpa(q, k, v, d**-0.5))
    want = np.asarray(_dense(q, k, v, d**-0.5))
    assert got.shape == (b, h, n, d)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
