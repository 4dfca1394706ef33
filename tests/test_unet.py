"""Stage-1 UNet tests: shapes, jit-ability, determinism, grads, quirk parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbinaural_tpu.models import AudioVisualModel, Unet
from diffbinaural_tpu.models.unet import SinusoidalPosEmb, space_to_depth


SMALL = dict(dim=16, out_dim=2, channels=2, context_dim=512)


def _make(batch=2, size=16, **kw):
    model = Unet(**{**SMALL, **kw})
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 2, size, size))
    cond = jax.random.normal(jax.random.PRNGKey(1), (batch, 1, size, size))
    feat = jax.random.normal(jax.random.PRNGKey(2), (batch, 512))
    t = jnp.array([3, 500][:batch])
    params = model.init(rng, x, t, cond, None, feat)
    return model, params, (x, t, cond, feat)


def test_output_shape_and_dtype():
    model, params, (x, t, cond, feat) = _make()
    out = model.apply(params, x, t, cond, None, feat)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_jit_and_determinism():
    model, params, (x, t, cond, feat) = _make()
    f = jax.jit(lambda p, *a: model.apply(p, *a))
    a = f(params, x, t, cond, None, feat)
    b = f(params, x, t, cond, None, feat)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mix_t_is_inert():
    """The reference UNet accepts mix_t but never reads it (unet.py:255-297)."""
    model, params, (x, t, cond, feat) = _make()
    out1 = model.apply(params, x, t, cond, None, feat)
    mix_t = jnp.ones((x.shape[0], 2) + x.shape[2:])
    out2 = model.apply(params, x, t, cond, mix_t, feat)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_grads_flow_everywhere():
    model, params, (x, t, cond, feat) = _make(batch=1, size=16)

    def loss(p):
        return jnp.mean(model.apply(p, x, t, cond, None, feat) ** 2)

    grads = jax.grad(loss)(params)
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(grads["params"])
    zero = {"/".join(k) for k, v in flat.items() if np.allclose(np.asarray(v), 0.0)}
    # With a spatially-constant visual context, cross-attention output is
    # independent of q, k, and the query-side pre-norm — their grads are
    # exactly zero (identically true in the reference: uniform softmax over
    # identical keys).  Nothing else may be silent.
    for path in zero:
        assert (
            "cross_attn/to_q" in path
            or "cross_attn/to_k" in path
            or "norm3" in path
        ), f"unexpected zero gradient at {path}"
    assert len(zero) == 6 * 5  # 6 cross-attn blocks × (q w+b, k w+b, norm3 g)

    finite = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda g: jnp.isfinite(g).all(), grads)
    )
    assert all(bool(v) for v in finite)


def test_visual_feature_conditions_output():
    model, params, (x, t, cond, feat) = _make()
    out1 = model.apply(params, x, t, cond, None, feat)
    out2 = model.apply(params, x, t, cond, None, feat + 1.0)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_time_conditions_output():
    model, params, (x, t, cond, feat) = _make()
    out1 = model.apply(params, x, t, cond, None, feat)
    out2 = model.apply(params, x, jnp.full_like(t, 999), cond, None, feat)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_audiovisual_model_contract():
    """model(x, t, condition) with condition=(mix, visual, mix_t)
    (reference audioVisual_model.py:33-39)."""
    model = AudioVisualModel(dim=16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 2, 16, 16))
    mix = jnp.zeros((2, 1, 16, 16))
    feat = jnp.zeros((2, 512))
    mix_t = jnp.zeros((2, 2, 16, 16))
    t = jnp.array([0, 999])
    params = model.init(rng, x, t, (mix, feat, mix_t))
    out = model.apply(params, x, t, (mix, feat, mix_t))
    assert out.shape == (2, 2, 16, 16)


def test_sinusoidal_pos_emb_matches_reference_formula():
    """emb = exp(arange(half) · −ln(1e4)/(half−1)); cat(sin, cos)
    (reference unet.py:104-121)."""
    dim = 64
    emb = SinusoidalPosEmb(dim)(jnp.array([7.0]))
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    want = np.concatenate([np.sin(7.0 * freqs), np.cos(7.0 * freqs)])
    np.testing.assert_allclose(np.asarray(emb[0]), want, atol=1e-6)


def test_space_to_depth_channel_order():
    """Channel order must be (c, p1, p2)-major like the reference rearrange
    'b c (h p1) (w p2) -> b (c p1 p2) h w' (unet.py:76)."""
    x = jnp.arange(2 * 2 * 1).reshape(1, 2, 2, 1).astype(jnp.float32)
    out = space_to_depth(x)
    assert out.shape == (1, 1, 1, 4)
    # NHWC input [[0,1],[2,3]] → (c=0: p1p2 order 0,1,2,3)
    np.testing.assert_array_equal(np.asarray(out[0, 0, 0]), [0, 1, 2, 3])
