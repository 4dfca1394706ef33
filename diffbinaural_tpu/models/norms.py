"""Normalisation layers for NHWC feature maps.

Re-design of /root/reference/DiffBinaural/modules/norms.py for channels-last:
the reference normalises over the channel dim of NCHW tensors with a
gain-only affine; here the channel dim is the last axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class ChannelLayerNorm(nn.Module):
    """Gain-only LayerNorm over channels, biased variance, eps 1e-5
    (reference norms.py:49-58)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (out * g).astype(self.dtype)


class ChannelRMSNorm(nn.Module):
    """L2-normalise channels × g × sqrt(C) (reference norms.py:10-16)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (c,))
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt((xf**2).sum(axis=-1, keepdims=True))
        out = xf / jnp.maximum(norm, 1e-12) * g * (c**0.5)
        return out.astype(self.dtype)
