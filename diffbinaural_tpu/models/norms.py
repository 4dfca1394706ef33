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


class PreNorm(nn.Module):
    """LayerNorm-then-fn wrapper (reference norms.py:61-68; defined upstream
    but unused by the shipped models — kept for inventory parity)."""

    fn: nn.Module
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, **kwargs):
        return self.fn(ChannelLayerNorm(dtype=self.dtype, name="norm")(x),
                       **kwargs)


class BatchNorm(nn.Module):
    """Hand-rolled batch norm over (B, H, W) per channel (reference
    norms.py:19-46 — unused by the shipped models; running stats carried in
    the 'batch_stats' collection the flax way)."""

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=(0, 1, 2))
            var = ((xf - mean) ** 2).mean(axis=(0, 1, 2))
            if not self.is_initializing():
                ra_mean.value = self.momentum * mean + (1 - self.momentum) * ra_mean.value
                ra_var.value = self.momentum * var + (1 - self.momentum) * ra_var.value
        out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (out * gamma + beta).astype(self.dtype)


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
