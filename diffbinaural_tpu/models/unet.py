"""Conditional 2D UNet for binaural mel diffusion, TPU-native (flax, NHWC).

Capability-parity re-design of /root/reference/DiffBinaural/modules/unet.py
(:168-297) with the build_unet defaults (models.py:38-43: dim=64, channels=2,
out_dim=2, self_condition=True):

  * init 1×1 conv on cat(self_cond, x) — 3 input channels (:186-189, :255-258)
  * dims [64, 64, 128, 256] via dim_mults (1, 2, 4) (:191-192)
  * sinusoidal time embedding → Linear(64→256) → GELU → Linear(256→256)
    (:203-211)
  * per resolution: [ResnetBlock, AttentionBlock, Downsample] (:218-225);
    Downsample = 2×2 space-to-depth + 1×1 (:74-78); last stage uses a 3×3
    stride-1 conv instead
  * middle ResnetBlock + MiddleAttentionBlock + ResnetBlock (:230-232)
  * symmetric up path with skip concat; Upsample = nearest×2 + 3×3 (:68-72,
    :235-241)
  * final ResnetBlock on cat(x, r) + 1×1 out conv, He-normal init (:247-250)
  * ``mix_t`` is accepted by forward for API parity but — exactly like the
    reference (:255-297 never reads it) — does not influence the output.

The public ``__call__`` takes NCHW (B, 2, 80, 80) to preserve the reference
tensor contract and transposes to NHWC internally (TPU conv layout).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .attention import AttentionBlock, MiddleAttentionBlock


class SinusoidalPosEmb(nn.Module):
    """(reference unet.py:104-121; identical module in networks.py:299-311)"""

    dim: int

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freqs = np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1)))
        args = t.astype(jnp.float32)[..., None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class WeightStandardizedConv(nn.Module):
    """3×3 conv whose kernel is standardised over (kh, kw, in) per output
    channel (reference unet.py:84-97, eps 1e-5 biased variance)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, in_ch, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = ((kernel - mean) ** 2).mean(axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) * jax.lax.rsqrt(var + 1e-5)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class ResnetBlock(nn.Module):
    """GN→SiLU→WSConv→GN, FiLM(time), SiLU→Dropout→WSConv, +1×1 residual
    (reference unet.py:124-163)."""

    dim_out: int
    groups: int = 8
    dropout: float = 0.1
    time_emb_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, deterministic: bool = True):
        dim_in = x.shape[-1]
        h = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="norm_in"
        )(x)
        h = nn.silu(h)
        h = WeightStandardizedConv(self.dim_out, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="norm_mid"
        )(h)

        if self.time_emb_dim is not None and time_emb is not None:
            emb = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="emb_proj")(
                nn.silu(time_emb)
            )
            scale, shift = jnp.split(emb, 2, axis=-1)
            h = h * (scale[:, None, None, :] + 1.0) + shift[:, None, None, :]

        h = nn.silu(h)
        h = nn.Dropout(self.dropout, name="drop")(h, deterministic=deterministic)
        h = WeightStandardizedConv(self.dim_out, dtype=self.dtype, name="conv2")(h)

        if dim_in != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name="res_conv")(x)
        return h + x


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """'b (h 2) (w 2) c → b h w (c 2 2)' with channel-major ordering matching
    the reference rearrange 'b c (h p1) (w p2) -> b (c p1 p2) h w' (:76)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h/2, w/2, c, p1, p2)
    return x.reshape(b, h // 2, w // 2, c * 4)


class Downsample(nn.Module):
    """space-to-depth + 1×1 (reference unet.py:74-78)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(
            space_to_depth(x)
        )


class Upsample(nn.Module):
    """nearest ×2 + 3×3 conv (reference unet.py:68-72)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(
            self.dim_out, (3, 3), padding="SAME", dtype=self.dtype, name="conv"
        )(x)


class Unet(nn.Module):
    """The stage-1 denoiser (reference unet.py:168-297)."""

    dim: int = 64
    out_dim: int = 2
    channels: int = 2
    dim_mults: Sequence[int] = (1, 2, 4)
    self_condition: bool = True
    resnet_block_groups: int = 8
    attn_heads: int = 4
    attn_dim_head: int = 32
    context_dim: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time: jnp.ndarray,
        x_self_cond: Optional[jnp.ndarray] = None,
        mix_t: Optional[jnp.ndarray] = None,
        visual_feat: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: (B, C, H, W) NCHW; time: (B,); x_self_cond: (B, 1, H, W) mono
        mel; visual_feat: (B, context_dim).  mix_t is unused (see module
        docstring).  Returns (B, out_dim, H, W)."""
        del mix_t
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x[:, :1])
            x = jnp.concatenate([x_self_cond, x], axis=1)

        x = jnp.moveaxis(x, 1, -1).astype(self.dtype)  # NCHW → NHWC

        time_dim = self.dim * 4
        t = SinusoidalPosEmb(self.dim, name="sinu_pos_emb")(time)
        t = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp_1")(
            t.astype(self.dtype)
        )
        t = nn.gelu(t)
        t = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp_2")(t)

        x = nn.Dense(self.dim, dtype=self.dtype, name="init_conv")(x)
        r = x

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_resolutions = len(in_out)

        hs = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_resolutions - 1
            x = ResnetBlock(
                dim_in, groups=self.resnet_block_groups, dropout=self.dropout,
                time_emb_dim=time_dim, dtype=self.dtype, name=f"down_{i}_res",
            )(x, t, deterministic)
            x = AttentionBlock(
                dim_in, heads=self.attn_heads, dim_head=self.attn_dim_head,
                context_dim=self.context_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, name=f"down_{i}_attn",
            )(x, context=visual_feat, time_emb=t, deterministic=deterministic)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=self.dtype, name=f"down_{i}_down")(x)
            else:
                x = nn.Conv(
                    dim_out, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"down_{i}_down",
                )(x)

        mid_dim = dims[-1]
        x = ResnetBlock(
            mid_dim, groups=self.resnet_block_groups, dropout=self.dropout,
            time_emb_dim=time_dim, dtype=self.dtype, name="mid_res1",
        )(x, t, deterministic)
        x = MiddleAttentionBlock(
            mid_dim, heads=self.attn_heads, dim_head=self.attn_dim_head,
            groups=self.resnet_block_groups, dtype=self.dtype, name="mid_attn",
        )(x, time_emb=t, deterministic=deterministic)
        x = ResnetBlock(
            mid_dim, groups=self.resnet_block_groups, dropout=self.dropout,
            time_emb_dim=time_dim, dtype=self.dtype, name="mid_res2",
        )(x, t, deterministic)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(
                dim_out, groups=self.resnet_block_groups, dropout=self.dropout,
                time_emb_dim=time_dim, dtype=self.dtype, name=f"up_{i}_res",
            )(x, t, deterministic)
            x = AttentionBlock(
                dim_out, heads=self.attn_heads, dim_head=self.attn_dim_head,
                context_dim=self.context_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, name=f"up_{i}_attn",
            )(x, context=visual_feat, time_emb=t, deterministic=deterministic)
            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype, name=f"up_{i}_up")(x)
            else:
                x = nn.Conv(
                    dim_in, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"up_{i}_up",
                )(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(
            self.dim, groups=self.resnet_block_groups, dropout=self.dropout,
            time_emb_dim=time_dim, dtype=self.dtype, name="final_res",
        )(x, t, deterministic)
        x = nn.Dense(
            self.out_dim,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
            name="final_conv",
        )(x)
        return jnp.moveaxis(x, -1, 1).astype(jnp.float32)  # NHWC → NCHW


class AudioVisualModel(nn.Module):
    """Wrapper matching the reference call contract
    (/root/reference/DiffBinaural/modules/audioVisual_model.py:33-39):
    ``model(x, t, condition)`` with condition = (mix, visual_feature, mix_t).

    The reference also owns a duplicate time-MLP that is never called
    (:24-31); we do not materialise those dead parameters.
    """

    dim: int = 64
    input_nc: int = 2
    output_nc: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, condition, deterministic: bool = True):
        mix, visual_feature, mix_t = condition
        return Unet(
            dim=self.dim,
            out_dim=self.output_nc,
            channels=self.input_nc,
            self_condition=True,
            dropout=self.dropout,
            dtype=self.dtype,
            name="net_unet",
        )(
            x, t, x_self_cond=mix, mix_t=mix_t, visual_feat=visual_feature,
            deterministic=deterministic,
        )
