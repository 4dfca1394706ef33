"""Attention stack for the stage-1 UNet, TPU-native (flax.linen, NHWC).

Capability-parity re-design of the reference attention modules
(/root/reference/DiffBinaural/modules/attention.py):

  * ``Attention``            — full softmax self-attention over the H×W grid
                               with optional FiLM time modulation (:204-237)
  * ``LinearAttention``      — softmax-normalised linear attention with
                               frequency-axis / time-axis windowing (:108-171)
  * ``LinearAttentionBlock`` — parallel f-axis + t-axis branches, concat+1×1
                               (:174-201)
  * ``CrossAttention``       — attention to the (B, 512) visual context
                               (:241-290).  The reference broadcasts the
                               context to (B, 512, H, W) before conv-k/v; the
                               broadcast keys are spatially identical, so the
                               softmax is uniform and the output reduces
                               EXACTLY to the value projection of the single
                               context token — we therefore treat the context
                               as one token, which is both faithful and O(n)
                               instead of O(n²).
  * ``MaskedAttention``      — token attention with key-padding mask used by
                               the visual encoders (:65-104)
  * ``FeedForward``/``GEGLU``(:36-63), ``UnifiedAttention`` (:293-311),
    ``AttentionBlock`` (:314-342), ``MiddleUnifiedAttention`` /
    ``MiddleAttentionBlock`` (:345-388)

All modules take/return NHWC; the UNet transposes NCHW→NHWC once at entry.
Parameters are float32; `dtype` selects the computation precision (bf16 on
TPU keeps the MXU busy, softmax/normalisation stats stay fp32).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .norms import ChannelLayerNorm


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B, N, H*D) → (B, H, N, D), head-major channel layout."""
    b, n, hd = x.shape
    return x.reshape(b, n, heads, hd // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, N, D) → (B, N, H*D), head-major (matches 'b (h d) x y')."""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class TimeFiLM(nn.Module):
    """SiLU → Linear(time_dim → dim*2) scale/shift on channels.

    Matches the mlp inside reference Attention/LinearAttention (:124-127,
    :213-216): x * (scale + 1) + shift.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_emb: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Dense(self.dim * 2, dtype=self.dtype, name="to_scale_shift")(
            nn.silu(time_emb)
        )
        scale, shift = jnp.split(emb, 2, axis=-1)
        broadcast = (slice(None),) + (None,) * (x.ndim - 2)
        return x * (scale[broadcast] + 1.0) + shift[broadcast]


def _flash_eligible(n: int) -> bool:
    """Flash kernel gate: TPU execution + long-enough sequences.

    Respects ``jax.default_device(cpu)`` contexts (used to init params on
    host) — the flash kernel only lowers for TPU.  Non-128-divisible
    lengths are handled by segment-id padding in _sdpa."""
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return platform == "tpu" and n >= 1024


def _sdpa(q, k, v, scale: float):
    """Scaled dot-product attention over (B, H, N, D) tokens.

    On TPU with long sequences this lowers to the d≤128-specialised
    single-pass Pallas kernel (ops.flash_d32): it never materialises the
    N×N score matrix — at the UNet's 80×80 = 6400 tokens the dense f32
    scores are 164 MB per (batch, head) and dominate the whole model's
    runtime — and, with K/V fully VMEM-resident at d=32, it also drops the
    generic flash kernel's online-softmax rescales, segment-id masking and
    pad-to-512 waste (6400 is exactly 50·128): measured 5.96 → 4.8 ms per
    b=8 h=4 call on v5e (UNet step 19.5 → 17.0 ms), near the d=32 MXU
    pass-count floor ≈3.4 ms.  Gradients chain into the stock flash backward
    kernels via the (l, m) residuals.  Elsewhere: the dense einsum.
    """
    n = q.shape[2]
    if _flash_eligible(n):
        from ..ops.flash_d32 import flash_sdpa

        # bf16 q/k/v pass straight through (the kernel accumulates fp32);
        # other dtypes upcast for stability
        dt = v.dtype if v.dtype == jnp.bfloat16 else jnp.float32
        out = flash_sdpa(
            q.astype(dt), k.astype(dt), v.astype(dt), scale
        )
        return out.astype(v.dtype)
    sim = jnp.einsum(
        "bhid,bhjd->bhij", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


class Attention(nn.Module):
    """Full softmax self-attention over spatial tokens (reference :204-237)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    use_time_film: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_emb=None) -> jnp.ndarray:
        b, h, w, c = x.shape
        if self.use_time_film and time_emb is not None:
            x = TimeFiLM(self.dim, dtype=self.dtype, name="time_film")(x, time_emb)

        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(
            x.reshape(b, h * w, c)
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.heads)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)

        out = _sdpa(q, k, v, self.dim_head**-0.5)
        out = _merge_heads(out)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, self.dim)


class LinearAttention(nn.Module):
    """Windowed linear attention (reference :108-171).

    ``f_window`` batches the last spatial axis into blocks of that size;
    ``t_window`` batches the first spatial axis.  Inside a window:
    q softmaxed over the feature axis, k over the token axis, v scaled by
    1/n_tokens; out = (kᵀv)ᵀ q — two small matmuls on the MXU.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    f_window: Optional[int] = None
    t_window: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_emb=None) -> jnp.ndarray:
        b0, t, f, c = x.shape

        if self.f_window:
            nw = f // self.f_window
            # (B, T, nw, win, C) → (B·nw, T, win, C)   ['b c t (x y) -> (b x) c t y']
            x = x.reshape(b0, t, nw, self.f_window, c)
            x = x.transpose(0, 2, 1, 3, 4).reshape(b0 * nw, t, self.f_window, c)
        elif self.t_window:
            nw = t // self.t_window
            x = x.reshape(b0, nw, self.t_window, f, c).reshape(
                b0 * nw, self.t_window, f, c
            )

        b, hh, ww, _ = x.shape
        n = hh * ww
        hidden = self.heads * self.dim_head

        qkv = nn.Dense(hidden * 3, dtype=self.dtype, name="to_qkv")(
            x.reshape(b, n, c)
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.heads)  # (b, h, n, d)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)

        q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(v.dtype)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-2).astype(v.dtype)
        q = q * (self.dim_head**-0.5)
        v = v / n

        context = jnp.einsum(
            "bhnd,bhne->bhde", k, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)
        out = jnp.einsum("bhde,bhnd->bhne", context, q)
        out = _merge_heads(out)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = ChannelLayerNorm(dtype=self.dtype, name="out_norm")(out)
        out = out.reshape(b, hh, ww, self.dim)

        if self.f_window:
            nw = f // self.f_window
            out = out.reshape(b0, nw, t, self.f_window, self.dim)
            out = out.transpose(0, 2, 1, 3, 4).reshape(b0, t, f, self.dim)
        elif self.t_window:
            nw = t // self.t_window
            out = out.reshape(b0, nw, self.t_window, f, self.dim).reshape(
                b0, t, f, self.dim
            )
        return out


class LinearAttentionBlock(nn.Module):
    """f-axis + t-axis linear attention, concat + 1×1 (reference :174-201)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    resolution: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f_out = LinearAttention(
            self.dim, self.heads, self.dim_head, f_window=self.resolution,
            dtype=self.dtype, name="f_attn",
        )(x)
        t_out = LinearAttention(
            self.dim, self.heads, self.dim_head, t_window=self.resolution,
            dtype=self.dtype, name="t_attn",
        )(x)
        combined = jnp.concatenate([f_out, t_out], axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="conv_out")(combined)


class CrossAttention(nn.Module):
    """Cross-attention to context tokens (reference :241-290).

    ``context``: (B, N_ctx, C_ctx).  The UNet passes the single (B, 512)
    visual feature as one token — exactly equivalent to the reference's
    spatial broadcast (uniform softmax over identical keys).
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        if context is None:
            context = x.reshape(b, h * w, c)

        q = nn.Dense(inner, dtype=self.dtype, name="to_q")(x.reshape(b, h * w, c))
        k = nn.Dense(inner, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, dtype=self.dtype, name="to_v")(context)

        q = _split_heads(q, self.heads) * (self.dim_head**-0.5)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)

        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        if mask is not None:
            # mask: (B, N_ctx) with True = keep (reference masked_fill(~mask))
            sim = jnp.where(mask[:, None, None, :], sim, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = _merge_heads(out)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, self.query_dim)


class MaskedAttention(nn.Module):
    """Token self-attention with key-padding mask (reference :65-104).

    x: (B, N, C);  mask: (B, N) with True = VALID key (the reference fills
    ``~mask`` positions with -inf).  Used by the visual encoders over ≤4
    sound-source tokens.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)

        q = _split_heads(q, self.heads) * (self.dim_head**-0.5)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)

        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        if mask is not None:
            sim = jnp.where(mask[:, None, None, :], sim, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = _merge_heads(out)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, name="out_drop")(
            out, deterministic=deterministic
        )


class GEGLU(nn.Module):
    """(reference :36-43)"""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x, gate = jnp.split(
            nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x), 2, axis=-1
        )
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    """1×1-conv MLP, gated by default (reference :46-63)."""

    dim: int
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.mult)
        if self.glu:
            h = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        else:
            h = nn.gelu(nn.Dense(inner, dtype=self.dtype, name="proj_in")(x))
        h = nn.Dropout(self.dropout, name="drop")(h, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class UnifiedAttention(nn.Module):
    """self → windowed-linear → cross → FF, each pre-LayerNorm residual
    (reference :293-311)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    context_dim: Optional[int] = None
    resolution: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, time_emb=None, deterministic: bool = True):
        norm = lambda name: ChannelLayerNorm(dtype=self.dtype, name=name)
        x = Attention(
            self.dim, self.heads, self.dim_head, use_time_film=True,
            dtype=self.dtype, name="self_attn",
        )(norm("norm1")(x), time_emb) + x
        x = LinearAttentionBlock(
            self.dim, self.heads, self.dim_head, resolution=self.resolution,
            dtype=self.dtype, name="linear_attn",
        )(norm("norm2")(x)) + x
        x = CrossAttention(
            self.dim, context_dim=self.context_dim, heads=self.heads,
            dim_head=self.dim_head, dtype=self.dtype, name="cross_attn",
        )(norm("norm3")(x), context=context) + x
        x = FeedForward(
            self.dim, glu=True, dropout=self.dropout, dtype=self.dtype, name="ff"
        )(norm("norm4")(x), deterministic=deterministic) + x
        return x


class AttentionBlock(nn.Module):
    """GroupNorm → 1×1 → UnifiedAttention → 1×1 + residual (reference :314-342)."""

    in_channels: int
    heads: int = 4
    dim_head: int = 32
    context_dim: Optional[int] = None
    groups: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, time_emb=None, deterministic: bool = True):
        x_in = x
        x = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="gnorm"
        )(x)
        x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_in")(x)
        # context (B, C_ctx) → one token (B, 1, C_ctx); equivalent to the
        # reference's spatial broadcast (:334) — see class docstring.
        if context is not None and context.ndim == 2:
            context = context[:, None, :]
        x = UnifiedAttention(
            self.in_channels, self.heads, self.dim_head,
            context_dim=self.context_dim, dropout=self.dropout,
            dtype=self.dtype, name="transformer",
        )(x, context=context, time_emb=time_emb, deterministic=deterministic)
        x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out")(x)
        return x + x_in


class MiddleUnifiedAttention(nn.Module):
    """two self-attns + FF, no cross (reference :345-360)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, deterministic: bool = True):
        norm = lambda name: ChannelLayerNorm(dtype=self.dtype, name=name)
        x = Attention(
            self.dim, self.heads, self.dim_head, use_time_film=True,
            dtype=self.dtype, name="self_attn1",
        )(norm("norm1")(x), time_emb) + x
        x = Attention(
            self.dim, self.heads, self.dim_head, dtype=self.dtype, name="self_attn2"
        )(norm("norm2")(x)) + x
        x = FeedForward(
            self.dim, glu=True, dropout=self.dropout, dtype=self.dtype, name="ff"
        )(norm("norm3")(x), deterministic=deterministic) + x
        return x


class MiddleAttentionBlock(nn.Module):
    """(reference :362-388)"""

    in_channels: int
    heads: int = 4
    dim_head: int = 32
    groups: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, deterministic: bool = True):
        x_in = x
        x = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="gnorm"
        )(x)
        x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_in")(x)
        x = MiddleUnifiedAttention(
            self.in_channels, self.heads, self.dim_head, dropout=self.dropout,
            dtype=self.dtype, name="transformer",
        )(x, time_emb=time_emb, deterministic=deterministic)
        x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out")(x)
        return x + x_in
