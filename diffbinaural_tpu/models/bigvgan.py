"""BigVGAN-style vocoder generator, TPU-native (flax, channels-last).

Capability-parity re-design of /root/reference/BigVGAN/bigvgan.py (:31-401)
+ activations.py (:9-126) + alias_free_activation/{act,filter,resample}.py:

  * 7-tap weight-norm conv_pre 80→1536 (:286-288)
  * 6 ConvTranspose1d upsample stages rates (4,4,2,2,2,2), kernels
    (8,8,4,4,4,4), channels halving each stage (:300-317)
  * per stage, 3 AMPBlock1s (kernels 3/7/11, dilations 1/3/5) averaged
    (:319-328, :365-376); AMPBlock2 variant (:150-241)
  * anti-aliased Snake/SnakeBeta activations: 2× kaiser-sinc upsample →
    snake → 2× low-pass downsample (act.py:8-30) — the reference's only
    native-kernel target; here an XLA polyphase path with an optional fused
    Pallas kernel (ops.alias_free_act)
  * activation_post + 7-tap conv to 1 channel, tanh or clamp final
    (:330-386)

Layout: audio/features are (B, T, C) channels-last internally — C rides the
TPU lane dimension and the 1D convs hit the MXU as (T×C)·(C×C') matmuls.
The public API keeps the reference's (B, num_mels, T) → (B, 1, T·256)
contract.

Weight norm is parametrised directly (v, g) with g initialised to ‖v‖ so the
initial kernel equals v, matching torch.nn.utils.weight_norm semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..core.config import VocoderConfig
from ..signal.filters import kaiser_sinc_filter1d


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


# ---------------------------------------------------------------------------
# weight-normalised convolutions (channels-last)
# ---------------------------------------------------------------------------


def _normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


# Narrow-channel conv lowering: "direct" = lax.conv_general_dilated;
# "im2col" = the k time-shifted views concatenated on lanes → ONE
# (T, k·C)·(k·C, C_out) matmul, lifting the MXU contraction depth from
# C ≤ 192 to k·C.  "auto" (default) picks the measured per-shape winner
# (v5e, micro.py convnarrow 2026-08-19): im2col wins every k=3 stage
# (0.49 vs 0.67 ms @ C=192 … 0.72 vs 1.27 @ C=24) and the C=24 k=7
# stage (0.89 vs 1.07); direct wins k=7/k=11 at C ≥ 48, where XLA's
# conv already reaches a deeper effective contraction than the k×C
# im2col and skips its k× HBM blowup of the input.
NARROW_CONV_LOWERING = "auto"
_NARROW_C_MAX = 192  # direct conv already fills the lanes at C ≥ 256


def _im2col_wins(cin: int, k: int) -> bool:
    """Measured-winner table for NARROW_CONV_LOWERING == "auto"."""
    return k == 3 or (k == 7 and cin <= 24)


def im2col_conv1d(x, kernel, dilation: int, pad: int):
    """SAME-padded dilated Conv1d on (B, T, C) as a single matmul."""
    k, c, co = kernel.shape
    t = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    cols = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(xp, j * dilation, t, axis=1)
         for j in range(k)],
        axis=-1,
    )  # tap-major lanes — matches kernel.reshape(k·C, co) row order
    return jax.lax.dot_general(
        cols, kernel.reshape(k * c, co),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


class WNConv1d(nn.Module):
    """weight_norm(Conv1d) on (B, T, C).  Kernel (k, in, out); the norm is
    taken over (k, in) per output channel (torch weight_norm dim=0)."""

    features: int
    kernel_size: int
    dilation: int = 1
    stride: int = 1
    use_bias: bool = True
    init_std: Optional[float] = None  # None → lecun_normal (torch default-ish)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, snake=None) -> jnp.ndarray:
        """snake=(raw_alpha, raw_beta, logscale): fuse the anti-aliased
        snake activation INTO this convolution via ops.snake_conv (the
        caller passes the raw per-channel parameters of the preceding
        Activation1d instead of applying it)."""
        k, cin = self.kernel_size, x.shape[-1]
        kernel_init = (
            _normal_init(self.init_std)
            if self.init_std is not None
            else nn.initializers.lecun_normal()
        )
        v = self.param("v", kernel_init, (k, cin, self.features))
        g = self.param(
            "g", lambda _key: jnp.sqrt((v**2).sum(axis=(0, 1))),
        )
        norm = jnp.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        kernel = v * (g[None, None, :] / jnp.maximum(norm, 1e-12))

        if snake is not None:
            from ..ops.snake_conv import fused_snake_conv

            alpha, beta, logscale = snake
            b = (
                self.param("b", nn.initializers.zeros, (self.features,))
                if self.use_bias
                else jnp.zeros((self.features,), jnp.float32)
            )
            return fused_snake_conv(
                x, alpha, beta, kernel.astype(self.dtype), b,
                dilation=self.dilation, logscale=logscale,
            )

        pad = get_padding(self.kernel_size, self.dilation)
        if (
            NARROW_CONV_LOWERING != "direct"
            and (
                NARROW_CONV_LOWERING == "im2col" or _im2col_wins(cin, k)
            )
            and cin <= _NARROW_C_MAX
            and self.stride == 1
            and k > 1
            and 2 * pad == (k - 1) * self.dilation  # exact SAME padding
        ):
            y = im2col_conv1d(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.dilation, pad,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(self.stride,),
                padding=((pad, pad),),
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


def polyphase_conv_transpose(x, w, u: int):
    """ConvTranspose1d(stride=u, padding=(k−u)//2) on (B, T, C_in) as a
    POLYPHASE stride-1 convolution.  ``w``: (k, out, in), the
    WNConvTranspose1d layout; requires u | k and (k − u) even (all
    production stages: k = 2u) — odd k − u produces t·u + 1 output samples
    in the torch semantics, which the t·u crop below would truncate.

    The naive lhs-dilated lowering makes XLA contract over the u−1
    inserted zeros between every input sample — u× wasted MXU work (4× on
    the rate-4 stages); this form hits the FLOP minimum t·k·C_in·C_out and
    keeps the contraction dense.  Derivation: with j = u·q + r,
    τ = j − u·m = u·a + r, so y[u·q + r] = Σ_a x[q − a] · w[u·a + r] — a
    plain causal conv per phase r, batched over r by stacking output
    channels and interleaving by reshape."""
    k, out, cin = w.shape
    u = int(u)
    if k % u != 0 or (k - u) % 2 != 0:
        raise ValueError(f"polyphase_conv_transpose: need u | k and even "
                         f"k-u, got k={k} u={u}")
    c = k // u  # taps per phase
    p = (k - u) // 2
    t = x.shape[1]
    # (k, out, in) → (c, u, out, in) → (c, in, u·out); tap a of the stacked
    # kernel's column r·out+o is w[u·a + r, o, :].  Flip a so
    # conv-with-left-pad computes Σ_a K[a]·x[q−a].
    kern = w.reshape(c, u, out, cin).transpose(0, 3, 1, 2)
    kern = kern.reshape(c, cin, u * out)[::-1]
    y = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), window_strides=(1,),
        padding=((c - 1, c - 1),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (B, t + c − 1, u·out): phase r of output step q in column block r
    y = y.reshape(y.shape[0], (t + c - 1) * u, out)
    return y[:, p : p + t * u]


class WNConvTranspose1d(nn.Module):
    """weight_norm(ConvTranspose1d(k, stride=u, padding=(k-u)//2)) on
    (B, T, C) → (B, T·u, C') (reference :300-317).

    Lowered via :func:`polyphase_conv_transpose` when eligible (all
    production stages), else the lhs-dilated XLA form."""

    features: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, u, cin = self.kernel_size, self.stride, x.shape[-1]
        # torch ConvTranspose1d weight: (in, out, k); norm over (out, k) per
        # *input* channel (dim=0).  Our v: (k, out, in) with norm over (k, out).
        v = self.param("v", _normal_init(0.01), (k, self.features, cin))
        g = self.param("g", lambda _key: jnp.sqrt((v**2).sum(axis=(0, 1))))
        norm = jnp.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        w = v * (g[None, None, :] / jnp.maximum(norm, 1e-12))  # (k, out, in)

        p = (k - u) // 2
        b = self.param("b", nn.initializers.zeros, (self.features,))
        # Measured per-stage winners (v5e, micro.py convt 2026-08-19): the
        # polyphase form wins the wide u=4 stages (0.71 vs 1.07 ms,
        # 0.72 vs 0.96) but LOSES every narrow u=2 stage (e.g. 1.36 vs
        # 0.80 ms at 48→24) — at small C the u× lane-width gain of the
        # phase reshape no longer pays for the extra reshape/slice work.
        if k % u == 0 and (k - u) % 2 == 0 and u >= 4:
            y = polyphase_conv_transpose(
                x.astype(self.dtype), w.astype(self.dtype), u
            )
        else:
            # conv_transpose(x, w, stride=u, padding=p) ==
            #   conv(dilate(x, u), flip_k(w)^{in↔out}, padding=(k-1-p, k-1-p))
            kernel = jnp.flip(w, axis=0).transpose(0, 2, 1)  # (k, in, out)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1,),
                padding=((k - 1 - p, k - 1 - p),),
                lhs_dilation=(u,),
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        return y + b.astype(self.dtype)


# ---------------------------------------------------------------------------
# snake activations (reference activations.py)
# ---------------------------------------------------------------------------


def snake(x, alpha, beta, eps: float = 1e-9):
    """x + 1/β · sin²(αx), per-channel α/β on the last axis."""
    return x + (1.0 / (beta + eps)) * jnp.sin(x * alpha) ** 2


class Snake(nn.Module):
    """α-only snake (reference activations.py:9-62): β ≡ α.

    Calling with ``x=None`` returns the RAW (α, β) parameter pair — used by
    Activation1d's fused Pallas path, which applies the log-scale itself.
    """

    channels: int
    alpha_logscale: bool = False

    @nn.compact
    def __call__(self, x=None):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if x is None:
            return alpha, alpha
        a = jnp.exp(alpha) if self.alpha_logscale else alpha
        return snake(x, a, a)


class SnakeBeta(nn.Module):
    """separate α (frequency) and β (magnitude) (reference :65-126).

    ``x=None`` returns the raw (α, β) pair (see Snake)."""

    channels: int
    alpha_logscale: bool = False

    @nn.compact
    def __call__(self, x=None):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = self.param("beta", init, (self.channels,))
        if x is None:
            return alpha, beta
        if self.alpha_logscale:
            return snake(x, jnp.exp(alpha), jnp.exp(beta))
        return snake(x, alpha, beta)


# ---------------------------------------------------------------------------
# anti-aliased activation: 2× up-FIR → snake → 2× down-FIR
# ---------------------------------------------------------------------------


def _depthwise_fir_nhc(x, taps, stride=1, lhs_dilation=1, padding=((0, 0),)):
    """Depthwise FIR over (B, T, C) with shared taps (k,)."""
    c = x.shape[-1]
    rhs = jnp.broadcast_to(
        jnp.asarray(taps, jnp.float32)[:, None, None], (len(taps), 1, c)
    )
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(stride,),
        padding=padding,
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def upsample2_nhc(x: jnp.ndarray, ratio: int = 2, kernel_size: int = 12):
    """ratio× kaiser-sinc upsample on (B, T, C) (reference resample.py:10-38)."""
    taps = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = ratio * _depthwise_fir_nhc(
        x, taps[::-1], lhs_dilation=ratio,
        padding=((kernel_size - 1, kernel_size - 1),),
    )
    return y[:, pad_left : y.shape[1] - pad_right]


def downsample2_nhc(x: jnp.ndarray, ratio: int = 2, kernel_size: int = 12):
    """ratio× anti-aliased downsample on (B, T, C) (reference resample.py:41-58)."""
    taps = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise_fir_nhc(x, taps, stride=ratio)


class Activation1d(nn.Module):
    """2× up-FIR → snake(β) → 2× down-FIR (reference act.py:8-30).

    This is the reference's fused-CUDA-kernel target (the upstream NVIDIA
    CUDA Activation1d).  The default path composes three XLA ops; the fused
    Pallas TPU kernel lives in ops.alias_free_act and is wired in by the
    inference path where shapes are static.
    """

    channels: int
    activation: str = "snakebeta"  # 'snake' | 'snakebeta'
    alpha_logscale: bool = True
    up_ratio: int = 2
    down_ratio: int = 2
    up_kernel_size: int = 12
    down_kernel_size: int = 12
    # Pallas fused path (ops.alias_free_act): amortized-measured 6× faster
    # than the XLA composition on v5e (1.1 ms vs 6.5 ms at T=16384, C=768;
    # sync-floor-corrected).  Narrow tail stages run lane-padded.
    use_fused: bool = True

    @nn.compact
    def __call__(self, x=None):
        """``x=None`` creates the act parameters and returns the raw
        (alpha, beta) pair — used by the fused snake→conv path, which
        applies the activation inside the convolution kernel."""
        act_cls = SnakeBeta if self.activation == "snakebeta" else Snake
        act = act_cls(self.channels, self.alpha_logscale, name="act")
        if x is None:
            return act(None)
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        fusable = (
            self.use_fused
            and platform == "tpu"
            and self.up_ratio == self.down_ratio == 2
            and self.up_kernel_size == self.down_kernel_size == 12
        )
        if fusable:
            from ..ops.alias_free_act import fused_alias_free_snake

            alpha, beta = act(None)  # raw params; fused op applies logscale
            return fused_alias_free_snake(
                x, alpha, beta, self.alpha_logscale
            )
        x32 = x.astype(jnp.float32)
        up = upsample2_nhc(x32, self.up_ratio, self.up_kernel_size)
        mid = act(up)
        return downsample2_nhc(mid, self.down_ratio, self.down_kernel_size).astype(
            x.dtype
        )


# ---------------------------------------------------------------------------
# AMP blocks (reference bigvgan.py:31-241)
# ---------------------------------------------------------------------------


def _snake_conv_fusable(channels: int, kernel_size: int) -> bool:
    """Gate for the fused snake→conv kernel: TPU platform (respecting a
    CPU default_device, like the other Pallas gates) + full-lane square
    channels (ops.snake_conv handles the 768/384-channel AMP stages) +
    the measured-winner set: on v5e (micro.py snakeconv 2026-08-19) the
    fused kernel beat act-kernel + XLA conv only at C=768, k ≤ 7
    (1.49 vs 1.84 ms @ k=3, 1.72 vs 1.84 @ k=7); at C=384 and at k=11
    the unfused pair won, so those stages stay unfused."""
    from ..ops.snake_conv import snake_conv_eligible

    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return (
        platform == "tpu"
        and channels >= 768
        and kernel_size <= 7
        and snake_conv_eligible(channels, channels, kernel_size)
    )


class AMPBlock1(nn.Module):
    """Pairs of (dilated conv, unit conv) with anti-aliased snake between
    (reference :31-147)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    activation: str = "snakebeta"
    alpha_logscale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fuse = _snake_conv_fusable(self.channels, self.kernel_size)
        for i, d in enumerate(self.dilation):
            act_a = Activation1d(
                self.channels, self.activation, self.alpha_logscale,
                name=f"act{2 * i}",
            )
            conv_a = WNConv1d(
                self.channels, self.kernel_size, dilation=d, init_std=0.01,
                dtype=self.dtype, name=f"conv1_{i}",
            )
            act_b = Activation1d(
                self.channels, self.activation, self.alpha_logscale,
                name=f"act{2 * i + 1}",
            )
            conv_b = WNConv1d(
                self.channels, self.kernel_size, dilation=1, init_std=0.01,
                dtype=self.dtype, name=f"conv2_{i}",
            )
            if fuse:
                xt = conv_a(x, snake=act_a(None) + (self.alpha_logscale,))
                xt = conv_b(xt, snake=act_b(None) + (self.alpha_logscale,))
            else:
                xt = conv_b(act_b(conv_a(act_a(x))))
            x = xt + x
        return x


class AMPBlock2(nn.Module):
    """Single conv per dilation (reference :150-241)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    activation: str = "snakebeta"
    alpha_logscale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fuse = _snake_conv_fusable(self.channels, self.kernel_size)
        for i, d in enumerate(self.dilation):
            act = Activation1d(
                self.channels, self.activation, self.alpha_logscale, name=f"act{i}"
            )
            conv = WNConv1d(
                self.channels, self.kernel_size, dilation=d, init_std=0.01,
                dtype=self.dtype, name=f"conv_{i}",
            )
            if fuse:
                xt = conv(x, snake=act(None) + (self.alpha_logscale,))
            else:
                xt = conv(act(x))
            x = xt + x
        return x


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------


def remove_weight_norm(params):
    """The reference's ``remove_weight_norm()`` analogue
    (/root/reference/BigVGAN/bigvgan.py:389-401): folds every (v, g) pair so
    the direction vector IS the effective kernel (v ← v·g/‖v‖, after which
    the in-module normalisation is the identity).  Returns a new tree;
    numerically a no-op, useful before export or long inference serving."""
    def fold(node):
        if isinstance(node, dict) and "v" in node and "g" in node:
            v = jnp.asarray(node["v"])
            g = jnp.asarray(node["g"])
            axes = tuple(range(v.ndim - 1))
            norm = jnp.sqrt((v**2).sum(axis=axes, keepdims=True))
            out = dict(node)
            out["v"] = v * (g.reshape(norm.shape) / jnp.maximum(norm, 1e-12))
            out["g"] = jnp.abs(g)
            return out
        if isinstance(node, dict):
            return {k: fold(child) for k, child in node.items()}
        return node

    return fold(params)


class BigVGAN(nn.Module):
    """mel (B, num_mels, T) → waveform (B, 1, T·∏rates) (reference :244-387)."""

    config: VocoderConfig = VocoderConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        h = self.config
        num_kernels = len(h.resblock_kernel_sizes)
        block_cls = AMPBlock1 if h.resblock == "1" else AMPBlock2

        x = jnp.moveaxis(mel, 1, -1)  # (B, T, num_mels)
        x = WNConv1d(
            h.upsample_initial_channel, 7, dtype=self.dtype, name="conv_pre"
        )(x)

        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            x = WNConvTranspose1d(ch, k, u, dtype=self.dtype, name=f"up_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)
            ):
                out = block_cls(
                    ch, rk, rd, activation=h.activation,
                    alpha_logscale=h.snake_logscale, dtype=self.dtype,
                    name=f"resblock_{i}_{j}",
                )(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels

        ch = h.upsample_initial_channel // (2 ** len(h.upsample_rates))
        x = Activation1d(
            ch, h.activation, h.snake_logscale, name="activation_post"
        )(x)
        x = WNConv1d(
            1, 7, use_bias=h.use_bias_at_final, init_std=0.01, dtype=self.dtype,
            name="conv_post",
        )(x)
        x = x.astype(jnp.float32)
        if h.use_tanh_at_final:
            x = jnp.tanh(x)
        else:
            x = jnp.clip(x, -1.0, 1.0)
        return jnp.moveaxis(x, 1, -1)[:, :1]  # (B, 1, T·256)


class BinauralBigVGAN(nn.Module):
    """The missing ``bigvgan_binaural.BinauralBigVGAN`` reconstructed from its
    call sites (/root/reference/BigVGAN/inference_binaural.py:17-104,
    inference_diffbinaural_mels.py:16-99; contract documented in SURVEY §2.8):
    a shared mono generator applied to each channel.

    forward(mel_left (B, 80, T), mel_right (B, 80, T)) → (B, 2, T·256)
    """

    config: VocoderConfig = VocoderConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel_left: jnp.ndarray, mel_right: jnp.ndarray) -> jnp.ndarray:
        gen = BigVGAN(self.config, dtype=self.dtype, name="generator")
        b, m, t = mel_left.shape
        # batch the two channels through ONE generator call — on TPU this
        # doubles the matmul batch instead of running the stack twice.
        both = jnp.concatenate([mel_left, mel_right], axis=0)  # (2B, 80, T)
        y = gen(both)  # (2B, 1, T·256)
        return jnp.concatenate([y[:b], y[b:]], axis=1)  # (B, 2, T·256)
