"""GAN discriminator family for stage-2 vocoder training, TPU-native.

Capability-parity re-design of /root/reference/BigVGAN/discriminators.py:

  * ``DiscriminatorP`` / ``MultiPeriodDiscriminator``    (:21-140)
  * ``DiscriminatorR`` / ``MultiResolutionDiscriminator`` (:143-277)
  * ``DiscriminatorB`` / ``MultiBandDiscriminator``       (:283-403)
  * ``DiscriminatorCQT`` / ``MultiScaleSubbandCQTDiscriminator`` (:408-619)
    — nnAudio's CQT2010v2 becomes the octave-stacked matmul CQT in
    signal.cqt; the ×2 resample (torchaudio Resample) becomes the
    kaiser-sinc polyphase upsampler.
  * ``CombinedDiscriminator``                             (:622-651)

All multi-discriminators share the reference call contract:
``disc(y, y_hat) → (real_logits, fake_logits, real_fmaps, fake_fmaps)``.

Audio enters as (B, 1, T); 2D conv stacks run channels-last (NHWC).
Weight norm matches torch (per-output-channel over the remaining axes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..signal.cqt import cqt
from ..signal.stft import stft_complex, stft_magnitude
from .bigvgan import upsample2_nhc


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


class WNConv2d(nn.Module):
    """weight_norm(Conv2d) on NHWC, explicit torch-style padding."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        v = self.param(
            "v", nn.initializers.he_normal(), (kh, kw, cin, self.features)
        )
        if self.use_weight_norm:
            g = self.param(
                "g", lambda _k: jnp.sqrt((v**2).sum(axis=(0, 1, 2)))
            )
            norm = jnp.sqrt((v**2).sum(axis=(0, 1, 2), keepdims=True))
            kernel = v * (g[None, None, None, :] / jnp.maximum(norm, 1e-12))
        else:
            kernel = v
        b = self.param("b", nn.initializers.zeros, (self.features,))
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


# ---------------------------------------------------------------------------
# multi-period
# ---------------------------------------------------------------------------


class DiscriminatorP(nn.Module):
    """Period-reshaped 2D conv stack (reference :21-107)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channel_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, 1, T) → (logits (B, N), fmaps list)."""
        fmap = []
        b, c, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        # (B, C, T) → (B, T/p, p, C) NHWC
        x = x.reshape(b, c, t // self.period, self.period)
        x = jnp.moveaxis(x, 1, -1)

        widths = [32, 128, 512, 1024]
        for i, w in enumerate(widths):
            x = WNConv2d(
                int(w * self.channel_mult), (self.kernel_size, 1),
                strides=(self.stride, 1), padding=(2, 0), dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = WNConv2d(
            int(1024 * self.channel_mult), (self.kernel_size, 1),
            strides=(1, 1), padding=(2, 0), dtype=self.dtype, name="conv_4",
        )(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = WNConv2d(1, (3, 1), padding=(1, 0), dtype=self.dtype, name="conv_post")(
            x
        )
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Periods from config ``mpd_reshapes`` [2,3,5,7,11] (reference :110-140)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channel_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(
                p, channel_mult=self.channel_mult, dtype=self.dtype,
                name=f"disc_{p}",
            )
            r_logit, r_fmap = d(y)
            g_logit, g_fmap = d(y_hat)
            y_d_rs.append(r_logit)
            y_d_gs.append(g_logit)
            fmap_rs.append(r_fmap)
            fmap_gs.append(g_fmap)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# multi-resolution (STFT magnitude)
# ---------------------------------------------------------------------------


class DiscriminatorR(nn.Module):
    """STFT-magnitude 2D convs (reference :143-244).  resolution =
    (n_fft, hop, win); the input is reflect-padded (n_fft-hop)/2 and the STFT
    runs center=False — the reference's exact framing."""

    resolution: Tuple[int, int, int]
    channel_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_fft, hop, win = self.resolution
        b = x.shape[0]
        mag = stft_magnitude(
            x[:, 0, :], n_fft, hop, win, pad=True, eps=1e-9
        )  # (B, F, frames)
        x = mag[..., None].transpose(0, 1, 2, 3)  # (B, F, T, 1) NHWC

        specs = [
            dict(strides=(1, 1)),
            dict(strides=(1, 2)),
            dict(strides=(1, 2)),
            dict(strides=(1, 2)),
        ]
        fmap = []
        for i, s in enumerate(specs):
            x = WNConv2d(
                int(32 * self.channel_mult), (3, 9), padding=(1, 4),
                dtype=self.dtype, name=f"conv_{i}", **s,
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = WNConv2d(
            int(32 * self.channel_mult), (3, 3), padding=(1, 1),
            dtype=self.dtype, name="conv_4",
        )(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = WNConv2d(1, (3, 3), padding=(1, 1), dtype=self.dtype, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    """resolutions [[1024,120,600],[2048,240,1200],[512,50,240]]
    (reference :247-277 + configs/bigvgan_22khz_80band.json:20)."""

    resolutions: Sequence[Tuple[int, int, int]] = (
        (1024, 120, 600),
        (2048, 240, 1200),
        (512, 50, 240),
    )
    channel_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, res in enumerate(self.resolutions):
            d = DiscriminatorR(
                tuple(res), channel_mult=self.channel_mult, dtype=self.dtype,
                name=f"disc_{i}",
            )
            r_logit, r_fmap = d(y)
            g_logit, g_fmap = d(y_hat)
            y_d_rs.append(r_logit)
            y_d_gs.append(g_logit)
            fmap_rs.append(r_fmap)
            fmap_gs.append(g_fmap)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# multi-band (complex STFT, band-split)
# ---------------------------------------------------------------------------


class DiscriminatorB(nn.Module):
    """Band-split complex-STFT convs (reference :283-361)."""

    window_length: int
    channels: int = 32
    hop_factor: float = 0.25
    bands: Sequence[Tuple[float, float]] = (
        (0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0),
    )
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        wav = x[:, 0, :]
        # DC removal + peak normalisation (reference :332-336)
        wav = wav - wav.mean(axis=-1, keepdims=True)
        wav = 0.8 * wav / (jnp.abs(wav).max(axis=-1, keepdims=True) + 1e-9)
        spec = stft_complex(
            wav, self.window_length, int(self.window_length * self.hop_factor)
        )  # (B, F, T) complex
        z = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)  # (B, F, T, 2)
        z = z.transpose(0, 2, 1, 3)  # (B, T, F, 2) NHWC with C=(re, im)

        n_fft_bins = self.window_length // 2 + 1
        band_idx = [
            (int(lo * n_fft_bins), int(hi * n_fft_bins)) for lo, hi in self.bands
        ]

        fmap = []
        outs = []
        for bi, (lo, hi) in enumerate(band_idx):
            band = z[:, :, lo:hi, :]
            specs = [
                dict(strides=(1, 1), kernel_size=(3, 9), padding=(1, 4)),
                dict(strides=(1, 2), kernel_size=(3, 9), padding=(1, 4)),
                dict(strides=(1, 2), kernel_size=(3, 9), padding=(1, 4)),
                dict(strides=(1, 2), kernel_size=(3, 9), padding=(1, 4)),
                dict(strides=(1, 1), kernel_size=(3, 3), padding=(1, 1)),
            ]
            for i, s in enumerate(specs):
                band = WNConv2d(
                    self.channels, dtype=self.dtype, name=f"band{bi}_conv{i}", **s
                )(band)
                band = leaky_relu(band)
                if i > 0:
                    fmap.append(band)
            outs.append(band)

        x = jnp.concatenate(outs, axis=2)  # cat over freq
        x = WNConv2d(
            1, (3, 3), padding=(1, 1), dtype=self.dtype, name="conv_post"
        )(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiBandDiscriminator(nn.Module):
    """fft sizes [2048, 1024, 512] (reference :367-403)."""

    fft_sizes: Sequence[int] = (2048, 1024, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for w in self.fft_sizes:
            d = DiscriminatorB(w, dtype=self.dtype, name=f"disc_{w}")
            r_logit, r_fmap = d(y)
            g_logit, g_fmap = d(y_hat)
            y_d_rs.append(r_logit)
            y_d_gs.append(g_logit)
            fmap_rs.append(r_fmap)
            fmap_gs.append(g_fmap)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# CQT discriminator
# ---------------------------------------------------------------------------


class DiscriminatorCQT(nn.Module):
    """Complex-CQT conv stack, per-octave pre-convs (reference :408-565)."""

    sampling_rate: int
    hop_length: int
    n_octaves: int
    bins_per_octave: int
    filters: int = 128  # cqtd_filters (production config json:24)
    max_filters: int = 1024
    filters_scale: int = 1
    dilations: Sequence[int] = (1, 2, 4)
    in_channels: int = 1
    out_channels: int = 1
    normalize_volume: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        wav = x[:, 0, :]
        if self.normalize_volume:
            wav = wav - wav.mean(axis=-1, keepdims=True)
            wav = 0.8 * wav / (jnp.abs(wav).max(axis=-1, keepdims=True) + 1e-9)

        # ×2 resample then CQT at 2·fs (reference :506, :430-437)
        up = upsample2_nhc(wav[:, :, None], ratio=2, kernel_size=24)[:, :, 0]
        z = cqt(
            up, self.sampling_rate * 2, self.hop_length, self.n_octaves,
            self.bins_per_octave,
        )  # (B, n_bins, T, 2)
        z = z.transpose(0, 2, 1, 3)  # (B, T, n_bins, 2) NHWC

        kh, kw = 3, 9
        # per-octave plain pre-convs (NO weight norm, reference :439-448)
        pre = []
        for i in range(self.n_octaves):
            octave = z[:, :, i * self.bins_per_octave : (i + 1) * self.bins_per_octave]
            pre.append(
                WNConv2d(
                    self.in_channels * 2, (kh, kw), padding=(1, 4),
                    use_weight_norm=False, dtype=self.dtype, name=f"conv_pre_{i}",
                )(octave)
            )
        latent = jnp.concatenate(pre, axis=2)

        fmap = []
        latent = WNConv2d(
            self.filters, (kh, kw), padding=(1, 4), use_weight_norm=False,
            dtype=self.dtype, name="conv_0",
        )(latent)
        latent = leaky_relu(latent)
        fmap.append(latent)

        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, dil in enumerate(self.dilations):
            out_chs = min(
                (self.filters_scale ** (i + 1)) * self.filters, self.max_filters
            )
            latent = WNConv2d(
                out_chs, (kh, kw), strides=(1, 2),
                dilation=(dil, 1), padding=(((kh - 1) * dil) // 2, (kw - 1) // 2),
                dtype=self.dtype, name=f"conv_{i + 1}",
            )(latent)
            latent = leaky_relu(latent)
            fmap.append(latent)
            in_chs = out_chs

        out_chs = min(
            (self.filters_scale ** (len(self.dilations) + 1)) * self.filters,
            self.max_filters,
        )
        latent = WNConv2d(
            out_chs, (kh, kh), padding=(1, 1), dtype=self.dtype, name="conv_final"
        )(latent)
        latent = leaky_relu(latent)
        fmap.append(latent)

        latent = WNConv2d(
            self.out_channels, (kh, kh), padding=(1, 1), dtype=self.dtype,
            name="conv_post",
        )(latent)
        return latent.reshape(b, -1), fmap


class MultiScaleSubbandCQTDiscriminator(nn.Module):
    """hops [512,256,256], 9 octaves, bins/octave [24,36,48]
    (reference :568-619; ENABLED by the production config,
    bigvgan_binaural_22khz_80band_256x.json:23)."""

    sampling_rate: int = 22050
    hop_lengths: Sequence[int] = (512, 256, 256)
    n_octaves: Sequence[int] = (9, 9, 9)
    bins_per_octaves: Sequence[int] = (24, 36, 48)
    filters: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, (hop, n_oct, bpo) in enumerate(
            zip(self.hop_lengths, self.n_octaves, self.bins_per_octaves)
        ):
            d = DiscriminatorCQT(
                self.sampling_rate, hop, n_oct, bpo, filters=self.filters,
                dtype=self.dtype, name=f"disc_{i}",
            )
            r_logit, r_fmap = d(y)
            g_logit, g_fmap = d(y_hat)
            y_d_rs.append(r_logit)
            y_d_gs.append(g_logit)
            fmap_rs.append(r_fmap)
            fmap_gs.append(g_fmap)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class CombinedDiscriminator(nn.Module):
    """Chain several discriminator families into one (reference :622-651)."""

    discriminators: Sequence[nn.Module]

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for disc in self.discriminators:
            r, g, fr, fg = disc(y, y_hat)
            y_d_rs.extend(r)
            y_d_gs.extend(g)
            fmap_rs.extend(fr)
            fmap_gs.extend(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
