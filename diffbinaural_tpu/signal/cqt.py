"""Constant-Q transform, TPU-native (octave-stacked, MXU matmuls).

Equivalent of nnAudio's ``features.cqt.CQT2010v2`` as used by the reference's
CQT discriminator (/root/reference/BigVGAN/discriminators.py:408-565:
``CQT2010v2(sr=fs*2, hop_length, n_bins=bpo*n_oct, bins_per_octave,
output_format="Complex", pad_mode="constant")``).

Algorithm (the CQT2010 trick, re-derived for XLA):
  * design complex Hann-windowed exponential kernels ONLY for the top octave
    (short kernels — length ceil(Q·sr/f));
  * per lower octave, low-pass + decimate the signal by 2 (kaiser-sinc FIR)
    and reuse the same kernels with hop/2ᵏ — every octave then produces the
    SAME number of frames, and each octave is one (frames × L)·(L × 2·bpo)
    matmul on the MXU;
  * stack octaves in ascending-frequency bin order.

Kernels are l1-normalised (librosa/nnAudio ``norm=1`` convention).  The
result is numerically equivalent in structure (constant-Q complex filterbank
at the same frequencies/hops) though not bit-identical to nnAudio's FFT-domain
implementation; the consumer is a *learned* discriminator, which adapts to
the filterbank's fixed scaling.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .filters import kaiser_sinc_filter1d


@lru_cache(maxsize=16)
def cqt_kernels(
    sr: float,
    bins_per_octave: int,
    n_octaves: int,
    fmin: float = 32.70319566257483,  # C1, the nnAudio default
    filter_scale: float = 1.0,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Top-octave kernel bank → (real (L, bpo), imag (L, bpo), L)."""
    q = filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    # top octave spans bins [n_bins - bpo, n_bins)
    top_start = fmin * 2.0 ** (n_octaves - 1)
    freqs = top_start * 2.0 ** (np.arange(bins_per_octave) / bins_per_octave)
    lengths = np.ceil(q * sr / freqs).astype(int)
    L = int(lengths.max())

    real = np.zeros((L, bins_per_octave), dtype=np.float32)
    imag = np.zeros((L, bins_per_octave), dtype=np.float32)
    for j, (f, l) in enumerate(zip(freqs, lengths)):
        n = np.arange(l, dtype=np.float64)
        win = 0.5 * (1.0 - np.cos(2.0 * math.pi * n / (l - 1))) if l > 1 else np.ones(1)
        phase = 2.0 * math.pi * f / sr * (n - (l - 1) / 2.0)
        k = win * np.exp(1j * phase)
        k /= np.abs(k).sum()  # l1 norm
        start = (L - l) // 2  # centre within the bank
        real[start : start + l, j] = k.real.astype(np.float32)
        imag[start : start + l, j] = k.imag.astype(np.float32)
    return real, imag, L


def _frame_const_pad(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Centered framing with constant (zero) padding — nnAudio
    pad_mode='constant'.  x: (B, T) → (B, n_frames, frame_len) with
    n_frames = T//hop + 1."""
    t = x.shape[-1]
    half = frame_len // 2
    x = jnp.pad(x, ((0, 0), (half, half)), mode="constant")
    n_frames = t // hop + 1
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[:, idx]


def _decimate2(x: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased ÷2 along the last axis of (B, T)."""
    taps = kaiser_sinc_filter1d(0.25, 0.3, 24)
    k = len(taps)
    pad_left = k // 2 - 1
    pad_right = k // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right)), mode="constant")
    rhs = jnp.asarray(taps)[None, None, :]  # (O=1, I=1, k)
    y = jax.lax.conv_general_dilated(
        x[:, None, :], rhs, window_strides=(2,), padding=((0, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y[:, 0, :]


def cqt(
    x: jnp.ndarray,
    sr: float,
    hop_length: int,
    n_octaves: int,
    bins_per_octave: int,
    fmin: float = 32.70319566257483,
) -> jnp.ndarray:
    """x: (B, T) → (B, n_bins, n_frames, 2) with bins ascending in frequency
    and last axis (real, imag) — the nnAudio 'Complex' output layout."""
    assert hop_length % (2 ** (n_octaves - 1)) == 0 or hop_length >= 2 ** (
        n_octaves - 1
    ), "hop must divide by 2^(n_octaves-1)"
    real, imag, L = cqt_kernels(sr, bins_per_octave, n_octaves, fmin)
    kr, ki = jnp.asarray(real), jnp.asarray(imag)

    octaves = []
    sig = x
    hop = hop_length
    for k in range(n_octaves):
        if k > 0:
            sig = _decimate2(sig)
            hop = max(hop // 2, 1)
        frames = _frame_const_pad(sig, L, hop)  # (B, n_frames, L)
        re = jnp.einsum("bnl,lj->bjn", frames, kr,
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("bnl,lj->bjn", frames, ki,
                        preferred_element_type=jnp.float32)
        octaves.append(jnp.stack([re, im], axis=-1))  # (B, bpo, n_frames, 2)

    # octave 0 is the TOP octave; ascending bins = bottom octave first
    n_frames = min(o.shape[2] for o in octaves)
    octaves = [o[:, :, :n_frames] for o in octaves]
    return jnp.concatenate(list(reversed(octaves)), axis=1)
