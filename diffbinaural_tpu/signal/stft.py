"""STFT + slaney mel frontend, TPU-native.

Matches the semantics of the reference's canonical mel function
(/root/reference/BigVGAN/meldataset.py:51-123): librosa slaney-norm mel
filterbank, periodic Hann window, reflect pad of (n_fft-hop)/2, torch.stft
with center=False, magnitude sqrt(re²+im²+1e-9), then ln(clamp(x, 1e-5)).

Design notes (TPU): the STFT is expressed as a gather-free framing
(reshape+slice) followed by a real FFT over the last axis; the mel projection
is a single (F_bins × n_mels) matmul that XLA fuses with the magnitude
computation and runs on the MXU. The filterbank is precomputed in numpy
(float64) once per config and closed over as a constant.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# mel filterbank (slaney scale + slaney norm, the librosa default)
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = math.log(6.4) / 27.0


def _hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    mels = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mels = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mels,
    )
    return mels


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = _F_SP * m
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Slaney-normalised triangular mel filterbank, shape (n_mels, 1+n_fft//2).

    Numerically equivalent to librosa.filters.mel(htk=False, norm='slaney'),
    which is what the reference caches per device (meldataset.py:88-92).
    """
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins, dtype=np.float64)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]  # (n_mels+2, n_bins)

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney area normalisation
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_size: int) -> np.ndarray:
    """Periodic Hann window — matches torch.hann_window(win, periodic=True)."""
    n = np.arange(win_size, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * math.pi * n / win_size))).astype(np.float32)


# ---------------------------------------------------------------------------
# framing + STFT
# ---------------------------------------------------------------------------


def _frame(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., T) → (..., n_frames, frame_length) via strided gather-free slicing."""
    n_frames = 1 + (y.shape[-1] - frame_length) // hop
    # A single gather with a static index matrix; XLA lowers this to an
    # efficient dynamic-slice loop and fuses with the downstream window mult.
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[..., idx]


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
    *,
    pad: bool = True,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """|STFT| with reference padding semantics.  y: (..., T) → (..., F, frames).

    pad=True applies the reflect pad of (n_fft-hop)/2 on both ends and then a
    center=False STFT (reference: meldataset.py:98-117).  Windows shorter
    than n_fft are centre-padded to n_fft (torch.stft semantics — the MRD
    uses (1024, 120, 600)-style resolutions).
    """
    win_np = hann_window(win_size)
    if win_size < n_fft:
        lpad = (n_fft - win_size) // 2
        win_np = np.pad(win_np, (lpad, n_fft - win_size - lpad))
    window = jnp.asarray(win_np)
    if pad:
        padding = (n_fft - hop_size) // 2
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(padding, padding)], mode="reflect")
    frames = _frame(y, n_fft, hop_size)  # (..., frames, n_fft)
    frames = frames * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + eps)
    return jnp.moveaxis(mag, -1, -2)  # (..., F, frames)


def stft_complex(
    y: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int | None = None,
    *,
    center: bool = True,
    pad_mode: str = "reflect",
    window: np.ndarray | None = None,
) -> jnp.ndarray:
    """Complex STFT with torch.stft(center=True) semantics.

    y: (..., T) → complex64 (..., 1+n_fft//2, n_frames) with
    n_frames = 1 + T//hop when centered (reflect pad of n_fft//2 each side).
    Used by the multi-band/multi-resolution discriminators and the
    multi-scale mel loss (reference loss.py:140-147, discriminators.py:225-244).
    """
    if win_size is None:
        win_size = n_fft
    win = jnp.asarray(window if window is not None else hann_window(win_size))
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode=pad_mode)
    frames = _frame(y, n_fft, hop_size)
    frames = frames * win
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    return jnp.moveaxis(spec, -1, -2)


def dynamic_range_compression(x, C: float = 1.0, clip_val: float = 1e-5):
    """ln-compress (reference: meldataset.py:31-32)."""
    return jnp.log(jnp.clip(x, clip_val, None) * C)


def dynamic_range_decompression(x, C: float = 1.0):
    return jnp.exp(x) / C


def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 22050,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jnp.ndarray:
    """ln-mel spectrogram, (..., T) audio → (..., num_mels, frames).

    Bit-matches the reference mel frontend (meldataset.py:51-123) in float32.
    """
    mag = stft_magnitude(y, n_fft, hop_size, win_size)
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum(
        "mf,...ft->...mt", basis, mag, preferred_element_type=jnp.float32
    )
    return dynamic_range_compression(mel)


def num_frames(n_samples: int, n_fft: int = 1024, hop_size: int = 256) -> int:
    """Frame count produced by mel_spectrogram for an n_samples-long input."""
    padding = (n_fft - hop_size) // 2
    return 1 + (n_samples + 2 * padding - n_fft) // hop_size
