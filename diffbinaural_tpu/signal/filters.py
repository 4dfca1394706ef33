"""Kaiser-windowed-sinc FIR design + anti-aliased resampling, TPU-native.

Functional re-design of the reference's alias-free activation frontend
(/root/reference/BigVGAN/alias_free_activation/filter.py:30-101 and
resample.py:10-58): same filter taps (Kaiser beta from the stopband
attenuation estimate, sinc low-pass, sum-normalised), same replicate padding
and transposed-conv crop arithmetic, expressed as XLA depthwise convolutions
over (B, C, T).

Filters are designed once in numpy float64 and closed over as constants.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Windowed-sinc low-pass taps, shape (kernel_size,), sum == 1.

    Matches reference filter.py:30-62 (Kaiser beta via the standard
    attenuation estimate; even kernels sample time at half-integer offsets).
    """
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)  # symmetric, == torch periodic=False

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size

    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _depthwise_conv1d(x: jnp.ndarray, taps: jnp.ndarray, stride: int = 1,
                      lhs_dilation: int = 1, padding=((0, 0),)) -> jnp.ndarray:
    """x: (B, C, T); taps: (k,) shared across channels → (B, C, T')."""
    C = x.shape[1]
    rhs = jnp.broadcast_to(taps[None, None, :], (C, 1, taps.shape[0]))
    return jax.lax.conv_general_dilated(
        x, rhs,
        window_strides=(stride,),
        padding=padding,
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=C,
        # FIR taps are tiny; full fp32 accumulation keeps the anti-aliasing
        # filters bit-faithful even when the rest of the model runs bf16.
        precision=jax.lax.Precision.HIGHEST,
    )


def _replicate_pad_t(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Edge-replicate pad on the last axis of (B, C, T)."""
    return jnp.pad(x, ((0, 0), (0, 0), (left, right)), mode="edge")


class LowPassFilter1d:
    """Strided anti-aliasing FIR (reference filter.py:65-101)."""

    def __init__(self, cutoff=0.5, half_width=0.6, stride: int = 1,
                 padding: bool = True, kernel_size: int = 12):
        if cutoff < 0.0:
            raise ValueError("Minimum cutoff must be larger than zero.")
        if cutoff > 0.5:
            raise ValueError("A cutoff above 0.5 does not make sense.")
        self.kernel_size = kernel_size
        self.even = kernel_size % 2 == 0
        self.pad_left = kernel_size // 2 - int(self.even)
        self.pad_right = kernel_size // 2
        self.stride = stride
        self.padding = padding
        self.taps = jnp.asarray(kaiser_sinc_filter1d(cutoff, half_width, kernel_size))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.padding:
            x = _replicate_pad_t(x, self.pad_left, self.pad_right)
        return _depthwise_conv1d(x, self.taps, stride=self.stride)


class UpSample1d:
    """ratio× anti-aliased upsampling (reference resample.py:10-38).

    Expressed as an lhs-dilated depthwise convolution (the XLA-native form of
    torch's conv_transpose1d) followed by the same edge-crop arithmetic.
    """

    def __init__(self, ratio: int = 2, kernel_size: int | None = None):
        self.ratio = ratio
        self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        self.stride = ratio
        self.pad = self.kernel_size // ratio - 1
        self.pad_left = self.pad * self.stride + (self.kernel_size - self.stride) // 2
        self.pad_right = self.pad * self.stride + (self.kernel_size - self.stride + 1) // 2
        taps = kaiser_sinc_filter1d(
            cutoff=0.5 / ratio, half_width=0.6 / ratio, kernel_size=self.kernel_size
        )
        self.taps = jnp.asarray(taps)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        x = _replicate_pad_t(x, self.pad, self.pad)
        # conv_transpose1d(x, w, stride=s, padding=0) ==
        #   conv(dilate(x, s), flip(w), padding=(k-1, k-1))
        y = self.ratio * _depthwise_conv1d(
            x, self.taps[::-1], lhs_dilation=self.stride, padding=((k - 1, k - 1),)
        )
        return y[..., self.pad_left : y.shape[-1] - self.pad_right]


class DownSample1d:
    """ratio× anti-aliased downsampling (reference resample.py:41-58)."""

    def __init__(self, ratio: int = 2, kernel_size: int | None = None):
        self.ratio = ratio
        self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        self.lowpass = LowPassFilter1d(
            cutoff=0.5 / ratio,
            half_width=0.6 / ratio,
            stride=ratio,
            kernel_size=self.kernel_size,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.lowpass(x)
