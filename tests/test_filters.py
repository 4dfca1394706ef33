"""Anti-aliased resampler parity vs a torch oracle.

The oracle re-derives the public alias-free-torch algorithm (replicate pad →
(transposed) depthwise FIR → crop) directly with torch ops so the JAX
implementation's padding/crop arithmetic is cross-checked numerically.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from diffbinaural_tpu.signal import (
    kaiser_sinc_filter1d,
    LowPassFilter1d,
    UpSample1d,
    DownSample1d,
)


def test_kaiser_taps_match_torch_window():
    ks = 12
    taps = kaiser_sinc_filter1d(0.25, 0.3, ks)
    assert taps.shape == (ks,)
    np.testing.assert_allclose(taps.sum(), 1.0, atol=1e-6)
    # symmetric even filter
    np.testing.assert_allclose(taps, taps[::-1], atol=1e-7)
    # torch.kaiser_window(periodic=False) == np.kaiser
    np.testing.assert_allclose(
        np.kaiser(ks, 8.0),
        torch.kaiser_window(ks, beta=8.0, periodic=False).numpy(),
        atol=1e-6,
    )


def _torch_lowpass(x, taps, stride, pad_left, pad_right):
    xt = torch.from_numpy(x)
    C = xt.shape[1]
    w = torch.from_numpy(taps).view(1, 1, -1).expand(C, -1, -1)
    xt = F.pad(xt, (pad_left, pad_right), mode="replicate")
    return F.conv1d(xt, w, stride=stride, groups=C).numpy()


def _torch_upsample(x, taps, ratio):
    ks = len(taps)
    pad = ks // ratio - 1
    pad_left = pad * ratio + (ks - ratio) // 2
    pad_right = pad * ratio + (ks - ratio + 1) // 2
    xt = torch.from_numpy(x)
    C = xt.shape[1]
    w = torch.from_numpy(taps).view(1, 1, -1).expand(C, -1, -1)
    xt = F.pad(xt, (pad, pad), mode="replicate")
    y = ratio * F.conv_transpose1d(xt, w, stride=ratio, groups=C)
    return y[..., pad_left:-pad_right].numpy()


def test_lowpass_matches_torch_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    lp = LowPassFilter1d(cutoff=0.25, half_width=0.3, stride=2, kernel_size=12)
    ours = np.asarray(lp(jnp.asarray(x)))
    taps = kaiser_sinc_filter1d(0.25, 0.3, 12)
    ref = _torch_lowpass(x, taps, 2, lp.pad_left, lp.pad_right)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_upsample_matches_torch_oracle():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    up = UpSample1d(ratio=2)
    ours = np.asarray(up(jnp.asarray(x)))
    taps = kaiser_sinc_filter1d(0.25, 0.3, up.kernel_size)
    ref = _torch_upsample(x, taps, 2)
    assert ours.shape == ref.shape == (2, 3, 128)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_up_down_roundtrip_preserves_lowfreq():
    """2× up then 2× down should approximately reproduce a band-limited input."""
    t = np.arange(256) / 256
    x = np.sin(2 * np.pi * 4 * t).astype(np.float32)[None, None, :]
    up, down = UpSample1d(2), DownSample1d(2)
    y = np.asarray(down(up(jnp.asarray(x))))
    assert y.shape == x.shape
    # interior (away from edge transients)
    np.testing.assert_allclose(y[..., 24:-24], x[..., 24:-24], atol=2e-2)
