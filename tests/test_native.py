"""Native C++ audio path: build, decode parity, normalize, resample."""

import numpy as np
import pytest

from diffbinaural_tpu import native
from diffbinaural_tpu.data.audio_io import load_wav, save_wav

SR = 22050


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "t.wav"
    rng = np.random.default_rng(0)
    stereo = (0.4 * rng.standard_normal((2, SR))).astype(np.float32)
    stereo = np.clip(stereo, -0.99, 0.99)
    save_wav(str(p), stereo, SR)
    return str(p), stereo


def test_native_builds():
    assert native.available(), "g++ build of libaudio_native.so failed"


def test_wav_decode_matches_scipy(wav_file):
    path, original = wav_file
    got = native.load_wav_native(path)
    assert got is not None
    audio, sr = got
    assert sr == SR
    ref, _ = load_wav(path)
    assert audio.shape == ref.shape == original.shape
    np.testing.assert_allclose(audio, ref, atol=1e-6)  # both read int16


def test_peak_normalize(wav_file):
    rng = np.random.default_rng(1)
    x = (0.2 * rng.standard_normal(1000)).astype(np.float32)
    y = native.peak_normalize_native(x.copy(), 0.95)
    np.testing.assert_allclose(np.abs(y).max(), 0.95, rtol=1e-5)
    np.testing.assert_allclose(y, x / np.abs(x).max() * 0.95, rtol=1e-4,
                               atol=1e-6)


def test_resample_vs_scipy():
    from scipy.signal import resample_poly

    t = np.arange(SR) / SR
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    got = native.resample_native(x, 2, 1)
    assert got is not None
    want = resample_poly(x, 2, 1).astype(np.float32)
    assert abs(len(got) - len(want)) <= 1
    n = min(len(got), len(want))
    # interior agreement (different kaiser parametrisations at edges)
    np.testing.assert_allclose(got[100 : n - 100], want[100 : n - 100],
                               atol=5e-3)
