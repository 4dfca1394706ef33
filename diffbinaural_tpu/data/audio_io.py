"""Audio IO + resampling, host-side (numpy/scipy).

Replaces the reference's librosa/torchaudio/soundfile usage
(/root/reference/BigVGAN/meldataset.py:8-20, utils.py:117-121):
scipy.io.wavfile for PCM/float WAVs, polyphase kaiser resampling, and the
librosa.util.normalize peak normalisation the loaders apply (×0.95).

The C++ fast path (diffbinaural_tpu/native) decodes+resamples WAV batches
off the GIL; this module is the pure-python reference implementation and
fallback.
"""

from __future__ import annotations

import os
import wave
from typing import Optional, Tuple

import numpy as np

MAX_WAV_VALUE = 32767.0  # reference meldataset.py:20 (32768 in save path)

try:
    from scipy.io import wavfile as _wavfile
    from scipy.signal import resample_poly as _resample_poly

    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False


def load_wav(path: str, target_sr: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """→ (audio float32 in [-1, 1], sr).  Shape (T,) mono or (C, T).

    Uses the native C++ decoder (diffbinaural_tpu.native) when available —
    WAV parse + int→float conversion run off the GIL."""
    try:
        from .. import native

        if path.lower().endswith(".wav") and native.available():
            got = native.load_wav_native(path)
            if got is not None:
                data, sr = got
                if target_sr is not None and sr != target_sr:
                    data = resample(data, sr, target_sr)
                    sr = target_sr
                return data, sr
    except Exception:
        pass
    if _HAVE_SCIPY:
        sr, data = _wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
    else:  # stdlib fallback, PCM16 only
        with wave.open(path, "rb") as f:
            sr = f.getframerate()
            n = f.getnframes()
            raw = f.readframes(n)
            data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
            if f.getnchannels() > 1:
                data = data.reshape(-1, f.getnchannels())
    if data.ndim == 2:
        data = data.T  # (C, T)
    if target_sr is not None and sr != target_sr:
        data = resample(data, sr, target_sr)
        sr = target_sr
    return data, sr


def save_wav(path: str, audio: np.ndarray, sr: int):
    """float [-1, 1] → int16 WAV (reference utils.py:117-121)."""
    audio = np.asarray(audio)
    if audio.ndim == 2 and audio.shape[0] <= 8:
        audio = audio.T  # (T, C) for the container
    pcm = np.clip(audio * MAX_WAV_VALUE, -32768, 32767).astype(np.int16)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if _HAVE_SCIPY:
        _wavfile.write(path, sr, pcm)
    else:  # pragma: no cover
        with wave.open(path, "wb") as f:
            f.setnchannels(1 if pcm.ndim == 1 else pcm.shape[1])
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase kaiser resampling along the last axis."""
    if orig_sr == target_sr:
        return audio
    from math import gcd

    g = gcd(orig_sr, target_sr)
    return _resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(
        np.float32
    )


def normalize_audio(audio: np.ndarray, level: float = 0.95) -> np.ndarray:
    """Peak normalisation ×0.95 — librosa.util.normalize(wav) * 0.95
    (reference meldataset.py:304, train_binaural_mel.py:379)."""
    peak = np.max(np.abs(audio))
    if peak < 1e-10:
        return audio.astype(np.float32)
    return (audio / peak * level).astype(np.float32)
