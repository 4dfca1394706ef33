"""Vocoder inference: log-mels → waveform with zero-frame silence handling.

Capability parity with /root/reference/BigVGAN/inference_e2e.py:

  * ``detect_and_exclude_zero_frames`` (:38-71) — host-side (numpy) frame
    filtering, exactly as the reference does before vocoding
  * ``reconstruct_audio_with_silence`` (:74-111) — hop-granular silence
    re-insertion (vectorised scatter instead of the reference's python loop)
  * ``Vocoder`` — jitted generator; L and R mels of a clip run as ONE
    batched call (the reference calls the generator twice, :174-175)

Dynamic clip lengths are bucketed (padded up to a multiple of
``pad_multiple`` mel frames) so XLA compiles once per bucket, not per clip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VocoderConfig
from ..models.bigvgan import BigVGAN


def detect_and_exclude_zero_frames(
    mel_spec: np.ndarray, zero_threshold: float = 1e-10
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(num_mels, T) → (filtered_mel, zero_mask, nonzero_indices)
    (reference inference_e2e.py:38-71)."""
    frame_sums = np.sum(np.abs(mel_spec), axis=0)
    zero_mask = frame_sums <= zero_threshold
    if not np.any(zero_mask):
        return mel_spec, zero_mask, np.arange(mel_spec.shape[1])
    nonzero = np.where(~zero_mask)[0]
    return mel_spec[:, nonzero], zero_mask, nonzero


def reconstruct_audio_with_silence(
    filtered_audio: np.ndarray,
    zero_mask: np.ndarray,
    nonzero_indices: np.ndarray,
    hop_size: int,
    original_length: int,
) -> np.ndarray:
    """Re-insert hop-sized silence blocks at the original frame positions
    (reference inference_e2e.py:74-111)."""
    restored = np.zeros(original_length, dtype=filtered_audio.dtype)
    for i, orig in enumerate(nonzero_indices):
        src_lo = i * hop_size
        src_hi = min((i + 1) * hop_size, len(filtered_audio))
        dst_lo = orig * hop_size
        dst_hi = min((orig + 1) * hop_size, original_length)
        n = min(src_hi - src_lo, dst_hi - dst_lo)
        if n > 0:
            restored[dst_lo : dst_lo + n] = filtered_audio[src_lo : src_lo + n]
    return restored


class Vocoder:
    """Jitted BigVGAN inference over length buckets."""

    def __init__(
        self,
        config: VocoderConfig = VocoderConfig(),
        hop_size: int = 256,
        pad_multiple: int = 64,
        dtype=jnp.float32,
    ):
        self.config = config
        self.hop_size = hop_size
        self.pad_multiple = pad_multiple
        self.model = BigVGAN(config, dtype=dtype)
        self._apply = jax.jit(lambda p, mel: self.model.apply(p, mel))

    def init(self, rng: jax.Array, t_frames: int = 32):
        return self.model.init(rng, jnp.zeros((1, self.config.num_mels, t_frames)))

    def __call__(self, params, mel: np.ndarray) -> np.ndarray:
        """mel: (B, num_mels, T) → (B, T·hop) float32 in [-1, 1]."""
        b, m, t = mel.shape
        t_pad = -(-t // self.pad_multiple) * self.pad_multiple
        mel_in = np.full((b, m, t_pad), np.log(1e-5), dtype=np.float32)
        mel_in[:, :, :t] = mel
        y = np.asarray(self._apply(params, jnp.asarray(mel_in)))[:, 0]
        return y[:, : t * self.hop_size]

    def vocode_binaural(
        self,
        params,
        mel_left: np.ndarray,
        mel_right: np.ndarray,
        interpolate_zero_frames: bool = True,
    ) -> np.ndarray:
        """(num_mels, T) × 2 → stereo (2, T·hop) with zero-frame silence
        handling (reference inference_e2e.py:129-189, flag default True
        :220-221)."""
        t = mel_left.shape[1]
        out_len = t * self.hop_size
        if not interpolate_zero_frames:
            y = self(params, np.stack([mel_left, mel_right]))
            return y

        chans = []
        for mel in (mel_left, mel_right):
            filtered, mask, idx = detect_and_exclude_zero_frames(mel)
            if filtered.shape[1] == 0:
                chans.append(np.zeros(out_len, dtype=np.float32))
                continue
            audio = self(params, filtered[None])[0]
            if mask.any():
                audio = reconstruct_audio_with_silence(
                    audio, mask, idx, self.hop_size, out_len
                )
            chans.append(audio[:out_len])
        return np.stack(chans)
