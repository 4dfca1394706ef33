"""Silence-aware auxiliary losses for vocoder training.

Capability parity with the loss library embedded in the reference trainers:
/root/reference/BigVGAN/train_binaural_mel.py:65-207 (detect_silence_regions,
silence_aware_loss, spectral_consistency_loss, energy_regularization_loss,
adaptive_loss_weighting) and train_binaural_both.py:63-86
(simple_silence_aware_mel_loss — the one actually reachable: used on the
non-multiscale branch with λ·0.2, train_binaural_both.py:1070-1076).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def detect_silence_regions(
    mel_spec: jnp.ndarray, threshold_db: float = -60.0, min_silence_frames: int = 5
) -> jnp.ndarray:
    """mel (B, n_mels, T) → silence mask (B, 1, T), 1 = silence
    (reference train_binaural_mel.py:65-92)."""
    mel_db = 20.0 * jnp.log10(jnp.clip(mel_spec, 1e-8, None))
    energy = jnp.mean(mel_db, axis=1, keepdims=True)  # (B, 1, T)
    mask = (energy < threshold_db).astype(jnp.float32)
    if min_silence_frames > 1:
        k = min_silence_frames
        kernel = jnp.ones((1, 1, k), jnp.float32)
        conv = jax.lax.conv_general_dilated(
            mask, kernel, (1,), ((k // 2, k // 2),),
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        mask = (conv >= k).astype(jnp.float32)
    return mask


def silence_aware_loss(
    y_mel: jnp.ndarray,
    y_g_hat_mel: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    y_g_hat: Optional[jnp.ndarray] = None,
    silence_threshold_db: float = -60.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Region-weighted mel L1 (silence ×3) + predicted-energy-in-silence
    penalty ×10 (reference train_binaural_mel.py:94-132)."""
    silence = detect_silence_regions(y_mel, silence_threshold_db)
    active = 1.0 - silence
    base = jnp.abs(y_mel - y_g_hat_mel)
    mel_loss = jnp.mean(base * silence * 3.0 + base * active * 1.0)

    if y is not None and y_g_hat is not None:
        t_wave = y.shape[-1]
        # nearest-neighbour upsample of the frame mask to sample rate
        reps = t_wave // silence.shape[-1]
        mask_wave = jnp.repeat(silence, reps, axis=-1)
        pad = t_wave - mask_wave.shape[-1]
        if pad > 0:
            mask_wave = jnp.pad(mask_wave, ((0, 0), (0, 0), (0, pad)), mode="edge")
        silence_energy = jnp.mean((y_g_hat**2) * mask_wave[..., :t_wave])
        return mel_loss, silence_energy * 10.0
    return mel_loss, jnp.asarray(0.0)


def simple_silence_aware_mel_loss(
    y_mel: jnp.ndarray,
    y_g_hat_mel: jnp.ndarray,
    silence_threshold_db: float = -50.0,
    silence_penalty: float = 2.0,
) -> jnp.ndarray:
    """(reference train_binaural_both.py:63-86)"""
    y_db = 20.0 * jnp.log10(jnp.clip(y_mel, 1e-8, None))
    energy = jnp.mean(y_db, axis=1, keepdims=True)
    silence = (energy < silence_threshold_db).astype(jnp.float32)
    base = jnp.abs(y_mel - y_g_hat_mel)
    return jnp.mean(base * silence * silence_penalty + base * (1.0 - silence))


def spectral_consistency_loss(
    y_g_hat_mel: jnp.ndarray,
    low_freq_weight: float = 2.0,
    high_freq_weight: float = 0.5,
) -> jnp.ndarray:
    """Temporal ×0.1 + frequency ×0.05 smoothness
    (reference train_binaural_mel.py:135-154; the freq-weighted magnitude
    term is computed but discarded there too)."""
    del low_freq_weight, high_freq_weight  # computed-but-unused in reference
    temporal = jnp.mean(jnp.abs(jnp.diff(y_g_hat_mel, axis=-1)))
    freq = jnp.mean(jnp.abs(jnp.diff(y_g_hat_mel, axis=-2)))
    return temporal * 0.1 + freq * 0.05


def energy_regularization_loss(
    y_mel: jnp.ndarray,
    y_g_hat_mel: jnp.ndarray,
    y_g_hat: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Energy conservation ×0.1 + dynamic range ×0.1 + RMS ×0.05
    (reference train_binaural_mel.py:157-186)."""
    b = y_mel.shape[0]
    gt_energy = jnp.sum(y_mel, axis=(1, 2))
    pred_energy = jnp.sum(y_g_hat_mel, axis=(1, 2))
    energy_loss = jnp.mean(jnp.abs(pred_energy - gt_energy))

    gt_flat = y_mel.reshape(b, -1)
    pred_flat = y_g_hat_mel.reshape(b, -1)
    gt_dr = gt_flat.max(axis=1) - gt_flat.min(axis=1)
    pred_dr = pred_flat.max(axis=1) - pred_flat.min(axis=1)
    dr_loss = jnp.mean(jnp.abs(pred_dr - gt_dr))

    if y_g_hat is not None:
        gt_rms = jnp.sqrt(jnp.mean(jnp.sum(y_mel**2, axis=1), axis=1))
        pred_rms = jnp.sqrt(jnp.mean(y_g_hat**2, axis=(1, 2)))
        rms_loss = jnp.mean(jnp.abs(pred_rms - gt_rms))
    else:
        rms_loss = 0.0
    return energy_loss * 0.1 + dr_loss * 0.1 + rms_loss * 0.05


def adaptive_loss_weighting(current_step: int, total_steps: int):
    """(reference train_binaural_mel.py:189-207)"""
    progress = min(current_step / max(total_steps, 1), 1.0)
    silence_weight = 0.5 + 1.5 * progress
    spectral_weight = 0.1 + 0.4 * progress
    energy_weight = 0.3 + 0.2 * progress
    return silence_weight, spectral_weight, energy_weight
