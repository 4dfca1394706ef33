"""Stage-1 inference: mono log-mel (+ visual features) → binaural log-mels.

Capability parity with the reference NetWrapper sample/generate paths:

  * normalisation: clamp ln-mels to [-12, 2.5] then affine to [-1, 1]
    (/root/reference/DiffBinaural/train_fairplay.py:124-129, constants
    :67-68); inverted after sampling (:182-186)
  * ``sample``: 25-step DDIM with the mono mel duplicated as 2-channel
    condition and a noised-mix carried per step
    (train_realBinaural.py:141-190 → diffusion_pytorch.py:311-371)
  * ``generate_clip``: full-clip windowed generation with 8-frame edge
    crops and overlap averaging (test_realBinaural.py:137-211)

TPU design: all windows of a clip run as ONE batched DDIM scan (the
reference loops windows serially on a single GPU); the overlap-average is a
scatter-add expressed with a static index map.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import GaussianDiffusion

MEL_MIN = -12.0
MEL_MAX = 2.5


def normalize_mel(x: jnp.ndarray, lo: float = MEL_MIN, hi: float = MEL_MAX):
    """clamp + affine to [-1, 1] (reference train_fairplay.py:124-129)."""
    x = jnp.clip(x, lo, hi)
    return 2.0 * (x - lo) / (hi - lo) - 1.0


def denormalize_mel(x: jnp.ndarray, lo: float = MEL_MIN, hi: float = MEL_MAX):
    """[-1, 1] → raw ln-mel range (reference train_fairplay.py:182-186)."""
    return (x + 1.0) * 0.5 * (hi - lo) + lo


class Stage1Sampler:
    """Bundles the denoiser apply-fn with the diffusion engine.

    model_apply(params, x, t, condition) → prediction; condition is
    (mix, visual_feature, mix_t), all in normalised [-1, 1] space.
    """

    def __init__(
        self,
        model_apply: Callable,
        diffusion: Optional[GaussianDiffusion] = None,
        sampling_timesteps: int = 25,
        sampler: str = "ddim",
    ):
        """``sampler``: 'ddim' (reference parity, 25 steps) or 'dpm++'
        (DPM-Solver++(2M) — matched quality at ~half the steps; pair with
        ``sampling_timesteps≈12``)."""
        if sampler not in ("ddim", "dpm++"):
            raise ValueError(f"unknown sampler {sampler!r}")
        self.diffusion = diffusion or GaussianDiffusion(
            image_size=80,
            timesteps=1000,
            sampling_timesteps=sampling_timesteps,
            loss_type="l1",
            objective="pred_noise",
            beta_schedule="cosine",
            auto_normalize=False,
        )
        self.model_apply = model_apply
        self.sampler = sampler
        self._jit_sample = jax.jit(self._sample_impl)

    def _sample_impl(self, params, mono_mel_norm, visual_feat, rng):
        model_fn = lambda x, t, cond: self.model_apply(params, x, t, cond)
        sample = (
            self.diffusion.dpm_sample
            if self.sampler == "dpm++"
            else self.diffusion.ddim_sample
        )
        pred = sample(
            model_fn, (mono_mel_norm, visual_feat), rng,
            return_all_timesteps=False,
        )
        return pred

    def sample(
        self,
        params,
        mono_mel: jnp.ndarray,
        visual_feat: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """mono_mel: (B, 1, 80, 80) raw ln-mels → (B, 2, 80, 80) raw ln-mels.

        Default rng seed 13 mirrors the reference's fixed sampling seed
        (diffusion_pytorch.py:295)."""
        if rng is None:
            rng = jax.random.PRNGKey(13)
        mono_norm = normalize_mel(mono_mel)
        pred = self._jit_sample(params, mono_norm, visual_feat, rng)
        return denormalize_mel(pred)


def window_starts(total_frames: int, window: int = 80, stride: int = 40):
    """Start offsets covering [0, total); the final window is right-aligned."""
    if total_frames <= window:
        return [0]
    starts = list(range(0, total_frames - window + 1, stride))
    if starts[-1] != total_frames - window:
        starts.append(total_frames - window)
    return starts


def crop_spans(starts, total_frames: int, window: int = 80,
               crop_frames: int = 8):
    """Per-window kept span ``(lo, hi)`` within the window — the reference's
    8-frame edge crop, middle half for short segments
    (test_realBinaural.py:177-205).  Shared by the host path
    (:func:`generate_clip`) and the fused device path
    (infer.pipeline.BinauralPipeline) so the parity-critical rule cannot
    drift between them."""
    spans = []
    for s in starts:
        t = min(window, total_frames - s)
        if t > 2 * crop_frames:
            lo, hi = crop_frames, t - crop_frames
        else:
            lo, hi = t // 4, t - t // 4
        spans.append((lo, hi))
    return spans


def generate_clip(
    sampler: Stage1Sampler,
    params,
    mono_mel_full: np.ndarray,
    visual_feats: np.ndarray,
    window: int = 80,
    stride: int = 40,
    crop_frames: int = 8,
    rng: Optional[jax.Array] = None,
    max_batch: int = 32,
) -> np.ndarray:
    """Full-clip generation (reference test_realBinaural.py:137-211).

    mono_mel_full: (1, num_mels, T) raw ln-mels of the whole clip;
    visual_feats: (n_windows, 512) per-window conditioning (or (512,) shared).
    Returns (2, num_mels, T) overlap-averaged ln-mels; frames never covered
    by a cropped window stay at 0 (the evaluators trim 8 frames per side,
    reference evaluate_mel_spectrogram_rmse.py:116-119).
    """
    _, m, total = mono_mel_full.shape
    starts = window_starts(total, window, stride)
    n = len(starts)

    if total < window:  # pad short clips up to one window
        pad = window - total
        mono_mel_full = np.pad(
            mono_mel_full, ((0, 0), (0, 0), (0, pad)), constant_values=MEL_MIN
        )

    windows = np.stack(
        [mono_mel_full[:, :, s : s + window] for s in starts], axis=0
    )  # (n, 1, m, window)
    if visual_feats.ndim == 1:
        visual_feats = np.broadcast_to(visual_feats, (n, visual_feats.shape[0]))

    preds = []
    for i in range(0, n, max_batch):
        batch = jnp.asarray(windows[i : i + max_batch])
        feats = jnp.asarray(visual_feats[i : i + max_batch])
        preds.append(np.asarray(sampler.sample(params, batch, feats, rng)))
    preds = np.concatenate(preds, axis=0)  # (n, 2, m, window)

    mel = np.zeros((2, m, total), dtype=np.float32)
    count = np.zeros((2, m, total), dtype=np.float32)
    for s, (lo, hi), pred in zip(starts, crop_spans(starts, total, window,
                                                    crop_frames), preds):
        mel[:, :, s + lo : s + hi] += pred[:, :, lo:hi]
        count[:, :, s + lo : s + hi] += 1.0
    return mel / np.clip(count, 1.0, None)
