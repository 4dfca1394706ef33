"""Fused whole-clip inference: mono log-mel → stereo waveform, ONE dispatch.

Functional parity with the reference's two-process pipeline
(/root/reference/DiffBinaural/test_realBinaural.py:137-211 windowed stage-1
generation with 8-frame edge crops + overlap averaging, then
/root/reference/BigVGAN/inference_e2e.py:114-206 vocoding the stitched
mels), re-designed TPU-first:

  * window extraction, the 25-step DDIM scan over all window groups, the
    denormalise/crop/overlap-average stitch AND the BigVGAN vocoder are
    traced into a SINGLE jitted program — the host dispatches once per
    clip (the per-call tunnel overhead is ~9 ms on remoted TPU backends,
    and each host sync between hand-split stages costs ~36 ms) and XLA
    schedules across stage boundaries;
  * windows run through the UNet in batched groups via ``lax.scan``
    (the reference loops windows serially on one GPU);
  * the overlap-average is a scatter-add over a static index map.

The clip geometry (total frames, window/stride/crop, batch grouping) is
static per pipeline instance, so XLA compiles one program per clip length;
callers with variable-length clips should bucket lengths (see
infer.vocoder.Vocoder for the same pattern).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion import GaussianDiffusion
from .stage1 import (
    MEL_MIN,
    crop_spans,
    denormalize_mel,
    normalize_mel,
    window_starts,
)


class BinauralPipeline:
    """mono ln-mel clip (1, num_mels, T) + per-window visual features →
    stereo waveform (2, T·hop), fused end to end.

    unet_apply(params, x, t, condition) is the stage-1 denoiser;
    voc_apply(params, mel) is the BigVGAN generator on (B, num_mels, T).
    """

    def __init__(
        self,
        unet_apply,
        voc_apply,
        total_frames: int,
        *,
        num_mels: int = 80,
        window: int = 80,
        stride: int = 40,
        crop_frames: int = 8,
        unet_batch: int = 8,
        sampling_timesteps: int = 25,
        sampler: str = "ddim",
        time_grid: Optional[str] = None,
        diffusion: Optional[GaussianDiffusion] = None,
        fuse_vocoder: bool = True,
        mesh: Optional[Mesh] = None,
    ):
        """With ``mesh``, the whole window batch runs as ONE DDIM scan
        sharded over the mesh 'data' axis (each chip denoises
        n_slots/n_data windows; XLA inserts the gather the stitch needs
        over ICI).  Pass vocoder params through
        ``parallel.shard_vocoder_params`` to channel-shard stage 2 over
        'model' as well.  unet_batch is ignored under a mesh.

        ``sampler``: 'ddim' (reference parity) or 'dpm++' (DPM-Solver++(2M)).
        ``time_grid`` selects the step discretisation ('uniform', 'powerP',
        'lambda', 'karrasR' — see GaussianDiffusion._dpm_time_pairs); None
        keeps each sampler's default (ddim: uniform = reference parity;
        dpm++: power2.5).  Production-scale solver accuracy for all
        (sampler, grid, N) combinations is recorded in VALIDATION.md —
        serve only certified combinations."""
        if sampler not in ("ddim", "dpm++"):
            raise ValueError(f"unknown sampler {sampler!r}")
        self.sampler = sampler
        self.time_grid = time_grid
        self.unet_apply = unet_apply
        self.voc_apply = voc_apply
        self.total_frames = total_frames
        self.num_mels = num_mels
        self.window = window
        self.diffusion = diffusion or GaussianDiffusion(
            image_size=window,
            timesteps=1000,
            sampling_timesteps=sampling_timesteps,
            beta_schedule="cosine",
            auto_normalize=False,
        )

        self.starts = window_starts(total_frames, window, stride)
        self.n_windows = len(self.starts)
        self.mesh = mesh
        if mesh is not None:
            n_data = mesh.shape["data"]
            self.n_batches = 1
            self.n_slots = -(-self.n_windows // n_data) * n_data
            self.unet_batch = self.n_slots
        else:
            self.n_batches = -(-self.n_windows // unet_batch)
            self.n_slots = self.n_batches * unet_batch
            self.unet_batch = unet_batch

        # per-window kept span — the same rule as the host path, via the
        # shared helper (reference test_realBinaural.py:199-205)
        self._spans = crop_spans(self.starts, total_frames, window,
                                 crop_frames)
        count = np.zeros((total_frames,), np.float32)
        for s, (lo, hi) in zip(self.starts, self._spans):
            count[s + lo : s + hi] += 1.0
        self._inv_count = jnp.asarray(1.0 / np.clip(count, 1.0, None))

        # fuse_vocoder=False splits the program at the stitched mel — two
        # dispatches per clip instead of one.  Escape hatch for compile-time
        # pathologies in very large single programs; same math either way.
        self.fuse_vocoder = fuse_vocoder
        if fuse_vocoder:
            self._run = jax.jit(self._impl)
        else:
            self._run_mel = jax.jit(self._impl_mel)
            self._run_voc = jax.jit(
                lambda vp, mel: self.voc_apply(vp, mel)
            )
            self._run = lambda up, vp, mono, feats, key: self._run_voc(
                vp, self._run_mel(up, mono, feats, key)
            )

    # ---- traced pipeline --------------------------------------------------

    def _make_windows(self, mono_full):
        """(1, M, T) raw ln-mel → (n_slots, 1, M, window) normalised; the
        final slots pad with repeats of the last window."""
        wins = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(mono_full, s, self.window, axis=2)
                for s in self.starts
            ]
        )
        if self.n_slots != self.n_windows:
            pad = jnp.broadcast_to(
                wins[-1:], (self.n_slots - self.n_windows,) + wins.shape[1:]
            )
            wins = jnp.concatenate([wins, pad], axis=0)
        return normalize_mel(wins)

    def _stitch(self, preds):
        """(n_slots, 2, M, window) normalised predictions → (2, M, T)
        ln-mels via denormalise → edge crop → overlap-average, on device."""
        preds = denormalize_mel(preds[: self.n_windows])
        mel = jnp.zeros((2, self.num_mels, self.total_frames), preds.dtype)
        for i, (s, (lo, hi)) in enumerate(zip(self.starts, self._spans)):
            mel = jax.lax.dynamic_update_slice_in_dim(
                mel,
                jax.lax.dynamic_slice_in_dim(mel, s + lo, hi - lo, axis=2)
                + preds[i, :, :, lo:hi],
                s + lo,
                axis=2,
            )
        return mel * self._inv_count[None, None, :]

    def _impl(self, unet_params, voc_params, mono_full, feats, key):
        return self.voc_apply(
            voc_params, self._impl_mel(unet_params, mono_full, feats, key)
        )

    def _impl_mel(self, unet_params, mono_full, feats, key):
        wins = self._make_windows(mono_full)
        if self.mesh is not None:  # windows sharded over the 'data' axis
            wins = jax.lax.with_sharding_constraint(
                wins, NamedSharding(self.mesh, P("data", None, None, None))
            )
            feats = jax.lax.with_sharding_constraint(
                feats, NamedSharding(self.mesh, P("data", None))
            )
        wins_g = wins.reshape(
            (self.n_batches, self.unet_batch) + wins.shape[1:]
        )
        feat_g = feats.reshape(self.n_batches, self.unet_batch, -1)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(self.n_batches)
        )

        sample = (
            self.diffusion.dpm_sample
            if self.sampler == "dpm++"
            else self.diffusion.ddim_sample
        )
        if self.time_grid is not None:
            import functools

            sample = functools.partial(sample, time_grid=self.time_grid)

        def body(_, inp):
            w, f, k = inp
            model_fn = lambda x, t, c: self.unet_apply(unet_params, x, t, c)
            return None, sample(model_fn, (w, f), k)

        _, preds = jax.lax.scan(body, None, (wins_g, feat_g, keys))
        preds = preds.reshape((self.n_slots,) + preds.shape[2:])
        return self._stitch(preds)

    # ---- host API ---------------------------------------------------------

    def __call__(
        self,
        unet_params,
        voc_params,
        mono_mel_full,
        visual_feats,
        rng: Optional[jax.Array] = None,
    ):
        """mono_mel_full: (1, num_mels, T) raw ln-mels; visual_feats:
        (n_windows, 512) per-window conditioning or (512,) shared.
        Returns the generator output on the stitched binaural mels —
        (2, 1, T·hop) squeezed to (2, T·hop)."""
        if rng is None:
            rng = jax.random.PRNGKey(13)
        mono_mel_full = jnp.asarray(mono_mel_full)
        if mono_mel_full.shape[2] != self.total_frames:
            # a mismatched clip would make dynamic_slice clamp the late
            # window starts and silently stitch predictions at wrong
            # positions — fail loudly instead
            raise ValueError(
                f"clip has {mono_mel_full.shape[2]} frames; this pipeline "
                f"was built for total_frames={self.total_frames}"
            )
        if mono_mel_full.shape[2] < self.window:  # pad short clips
            mono_mel_full = jnp.pad(
                mono_mel_full,
                ((0, 0), (0, 0), (0, self.window - mono_mel_full.shape[2])),
                constant_values=MEL_MIN,
            )
        feats = jnp.asarray(visual_feats)
        if feats.ndim == 1:
            feats = jnp.broadcast_to(feats, (self.n_slots, feats.shape[0]))
        elif feats.shape[0] == self.n_slots:
            pass
        elif feats.shape[0] == self.n_windows:  # pad with the last window's
            pad = jnp.broadcast_to(
                feats[-1:], (self.n_slots - feats.shape[0], feats.shape[1])
            )
            feats = jnp.concatenate([feats, pad], axis=0)
        else:
            raise ValueError(
                f"visual_feats has {feats.shape[0]} rows; expected "
                f"n_windows={self.n_windows} (or (512,) shared)"
            )
        wav = self._run(
            unet_params, voc_params, mono_mel_full, feats, rng
        )
        # BigVGAN emits (B, 1, samples); drop the unit channel axis
        return wav[:, 0] if wav.ndim == 3 and wav.shape[1] == 1 else wav
