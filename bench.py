"""End-to-end benchmark: 10 s mono clip → binaural waveform, on one chip.

Pipeline timed (production shapes, random weights — throughput is
weight-independent), faithful to the production glue
(/root/reference/DiffBinaural/test_realBinaural.py:137-211 +
/root/reference/BigVGAN/inference_e2e.py:114-206):

  stage 1: 25-step DDIM over all 21 80-frame mel windows of the clip
           (batched through the UNet, bf16 matmuls)
  stitch : denormalise → 8-frame edge crop → overlap-average scatter-add,
           ON DEVICE, consuming the stage-1 predictions
  stage 2: BigVGAN 256× vocoder on the stitched 2-channel full-clip mel
  fetch  : host sync on the waveform sum — the wav depends on the stitch,
           which depends on every DDIM window, so the single fetch fences
           the entire pipeline (block_until_ready lies on tunneled
           backends; a host fetch is the only hard sync).

The visual encoder is NOT timed (matching the A100 anchor below, which
also counts only UNet passes + vocoder; the reference precomputes/shares
frozen CLIP features outside its reported per-sample latency). The JSON
line records this.

Prints ONE JSON line:  {"metric", "value", "unit", "vs_baseline", ...}.

Baseline (vs_baseline=1.0): the PyTorch reference on A100-class hardware —
~0.1 s per 80-frame window × 21 windows (DiffBinaural/README.md:423) plus
the torch-path BigVGAN RTF ≈76× for 2×10 s of audio
(BigVGAN/README_original.md:233-240) ≈ 2.36 s per clip ≈ 0.42 clips/s.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

CLIP_SECONDS = 10.0
SR = 22050
HOP = 256
WINDOW = 80
STRIDE = 40
CROP = 8
DDIM_STEPS = 25
UNET_BATCH = 8  # 3 pipelined batch-8 calls measured fastest end-to-end
BASELINE_CLIPS_PER_SEC = 0.42


def main():
    from diffbinaural_tpu.core.config import VocoderConfig
    from diffbinaural_tpu.diffusion import GaussianDiffusion
    from diffbinaural_tpu.infer.stage1 import (
        denormalize_mel,
        normalize_mel,
        window_starts,
    )
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.models.bigvgan import BigVGAN

    total_frames = int(CLIP_SECONDS * SR) // HOP  # 861
    starts = window_starts(total_frames, WINDOW, STRIDE)
    n_windows = len(starts)
    n_batches = -(-n_windows // UNET_BATCH)
    n_slots = n_batches * UNET_BATCH  # pad the last batch with repeats

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    # ---- build + init on CPU (fast), transfer to the chip ----------------
    unet = AudioVisualModel(dim=64, dtype=jnp.bfloat16)
    voc = BigVGAN(VocoderConfig(), dtype=jnp.bfloat16)
    with jax.default_device(cpu):
        rng = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, 2, WINDOW, WINDOW))
        cond0 = (
            jnp.zeros((1, 1, WINDOW, WINDOW)),
            jnp.zeros((1, 512)),
            jnp.zeros((1, 2, WINDOW, WINDOW)),
        )
        unet_params = unet.init(rng, x0, jnp.zeros((1,), jnp.int32), cond0)
        voc_params = voc.init(rng, jnp.zeros((1, 80, 16)))
    unet_params = jax.device_put(unet_params, tpu)
    voc_params = jax.device_put(voc_params, tpu)

    diffusion = GaussianDiffusion(
        image_size=WINDOW, timesteps=1000, sampling_timesteps=DDIM_STEPS,
        beta_schedule="cosine", auto_normalize=False,
    )

    # window gather / overlap-average geometry (static)
    starts_np = np.asarray(starts, np.int32)
    count = np.zeros((total_frames,), np.float32)
    for s in starts_np:
        count[s + CROP : s + WINDOW - CROP] += 1.0
    inv_count = jnp.asarray(1.0 / np.clip(count, 1.0, None))

    @jax.jit
    def make_windows(mono_full):
        """(1, 80, T) raw ln-mel → (n_slots, 1, 80, WINDOW) normalised."""
        wins = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(mono_full, s, WINDOW, axis=2)
                for s in starts_np
            ]
        )
        pad = jnp.broadcast_to(
            wins[-1:], (n_slots - n_windows,) + wins.shape[1:]
        )
        return normalize_mel(jnp.concatenate([wins, pad], axis=0))

    @jax.jit
    def stage1(params, mono_norm, feat, rng):
        model_fn = lambda x, t, c: unet.apply(params, x, t, c)
        return diffusion.ddim_sample(model_fn, (mono_norm, feat), rng)

    @jax.jit
    def stitch(preds):
        """(n_slots, 2, 80, WINDOW) normalised preds → (2, 80, T) ln-mels.

        The production crop-and-average (infer/stage1.generate_clip), but on
        device: 8-frame edge crops, scatter-add, divide by overlap count.
        """
        preds = denormalize_mel(preds[:n_windows])
        mel = jnp.zeros((2, 80, total_frames), preds.dtype)
        for i, s in enumerate(starts_np):
            mel = jax.lax.dynamic_update_slice_in_dim(
                mel,
                jax.lax.dynamic_slice_in_dim(
                    mel, s + CROP, WINDOW - 2 * CROP, axis=2
                )
                + preds[i, :, :, CROP : WINDOW - CROP],
                s + CROP,
                axis=2,
            )
        return mel * inv_count[None, None, :]

    @jax.jit
    def stage2(params, mel):
        return voc.apply(params, mel)

    # distinct inputs per call — rules out any result caching in the stack
    rng_np = np.random.default_rng(0)

    def fresh_clip():
        mono = rng_np.standard_normal((1, 80, total_frames)) - 6.0
        feat = rng_np.standard_normal((n_slots, 512))
        return (
            jnp.asarray(mono.astype(np.float32)),
            jnp.asarray(feat.astype(np.float32)),
        )

    key = jax.random.PRNGKey(13)

    # NOTE: completion is forced by fetching a scalar to the host —
    # block_until_ready() alone does NOT guarantee remote execution has
    # finished on tunneled TPU backends, which silently turns a benchmark
    # into a dispatch-latency measurement.
    def sync(x):
        return float(jnp.sum(x))

    def run_clip(mono_full, feat, key):
        wins = make_windows(mono_full)
        preds = []
        for bi in range(n_batches):
            sl = slice(bi * UNET_BATCH, (bi + 1) * UNET_BATCH)
            preds.append(
                stage1(unet_params, wins[sl], feat[sl], jax.random.fold_in(key, bi))
            )
        mel = stitch(jnp.concatenate(preds, axis=0))
        return stage2(voc_params, mel)

    # ---- warmup (compile) ------------------------------------------------
    mono, feat = fresh_clip()
    sync(run_clip(mono, feat, key))

    # ---- timed runs ------------------------------------------------------
    # one host fetch per clip; wav ← stitch ← all stage-1 windows, so the
    # fetch fences the whole pipeline
    n_iters = 5
    inputs = [fresh_clip() for _ in range(n_iters)]
    t0 = time.time()
    for it in range(n_iters):
        mono, feat = inputs[it]
        wav = run_clip(mono, feat, jax.random.fold_in(key, 1000 + it))
        sync(wav)
    elapsed = (time.time() - t0) / n_iters

    clips_per_sec = 1.0 / elapsed
    print(
        json.dumps(
            {
                "metric": "e2e_10s_clips_per_sec",
                "value": round(clips_per_sec, 4),
                "unit": "clips/s/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
                "pipeline": "mono_mel->windows->ddim25->stitch->vocoder->wav",
                "visual_encoder_included": False,
            }
        )
    )


if __name__ == "__main__":
    main()
