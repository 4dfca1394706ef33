"""End-to-end benchmark: 10 s mono clip → binaural waveform, on one chip.

Pipeline timed (production shapes, random weights — throughput is
weight-independent):
  stage 1: 25-step DDIM over all 80-frame mel windows of the clip,
           windows batched through one scanned UNet (bf16 matmuls)
  stage 2: BigVGAN 256× vocoder on both channels' full-clip mels

Prints ONE JSON line:  {"metric", "value", "unit", "vs_baseline"}.

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
DDIM_STEPS = 25
UNET_BATCH = 8  # 3 pipelined batch-8 calls measured fastest end-to-end
BASELINE_CLIPS_PER_SEC = 0.42


def main():
    from diffbinaural_tpu.core.config import VocoderConfig
    from diffbinaural_tpu.diffusion import GaussianDiffusion
    from diffbinaural_tpu.infer.stage1 import window_starts
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.models.bigvgan import BigVGAN

    total_frames = int(CLIP_SECONDS * SR) // HOP  # 861
    starts = window_starts(total_frames, WINDOW, STRIDE)
    n_windows = len(starts)
    n_batches = -(-n_windows // UNET_BATCH)

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

    @jax.jit
    def stage1(params, mono, feat, rng):
        model_fn = lambda x, t, c: unet.apply(params, x, t, c)
        return diffusion.ddim_sample(model_fn, (mono, feat), rng)

    @jax.jit
    def stage2(params, mel):
        return voc.apply(params, mel)

    # distinct inputs per call — rules out any result caching in the stack
    rng_np = np.random.default_rng(0)

    def fresh_inputs():
        return (
            jnp.asarray(
                rng_np.standard_normal((UNET_BATCH, 1, WINDOW, WINDOW)).astype(
                    np.float32
                )
            ),
            jnp.asarray(
                rng_np.standard_normal((UNET_BATCH, 512)).astype(np.float32)
            ),
        )

    clip_mels = jnp.asarray(
        rng_np.standard_normal((2, 80, total_frames)).astype(np.float32) - 6.0
    )
    key = jax.random.PRNGKey(13)

    # NOTE: completion is forced by fetching a scalar to the host —
    # block_until_ready() alone does NOT guarantee remote execution has
    # finished on tunneled TPU backends, which silently turns a benchmark
    # into a dispatch-latency measurement.
    def sync(x):
        return float(jnp.sum(x))

    # ---- warmup (compile) ------------------------------------------------
    mono, feat = fresh_inputs()
    sync(stage1(unet_params, mono, feat, key))
    sync(stage2(voc_params, clip_mels))

    # ---- timed runs ------------------------------------------------------
    # one host sync per iteration: the device stream is in-order, so the
    # stage-2 fetch also fences the three stage-1 calls before it
    n_iters = 5
    inputs = [
        [fresh_inputs() for _ in range(n_batches)] for _ in range(n_iters)
    ]
    t0 = time.time()
    for it in range(n_iters):
        for bi in range(n_batches):
            mono, feat = inputs[it][bi]
            pred = stage1(
                unet_params, mono, feat, jax.random.fold_in(key, it * 100 + bi)
            )
        wav = stage2(voc_params, clip_mels + it * 1e-3)
        sync(wav)
    elapsed = (time.time() - t0) / n_iters
    del pred

    clips_per_sec = 1.0 / elapsed
    print(
        json.dumps(
            {
                "metric": "e2e_10s_clips_per_sec",
                "value": round(clips_per_sec, 4),
                "unit": "clips/s/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
