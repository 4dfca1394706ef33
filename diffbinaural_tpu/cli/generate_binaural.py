"""One-command mono wav → binaural stereo wav over the fused pipeline.

The reference needs two processes and an intermediate .npy mel dump for
this (/root/reference/DiffBinaural/test_realBinaural.py:222-313 →
/root/reference/BigVGAN/inference_e2e.py:209-241); here the whole chain —
mel frontend → windowed 25-step DDIM → on-device stitch → BigVGAN — runs
through ``infer.pipeline.BinauralPipeline`` as one jitted dispatch per
clip.  Clip lengths are bucketed (padded up to ``--bucket_frames``) so XLA
compiles once per bucket.

Visual conditioning: ``--visual_feats`` loads per-clip (512,) or
(n_windows, 512) .npy features (e.g. precomputed CLIP embeddings, the
reference's own workflow); without it the model runs condition-free
(zeros), matching classifier-free guidance's null token.

Run: python -m diffbinaural_tpu.cli.generate_binaural \
       --input_wav clips/ --output_dir out \
       --weights_unet ckpt/unet_best.pth \
       --vocoder_checkpoint ckpt2/g_05000000
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_wav", required=True,
                        help="a .wav file or a directory of them")
    parser.add_argument("--output_dir", default="generated_binaural")
    parser.add_argument("--weights_unet", required=True)
    parser.add_argument("--vocoder_checkpoint", required=True,
                        help="BigVGAN generator ckpt; config.json beside it")
    parser.add_argument("--visual_feats", default=None,
                        help=".npy (512,) or (n_windows, 512); or a dir of "
                             "{base}.npy matching the input wavs")
    parser.add_argument("--ddim_steps", default=25, type=int,
                        help="stage-1 solver steps (model evals per window)")
    parser.add_argument("--sampler", default="ddim",
                        choices=("ddim", "dpm++"),
                        help="'ddim' = reference parity; 'dpm++' = "
                             "DPM-Solver++(2M), matched solver accuracy at "
                             "~half the steps (pair with --ddim_steps 12)")
    parser.add_argument("--unet_batch", default=8, type=int)
    parser.add_argument("--unet_dim", default=64, type=int)
    parser.add_argument("--bucket_frames", default=64, type=int)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 matmuls (TPU inference default policy)")
    a = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core import checkpoint as ckpt
    from ..core.config import VocoderConfig, load_hparams_from_json
    from ..data.audio_io import load_wav, save_wav
    from ..infer.pipeline import BinauralPipeline
    from ..models import AudioVisualModel
    from ..models.bigvgan import BigVGAN
    from ..signal.stft import mel_spectrogram

    dtype = jnp.bfloat16 if a.bf16 else jnp.float32
    unet = AudioVisualModel(dim=a.unet_dim, dtype=dtype)
    unet_params = {"unet": ckpt.load_checkpoint(a.weights_unet)}

    h = load_hparams_from_json(
        os.path.join(os.path.dirname(a.vocoder_checkpoint), "config.json")
    )
    cfg = VocoderConfig.from_attrdict(h)
    voc = BigVGAN(cfg, dtype=dtype)
    state = ckpt.load_checkpoint(a.vocoder_checkpoint)
    voc_params = state["generator"] if (
        isinstance(state, dict) and "generator" in state
    ) else state

    sr, hop = int(h["sampling_rate"]), int(h["hop_size"])

    paths = (sorted(glob.glob(os.path.join(a.input_wav, "*.wav")))
             if os.path.isdir(a.input_wav) else [a.input_wav])
    os.makedirs(a.output_dir, exist_ok=True)

    pipes = {}  # one compiled program per length bucket

    def pipe_for(frames: int) -> BinauralPipeline:
        bucket = -(-frames // a.bucket_frames) * a.bucket_frames
        if bucket not in pipes:
            pipes[bucket] = BinauralPipeline(
                unet_apply=lambda p, x, t, c: unet.apply(p["unet"], x, t, c),
                voc_apply=lambda p, mel: voc.apply(p, mel),
                total_frames=bucket,
                num_mels=cfg.num_mels,
                unet_batch=a.unet_batch,
                sampling_timesteps=a.ddim_steps,
                sampler=a.sampler,
            )
        return pipes[bucket]

    for path in paths:
        base = os.path.basename(path)[: -len(".wav")]
        audio, in_sr = load_wav(path)
        if in_sr != sr:
            raise SystemExit(f"{path}: expected {sr} Hz, got {in_sr} "
                             "(resample first, e.g. data.audio_io.resample)")
        mono = audio.mean(axis=0) if audio.ndim == 2 else audio
        frames = len(mono) // hop
        mel = np.asarray(
            mel_spectrogram(
                jnp.asarray(mono[None, : frames * hop]),
                int(h["n_fft"]), cfg.num_mels, sr, hop,
                int(h["win_size"]), float(h.get("fmin", 0.0) or 0.0),
                h.get("fmax"),
            )
        )[..., :frames]  # (1, num_mels, frames)

        pipe = pipe_for(frames)
        pad = pipe.total_frames - frames
        if pad:
            mel = np.pad(mel, ((0, 0), (0, 0), (0, pad)),
                         constant_values=np.log(1e-5))

        if a.visual_feats is None:
            feats = np.zeros((512,), np.float32)
        else:
            fp = (os.path.join(a.visual_feats, base + ".npy")
                  if os.path.isdir(a.visual_feats) else a.visual_feats)
            feats = np.load(fp).astype(np.float32)

        wav = np.asarray(
            pipe(unet_params, voc_params, jnp.asarray(mel), feats)
        )[:, : frames * hop]
        out = os.path.join(a.output_dir, base + "_binaural_generated.wav")
        save_wav(out, wav, sr)
        print(f"{base}: {wav.shape} → {out}")


if __name__ == "__main__":
    main()
