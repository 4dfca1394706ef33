"""Binaural vocoder inference through BinauralBigVGAN.

CLI parity with /root/reference/BigVGAN/inference_binaural.py (:59-188) —
three input modes: paired ``*_left.npy``/``*_right.npy`` dir, stereo-wav dir
with on-the-fly mels, or a single L/R npy pair.  The BinauralBigVGAN model
itself is the reconstruction of the repo's missing ``bigvgan_binaural``
module (models.bigvgan.BinauralBigVGAN, SURVEY §2.8).
Run: python -m diffbinaural_tpu.cli.inference_binaural --checkpoint_file ...
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from ..core import checkpoint as ckpt
    from ..core.config import VocoderConfig, load_hparams_from_json
    from ..data.audio_io import load_wav, save_wav
    from ..models.bigvgan import BinauralBigVGAN
    from ..signal.stft import mel_spectrogram

    parser = argparse.ArgumentParser()
    parser.add_argument("--input_mels_dir", default=None,
                        help="dir of paired *_left.npy / *_right.npy")
    parser.add_argument("--input_wavs_dir", default=None,
                        help="dir of stereo wavs (mels computed on the fly)")
    parser.add_argument("--input_left_mel", default=None)
    parser.add_argument("--input_right_mel", default=None)
    parser.add_argument("--output_dir", default="generated_binaural")
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--use_cuda_kernel", action="store_true",
                        default=False)
    a = parser.parse_args(argv)

    config_path = os.path.join(os.path.dirname(a.checkpoint_file),
                               "config.json")
    h = load_hparams_from_json(config_path)
    cfg = VocoderConfig.from_attrdict(h)
    model = BinauralBigVGAN(cfg)

    state = ckpt.load_checkpoint(a.checkpoint_file)
    gen = state["generator"] if "generator" in state else state
    params = {"params": {"generator": gen["params"] if "params" in gen else gen}}
    apply = jax.jit(lambda p, l, r: model.apply(p, l, r))

    os.makedirs(a.output_dir, exist_ok=True)

    def vocode_pair(mel_l, mel_r, base):
        y = np.asarray(
            apply(params, jnp.asarray(mel_l[None]), jnp.asarray(mel_r[None]))
        )[0]
        out = os.path.join(a.output_dir, base + "_generated.wav")
        save_wav(out, y, h["sampling_rate"])
        print(f"{base}: {y.shape} → {out}")

    if a.input_left_mel and a.input_right_mel:
        base = os.path.basename(a.input_left_mel).replace("_left.npy", "")
        vocode_pair(np.load(a.input_left_mel), np.load(a.input_right_mel), base)
    elif a.input_mels_dir:
        for lp in sorted(glob.glob(os.path.join(a.input_mels_dir,
                                                "*_left.npy"))):
            rp = lp.replace("_left.npy", "_right.npy")
            if os.path.exists(rp):
                base = os.path.basename(lp).replace("_left.npy", "")
                vocode_pair(np.load(lp), np.load(rp), base)
    elif a.input_wavs_dir:
        for wp in sorted(glob.glob(os.path.join(a.input_wavs_dir, "*.wav"))):
            wav, _ = load_wav(wp, target_sr=h["sampling_rate"])
            if wav.ndim == 1:
                wav = np.stack([wav, wav])
            mel = np.asarray(
                mel_spectrogram(
                    jnp.asarray(wav), h["n_fft"], h["num_mels"],
                    h["sampling_rate"], h["hop_size"], h["win_size"],
                    h["fmin"], h["fmax"],
                )
            )
            base = os.path.splitext(os.path.basename(wp))[0]
            vocode_pair(mel[0], mel[1], base)
    else:
        parser.error("provide --input_mels_dir, --input_wavs_dir, or the "
                     "--input_left_mel/--input_right_mel pair")


if __name__ == "__main__":
    main()
