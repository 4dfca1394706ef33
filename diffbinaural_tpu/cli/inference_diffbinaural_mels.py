"""Batch vocoding of DiffBinaural-generated mel dirs through BinauralBigVGAN.

CLI parity with /root/reference/BigVGAN/inference_diffbinaural_mels.py
(:83-190): separate left/right mel dirs matched by basename, clip-protected
int16 stereo output.
Run: python -m diffbinaural_tpu.cli.inference_diffbinaural_mels ...
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
    from ..data.audio_io import save_wav
    from ..models.bigvgan import BinauralBigVGAN

    parser = argparse.ArgumentParser()
    parser.add_argument("--input_mels_left_dir", required=True)
    parser.add_argument("--input_mels_right_dir", required=True)
    parser.add_argument("--output_dir", default="generated_diffbinaural")
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--use_cuda_kernel", action="store_true",
                        default=False)
    a = parser.parse_args(argv)

    config_path = os.path.join(os.path.dirname(a.checkpoint_file),
                               "config.json")
    h = load_hparams_from_json(config_path)
    # the reference reads hop_length/win_length/n_mels here — accept both
    # key spellings (SURVEY §2.4 note on inference_diffbinaural_mels.py:182-185)
    sr = h.get("sampling_rate", 22050)
    cfg = VocoderConfig.from_attrdict(
        {**h, "num_mels": h.get("num_mels", h.get("n_mels", 80))}
    )
    model = BinauralBigVGAN(cfg)

    state = ckpt.load_checkpoint(a.checkpoint_file)
    gen = state["generator"] if "generator" in state else state
    params = {"params": {"generator": gen["params"] if "params" in gen else gen}}
    apply = jax.jit(lambda p, l, r: model.apply(p, l, r))

    os.makedirs(a.output_dir, exist_ok=True)
    for lp in sorted(glob.glob(os.path.join(a.input_mels_left_dir, "*.npy"))):
        base = os.path.basename(lp)[: -len(".npy")]
        rp = os.path.join(a.input_mels_right_dir, base + ".npy")
        if not os.path.exists(rp):
            print(f"[WARNING] missing right mel for {base}")
            continue
        y = np.asarray(
            apply(params, jnp.asarray(np.load(lp)[None]),
                  jnp.asarray(np.load(rp)[None]))
        )[0]
        y = np.clip(y, -1.0, 1.0)  # clip-protected write (:93-99)
        out = os.path.join(a.output_dir, base + "_binaural_generated.wav")
        save_wav(out, y, sr)
        print(f"{base}: {y.shape} → {out}")


if __name__ == "__main__":
    main()
