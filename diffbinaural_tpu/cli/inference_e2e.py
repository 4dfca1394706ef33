"""E2E vocoder inference: paired L/R mel .npy dirs → stereo wavs.

CLI parity with /root/reference/BigVGAN/inference_e2e.py (:209-241):
config.json read from next to the checkpoint (:225-231), zero-frame
silence handling (--interpolate_zero_frames, default True), outputs
{base}_binaural_generated.wav int16 stereo (:191-206).
Run: python -m diffbinaural_tpu.cli.inference_e2e --checkpoint_file ...
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(argv=None):
    from ..core import checkpoint as ckpt
    from ..core.config import VocoderConfig, load_hparams_from_json
    from ..data.audio_io import save_wav
    from ..infer.vocoder import Vocoder

    parser = argparse.ArgumentParser()
    parser.add_argument("--input_mels_left_dir", default="./mels/left_test")
    parser.add_argument("--input_mels_right_dir", default="./mels/right_test")
    parser.add_argument("--output_dir", default="generated_realbinaural_files")
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--use_cuda_kernel", action="store_true",
                        default=False, help="accepted for compatibility")
    parser.add_argument("--interpolate_zero_frames", action="store_true",
                        default=True)
    a = parser.parse_args(argv)

    config_path = os.path.join(os.path.dirname(a.checkpoint_file),
                               "config.json")
    h = load_hparams_from_json(config_path)
    cfg = VocoderConfig.from_attrdict(h)

    voc = Vocoder(cfg, hop_size=h["hop_size"])
    state = ckpt.load_checkpoint(a.checkpoint_file)
    if isinstance(state, dict) and "generator" in state:
        gen_params = state["generator"]
    else:
        gen_params = state
    # ensure proper tree types
    import jax

    gen_params = jax.tree_util.tree_map(np.asarray, gen_params)

    os.makedirs(a.output_dir, exist_ok=True)
    for left_path in sorted(
        glob.glob(os.path.join(a.input_mels_left_dir, "*.npy"))
    ):
        base = os.path.basename(left_path)[: -len(".npy")]
        right_path = os.path.join(a.input_mels_right_dir, base + ".npy")
        if not os.path.exists(right_path):
            print(f"[WARNING] missing right mel for {base}")
            continue
        mel_l = np.load(left_path)
        mel_r = np.load(right_path)
        stereo = voc.vocode_binaural(
            gen_params, mel_l, mel_r,
            interpolate_zero_frames=a.interpolate_zero_frames,
        )
        out = os.path.join(a.output_dir, base + "_binaural_generated.wav")
        save_wav(out, stereo, h["sampling_rate"])
        print(f"{base}: {stereo.shape} → {out}")


if __name__ == "__main__":
    main()
