"""Legacy position-conditioned tester (log1p normalisation path).

CLI parity with /root/reference/DiffBinaural/test_pos.py (:222-255): the
older NetWrapper normalisation — log1p(mel)·0.167 in, exp(|pred|/0.167)−1
out (:90-91, :132-133, scale :52), 50 DDIM steps (:44),
silence_mask_sampling=True (:128), overlap-average WITHOUT edge cropping
(:146-177), numbered checkpoints frame_%06d/unet_%06d (:249-250).
Run: python -m diffbinaural_tpu.cli.test_pos --mode test ...
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

LOG_SCALE = 0.167  # (reference test_pos.py:52)


def legacy_normalize(mel_linear: np.ndarray) -> np.ndarray:
    return np.log1p(mel_linear) * LOG_SCALE


def legacy_denormalize(pred: np.ndarray) -> np.ndarray:
    return np.exp(np.abs(pred) / LOG_SCALE) - 1.0


def generate_legacy(sampler, params, dataset, rng=None):
    """Overlap-average WITHOUT cropping (reference :146-177)."""
    total = dataset.total_time_frame
    m = dataset.n_mels
    mel = np.zeros((2, m, total), np.float32)
    count = np.zeros((2, m, total), np.float32)
    for i in range(len(dataset)):
        item = dataset[i]
        mono_lin = item["mono_mel"]  # linear mel (GenAudioPosDataset)
        norm = legacy_normalize(mono_lin)
        pred = sampler._jit_sample(
            params, jnp.asarray(norm[None]), jnp.zeros((1, 512)),
            rng if rng is not None else jax.random.PRNGKey(13),
        )
        pred = legacy_denormalize(np.asarray(pred)[0])
        start = int(item["start_time_frame"])
        t = min(pred.shape[-1], total - start)
        mel[:, :, start : start + t] += pred[:, :, :t]
        count[:, :, start : start + t] += 1.0
    return mel / np.clip(count, 1.0, None)


def main(argv=None):
    from .arguments import ArgParser
    from ..core import checkpoint as ckpt
    from ..data import GenAudioPosDataset
    from ..data.stage1 import load_split_csv
    from ..diffusion import GaussianDiffusion
    from ..infer.stage1 import Stage1Sampler
    from ..models import AudioVisualModel

    args = ArgParser().parse_test_arguments(argv)
    net_unet = AudioVisualModel(dim=64)
    diffusion = GaussianDiffusion(
        image_size=80, timesteps=1000, sampling_timesteps=50,  # (:44)
        beta_schedule="cosine", auto_normalize=False,
    )
    sampler = Stage1Sampler(
        lambda p, x, t, c: net_unet.apply(p["unet"], x, t, c), diffusion,
        sampling_timesteps=50,
    )
    exp_dir = os.path.join(args.ckpt, args.id)
    unet_cp = args.weights_unet or ckpt.scan_checkpoint(exp_dir, "unet_0")
    params = {"unet": ckpt.load_checkpoint(unet_cp)}

    os.makedirs(args.output_dir_left, exist_ok=True)
    os.makedirs(args.output_dir_right, exist_ok=True)
    for row in load_split_csv(args.list_test):
        vid = row["video_id"]
        wav = vid if os.path.exists(vid) else os.path.join(
            args.data_root, vid + ".wav"
        )
        ds = GenAudioPosDataset(wav, n_mels=args.num_mels)
        mel = generate_legacy(sampler, params, ds)
        base = os.path.splitext(os.path.basename(wav))[0]
        np.save(os.path.join(args.output_dir_left, base + ".npy"), mel[0])
        np.save(os.path.join(args.output_dir_right, base + ".npy"), mel[1])
        print(f"{vid}: {mel.shape}")


if __name__ == "__main__":
    main()
