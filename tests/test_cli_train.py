"""CLI-level trainer smoke tests on the tiny synthetic world: one epoch of
train_realbinaural's driver path (Stage1Trainer), checkpoints + resume."""

import csv
import os

import numpy as np
import pytest

from diffbinaural_tpu.data.audio_io import save_wav

# ~25 min on the virtual CPU mesh (CPU-side 80x80 attention in the eval
# DDIM dominates); run with DIFFBINAURAL_SLOW_TESTS=1
pytestmark = pytest.mark.skipif(
    not os.environ.get("DIFFBINAURAL_SLOW_TESTS"),
    reason="slow CLI trainer smoke test (set DIFFBINAURAL_SLOW_TESTS=1)",
)

SR = 22050


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliworld")
    mono = root / "processed" / "mono_audios_22050Hz"
    binaural = root / "processed" / "binaural_audios_22050Hz"
    mono.mkdir(parents=True)
    binaural.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t = np.arange(SR) / SR
    for vid in ("a", "b"):
        x = (0.3 * np.sin(2 * np.pi * 440 * t)
             + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        save_wav(str(mono / f"{vid}.wav"), x, SR)
        save_wav(str(binaural / f"{vid}.wav"), np.stack([x, 0.8 * x]), SR)
    splits = root / "splits"
    splits.mkdir()
    for name in ("train", "val"):
        with open(splits / f"{name}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["video_id", "start_time", "end_time", "action_label"])
            w.writerow(["a", "0.0", "1.0", "x"])
            w.writerow(["b", "0.0", "1.0", "x"])
    return root


def test_stage1_trainer_epoch_checkpoint_resume(world, tmp_path):
    from diffbinaural_tpu.cli.arguments import ArgParser
    from diffbinaural_tpu.cli.common import Stage1Trainer
    from diffbinaural_tpu.core.config import CLIPConfig
    from diffbinaural_tpu.data import DataLoader, RealBinauralDataset
    from diffbinaural_tpu.diffusion import GaussianDiffusion

    args = ArgParser().parse_train_arguments([
        "--id", "smoke",
        "--arch_frame", "clip_pos2d",
        "--ckpt", str(tmp_path),
        "--list_train", str(world / "splits" / "train.csv"),
        "--list_val", str(world / "splits" / "val.csv"),
        "--data_root", str(world),
        "--num_epoch", "1",
        "--batch_size_per_gpu", "2",
        "--workers", "1",
        "--eval_epoch", "1",
        "--num_frames", "1",
    ])
    args.unet_dim = 16
    args.clip_config = CLIPConfig(image_size=224, patch_size=112, width=32,
                                  layers=1, heads=2)

    common = dict(data_root=args.data_root, detection_csv=None,
                  sample_rate=SR, n_mels=80, num_frames=1, max_sources=2)
    ds_train = RealBinauralDataset(csv_file=args.list_train, split="train",
                                   **common)
    ds_val = RealBinauralDataset(csv_file=args.list_val, split="val", **common)
    lt = DataLoader(ds_train, batch_size=2, shuffle=False, num_workers=1)
    lv = DataLoader(ds_val, batch_size=2, shuffle=False, drop_last=False,
                    num_workers=1)

    trainer = Stage1Trainer(args, ds_train, ds_val, mel_key="mono_mel")
    # shrink the DDIM for the eval pass
    trainer.diffusion = GaussianDiffusion(
        image_size=80, timesteps=50, sampling_timesteps=2,
        auto_normalize=False,
    )
    from diffbinaural_tpu.infer.stage1 import Stage1Sampler

    trainer.sampler = Stage1Sampler(trainer._sample_apply, trainer.diffusion)
    init_fn, step_fn = __import__(
        "diffbinaural_tpu.train", fromlist=["make_stage1_train_step"]
    ).make_stage1_train_step(
        unet_apply=trainer.unet_apply, visual_apply=trainer.visual_apply,
        diffusion=trainer.diffusion, donate=False,
    )
    trainer._init_fn = init_fn
    trainer.step_fn = step_fn

    first = next(iter(lt))
    trainer.init_params(first)
    trainer.try_resume()  # nothing yet — must be a no-op
    assert trainer.start_epoch == 0

    trainer.fit(lt, lv)

    exp = tmp_path / "smoke"
    files = sorted(os.listdir(exp))
    assert "frame_latest.pth" in files and "unet_latest.pth" in files
    assert "frame_best.pth" in files and "unet_best.pth" in files
    assert "frame_000000" in files and "history_000000" in files

    # fresh trainer resumes from the numbered checkpoint
    trainer2 = Stage1Trainer(args, ds_train, ds_val, mel_key="mono_mel")
    trainer2._init_fn = init_fn
    trainer2.init_params(first)
    trainer2.try_resume()
    assert trainer2.start_epoch == 1
