"""CLI-level trainer smoke tests on the tiny synthetic world: one epoch of
train_realbinaural's driver path (Stage1Trainer), checkpoints + resume.

Runs unskipped: the world is shrunk to 16 mel bands x 16 frames (the
production 80x80 attention made the old version a 25-minute slow test)."""

import csv
import os

import jax
import numpy as np
import pytest

from diffbinaural_tpu.data.audio_io import save_wav

SR = 22050
MEL = 16  # bands == window frames: square mel "images" like production 80x80


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
                  sample_rate=SR, n_mels=MEL, num_frames=1, max_sources=2,
                  window_frames=MEL)
    ds_train = RealBinauralDataset(csv_file=args.list_train, split="train",
                                   **common)
    ds_val = RealBinauralDataset(csv_file=args.list_val, split="val", **common)
    lt = DataLoader(ds_train, batch_size=2, shuffle=False, num_workers=1)
    lv = DataLoader(ds_val, batch_size=2, shuffle=False, drop_last=False,
                    num_workers=1)

    trainer = Stage1Trainer(args, ds_train, ds_val, mel_key="mono_mel")
    # shrink the mel world and the DDIM for the eval pass
    trainer.diffusion = GaussianDiffusion(
        image_size=MEL, timesteps=50, sampling_timesteps=2,
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


def test_gan_trainer_steps_checkpoint_resume(tmp_path):
    """GanTrainer driver path (cli/gan_common.py): a few real steps through
    train(), g_/do_ checkpoints, and step-continuous resume — the stage-2
    equivalent of the Stage1Trainer smoke (reference
    train_binaural_mel.py:480-537, :1122-1143)."""
    from diffbinaural_tpu.cli.gan_common import GanTrainer
    from diffbinaural_tpu.core.config import AttrDict
    from diffbinaural_tpu.data import BinauralMelSpectrogramDataset, DataLoader

    left, right, audio = tmp_path / "l", tmp_path / "r", tmp_path / "a"
    for d in (left, right, audio):
        d.mkdir()
    rng = np.random.default_rng(0)
    hop, frames = 256, 40
    for vid in ("u", "v"):
        for d in (left, right):
            np.save(d / f"{vid}.npy",
                    (rng.standard_normal((16, frames)) - 6).astype(np.float32))
        save_wav(str(audio / f"{vid}.wav"),
                 0.1 * rng.standard_normal((2, frames * hop)).astype(np.float32),
                 SR)

    h = AttrDict({
        "num_mels": 16, "upsample_rates": [4, 4, 4, 4],
        "upsample_kernel_sizes": [8, 8, 8, 8], "upsample_initial_channel": 16,
        "resblock": "1", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "sampling_rate": SR, "n_fft": 512, "hop_size": hop, "win_size": 512,
        "fmin": 0, "fmax_for_loss": None,
        "learning_rate": 2e-4, "adam_b1": 0.8, "adam_b2": 0.99,
        "lr_decay": 0.999, "seed": 0, "batch_size": 2, "segment_size": 4096,
        "mpd_reshapes": [2], "discriminator_channel_mult": 0.125,
        "resolutions": [[128, 32, 128]],
    })
    a = AttrDict({
        "checkpoint_path": str(tmp_path / "ckpt"), "training_epochs": 2,
        "stdout_interval": 1, "summary_interval": 100,
        "checkpoint_interval": 2, "validation_interval": 1000,
        "freeze_step": 0, "debug": True,
    })

    ds = BinauralMelSpectrogramDataset(
        str(left), str(right), str(audio), segment_size=h.segment_size,
        n_fft=h.n_fft, num_mels=h.num_mels, hop_size=hop, win_size=h.win_size,
    )
    assert len(ds) == 4
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)

    trainer = GanTrainer(a, h)
    trainer.init_params(seg_frames=h.segment_size // hop)
    trainer.try_resume()  # empty dir — must be a no-op
    assert trainer.steps == 0
    trainer.train(loader, loader)
    assert trainer.steps == 4  # 2 epochs x 2 batches

    files = sorted(os.listdir(a.checkpoint_path))
    assert "g_00000002" in files and "do_00000002" in files
    assert "g_00000004" in files and "do_00000004" in files

    trainer2 = GanTrainer(a, h)
    trainer2.init_params(seg_frames=h.segment_size // hop)
    trainer2.try_resume()
    assert trainer2.steps == 5  # saved step 4 → resume at 5
    g0 = jax.tree_util.tree_leaves(trainer.state.gen_params)
    g1 = jax.tree_util.tree_leaves(trainer2.state.gen_params)
    assert all(np.array_equal(x, y) for x, y in zip(g0, g1))


def test_weights_warm_start_contracts(tmp_path):
    """--weights_unet loads into the init'd tree; missing --weights_frame /
    --weights_unet paths raise (the reference's torch.load would), instead
    of silently training from random init."""
    from types import SimpleNamespace

    import numpy as np
    import pytest

    from diffbinaural_tpu.cli.common import Stage1Trainer
    from diffbinaural_tpu.core import checkpoint as ckpt

    params = {"w": np.zeros(3, np.float32)}
    saved = {"w": np.arange(3, dtype=np.float32)}
    p = str(tmp_path / "unet_best.pth")
    ckpt.save_checkpoint(p, saved)

    fake = SimpleNamespace(args=SimpleNamespace(weights_unet=p))
    out = Stage1Trainer._maybe_load_unet_weights(fake, params)
    np.testing.assert_array_equal(out["w"], saved["w"])

    fake.args.weights_unet = ""
    assert Stage1Trainer._maybe_load_unet_weights(fake, params) is params

    fake.args.weights_unet = str(tmp_path / "nope.pth")
    with pytest.raises(FileNotFoundError):
        Stage1Trainer._maybe_load_unet_weights(fake, params)

    fake.args.weights_frame = str(tmp_path / "nope2.pth")
    with pytest.raises(FileNotFoundError):
        Stage1Trainer._maybe_load_frame_weights(fake, params)
