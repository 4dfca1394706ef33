"""Full-pipeline integration test on a tiny synthetic dataset:

  stage-1 train (few steps) → mel dump with overlap-average → stage-2 GAN
  train (few steps) → e2e vocoder inference → metric battery.

Everything runs at toy sizes on the CPU mesh; this exercises the same code
paths as the production CLIs (the reference's de-facto verification is
test_realBinaural_few + the eval scripts — SURVEY §4)."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbinaural_tpu.core.config import AttrDict, VocoderConfig
from diffbinaural_tpu.data.audio_io import save_wav

SR = 22050


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory):
    """Synthetic dataset: 2 clips of 1.5 s stereo + mono + split CSVs."""
    root = tmp_path_factory.mktemp("world")
    mono_dir = root / "processed" / "mono_audios_22050Hz"
    bin_dir = root / "processed" / "binaural_audios_22050Hz"
    mono_dir.mkdir(parents=True)
    bin_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * 1.5)) / SR
    for vid, f0 in (("clip1", 330.0), ("clip2", 550.0)):
        x = (0.4 * np.sin(2 * np.pi * f0 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        save_wav(str(mono_dir / f"{vid}.wav"), x, SR)
        save_wav(str(bin_dir / f"{vid}.wav"),
                 np.stack([0.9 * x, 0.7 * x]), SR)
    splits = root / "splits"
    splits.mkdir()
    for name in ("train", "val"):
        with open(splits / f"{name}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["video_id", "start_time", "end_time", "action_label"])
            w.writerow(["clip1", "0.0", "1.5", "tone"])
            w.writerow(["clip2", "0.0", "1.5", "tone"])
    return root


@pytest.mark.slow
def test_full_pipeline(tiny_world, tmp_path):
    # ---------------- stage 1: a few diffusion train steps ----------------
    from diffbinaural_tpu.data import DataLoader, RealBinauralDataset
    from diffbinaural_tpu.diffusion import GaussianDiffusion
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.train import make_stage1_train_step

    ds = RealBinauralDataset(
        csv_file=str(tiny_world / "splits" / "train.csv"),
        data_root=str(tiny_world), split="train", num_frames=2,
    )
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(loader))

    unet = AudioVisualModel(dim=16)
    rng = jax.random.PRNGKey(0)
    mono = jnp.asarray(batch["mono_mel"])
    target = jnp.asarray(batch["binaural_mel"])
    params = {
        "unet": unet.init(
            rng, target, jnp.zeros((2,), jnp.int32),
            (mono, jnp.zeros((2, 512)), jnp.zeros_like(target)),
        )
    }
    diffusion = GaussianDiffusion(
        image_size=80, timesteps=100, sampling_timesteps=4,
        auto_normalize=False,
    )
    init_fn, step_fn = make_stage1_train_step(
        unet_apply=lambda p, x, t, c: unet.apply(p, x, t, c),
        diffusion=diffusion, lr_unet=1e-3, donate=False,
    )
    state = init_fn(params)
    train_batch = {
        "mono_mel": mono, "binaural_mel": target,
        "feat": jnp.zeros((2, 512)),
    }
    for i in range(3):
        state, metrics = step_fn(state, train_batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))

    # ---------------- stage 1 → 2 bridge: mel dump ------------------------
    from diffbinaural_tpu.data import GenAudioRealBinauralDataset
    from diffbinaural_tpu.infer.stage1 import Stage1Sampler
    from diffbinaural_tpu.cli.common import dump_clip_mels

    sampler = Stage1Sampler(
        lambda p, x, t, c: unet.apply(p["unet"], x, t, c), diffusion,
        sampling_timesteps=4,
    )
    left_dir = tmp_path / "left"
    right_dir = tmp_path / "right"

    class A:  # minimal args carrier
        crop_frames = 8

    for vid in ("clip1", "clip2"):
        gen_ds = GenAudioRealBinauralDataset(
            str(tiny_world / "processed" / "mono_audios_22050Hz" / f"{vid}.wav"),
            stride=40,
        )
        mel = dump_clip_mels(A(), sampler, state.params, gen_ds,
                             str(left_dir), str(right_dir))
        assert mel.shape[0] == 2 and mel.shape[1] == 80
        assert np.isfinite(mel).all()
    assert sorted(os.listdir(left_dir)) == ["clip1.npy", "clip2.npy"]

    # ---------------- stage 2: a few GAN train steps ----------------------
    from diffbinaural_tpu.data import BinauralMelSpectrogramDataset
    from diffbinaural_tpu.losses import MultiScaleMelSpectrogramLoss
    from diffbinaural_tpu.models.bigvgan import BigVGAN
    from diffbinaural_tpu.models.discriminators import (
        MultiPeriodDiscriminator,
        MultiResolutionDiscriminator,
    )
    from diffbinaural_tpu.signal.stft import mel_spectrogram
    from diffbinaural_tpu.train import make_stage2_train_step

    voc_cfg = VocoderConfig(
        num_mels=80, upsample_rates=(4, 4, 4, 4),
        upsample_kernel_sizes=(8, 8, 8, 8), upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    seg = 4096  # 16 mel frames × 256 hop
    ds2 = BinauralMelSpectrogramDataset(
        str(left_dir), str(right_dir),
        str(tiny_world / "processed" / "binaural_audios_22050Hz"),
        segment_size=seg,
    )
    assert len(ds2) == 4  # 2 files × L/R interleave
    loader2 = DataLoader(ds2, batch_size=2, shuffle=False, num_workers=1)
    b2 = next(iter(loader2))
    assert b2["mel"].shape == (2, 80, seg // 256)
    assert b2["audio"].shape == (2, seg)

    gen = BigVGAN(voc_cfg)
    mpd = MultiPeriodDiscriminator(periods=(2,), channel_mult=0.125)
    mrd = MultiResolutionDiscriminator(resolutions=((128, 32, 128),),
                                       channel_mult=0.25)
    gen_params = gen.init(rng, jnp.zeros((1, 80, 16)))
    audio0 = jnp.zeros((1, 1, seg))
    disc_params = {
        "mpd": mpd.init(rng, audio0, audio0),
        "mrd": mrd.init(rng, audio0, audio0),
    }
    msl = MultiScaleMelSpectrogramLoss(SR, n_mels=(5,), window_lengths=(32,))
    init2, step2 = make_stage2_train_step(
        gen_apply=lambda p, m: gen.apply(p, m),
        mpd_apply=lambda p, y, yh: mpd.apply(p, y, yh),
        mrd_apply=lambda p, y, yh: mrd.apply(p, y, yh),
        mel_fn=lambda w: mel_spectrogram(w, 1024, 80, SR, 256, 1024),
        multiscale_mel_loss=msl, freeze_step=1, donate=False,
    )
    state2 = init2(gen_params, disc_params)
    gan_batch = {
        "mel": jnp.asarray(b2["mel"]),
        "audio": jnp.asarray(b2["audio"]),
        "mel_loss": jnp.asarray(b2["mel_loss"]),
    }
    for _ in range(2):
        state2, m2 = step2(state2, gan_batch)
        assert np.isfinite(float(m2["loss_gen_all"]))
        assert np.isfinite(float(m2["loss_disc"]))
    assert int(state2.step) == 2

    # ---------------- e2e inference + metrics -----------------------------
    from diffbinaural_tpu.infer.vocoder import Vocoder
    from diffbinaural_tpu.evaluation.runner import evaluate_binaural_pair

    voc = Vocoder(voc_cfg, hop_size=256)
    mel_l = np.load(left_dir / "clip1.npy")
    mel_r = np.load(right_dir / "clip1.npy")
    stereo = voc.vocode_binaural(state2.gen_params, mel_l, mel_r)
    assert stereo.shape == (2, mel_l.shape[1] * 256)
    assert np.isfinite(stereo).all()

    from diffbinaural_tpu.data.audio_io import load_wav

    gt, _ = load_wav(
        str(tiny_world / "processed" / "binaural_audios_22050Hz" / "clip1.wav")
    )
    res = evaluate_binaural_pair(
        stereo[:, : gt.shape[1]], gt[:, : stereo.shape[1]], compute_bss=False
    )
    for k, v in res.items():
        assert np.isfinite(v) or k == "snr_db", k
