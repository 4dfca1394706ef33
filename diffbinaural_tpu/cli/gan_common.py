"""Shared stage-2 GAN training driver.

Capability parity with the reference train() functions
(/root/reference/BigVGAN/train_binaural_mel.py:412-867,
train_binaural_both.py:676-1211): config-driven discriminator selection
(use_cqtd_instead_of_mrd / use_mbd_instead_of_mrd, :445-453), 3-tier
checkpoint resume (stage-2 dir → stage-1 dir → scratch, :480-537), g_%08d /
do_%08d checkpoints (:1122-1143), periodic stdout/TB/validation, per-step
LR decay inside the jitted step, and the scheduled-sampling curriculum
epoch update (:993).

The multi-process NCCL/DDP spawn collapses into the jit-over-mesh step; all
devices are driven from this single process.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core.config import AttrDict, VocoderConfig, build_env
from ..losses import MultiScaleMelSpectrogramLoss
from ..models.bigvgan import BigVGAN
from ..models.discriminators import (
    MultiBandDiscriminator,
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    MultiScaleSubbandCQTDiscriminator,
)
from ..parallel import make_mesh, shard_batch
from ..signal.stft import mel_spectrogram
from ..train import make_stage2_train_step
from ..utils import SummaryLogger


def build_discriminators(h: AttrDict, dtype=jnp.float32):
    """Config-driven discriminator pair (reference train_binaural_mel.py:445-453).

    ``dtype`` is the CONV compute dtype only; the STFT/CQT spectral
    frontends always run fp32 (``signal/stft.py`` casts frames to fp32
    before the rfft, ``signal/cqt.py`` uses preferred_element_type=f32),
    and the GAN/feature-matching losses upcast logits/fmaps to fp32
    (``losses/gan.py``) — so bf16 here only touches the conv stacks.
    Default fp32 matches the reference's AMP policy (the torch trainers
    autocast the generator but run discriminators in fp32)."""
    mpd = MultiPeriodDiscriminator(
        periods=tuple(h.get("mpd_reshapes", [2, 3, 5, 7, 11])),
        channel_mult=h.get("discriminator_channel_mult", 1),
        dtype=dtype,
    )
    if h.get("use_cqtd_instead_of_mrd", False):  # production path (json:23)
        mrd = MultiScaleSubbandCQTDiscriminator(
            sampling_rate=h["sampling_rate"],
            hop_lengths=tuple(h.get("cqtd_hop_lengths", [512, 256, 256])),
            n_octaves=tuple(h.get("cqtd_n_octaves", [9, 9, 9])),
            bins_per_octaves=tuple(h.get("cqtd_bins_per_octaves", [24, 36, 48])),
            filters=h.get("cqtd_filters", 32),
            dtype=dtype,
        )
    elif h.get("use_mbd_instead_of_mrd", False):
        mrd = MultiBandDiscriminator(
            fft_sizes=tuple(h.get("mbd_fft_sizes", [2048, 1024, 512])),
            dtype=dtype,
        )
    else:
        mrd = MultiResolutionDiscriminator(
            resolutions=tuple(tuple(r) for r in h["resolutions"]),
            channel_mult=h.get("discriminator_channel_mult", 1),
            dtype=dtype,
        )
    return mpd, mrd


class GanTrainer:
    def __init__(self, a, h: AttrDict, compute_dtype=jnp.bfloat16):
        self.a = a
        self.h = h
        self.mesh = make_mesh()
        self.cfg = VocoderConfig.from_attrdict(h)
        # bf16 matmul policy (params fp32): the TPU-idiomatic mixed
        # precision — losses/normalisation stats stay fp32 in the modules
        self.gen = BigVGAN(self.cfg, dtype=compute_dtype)
        # opt-in bf16 discriminator convs (config "discriminator_bf16").
        # Audit: tests/test_disc_bf16.py bounds the logit error and the
        # generator-gradient direction drift vs fp32.
        self.mpd, self.mrd = build_discriminators(
            h,
            dtype=jnp.bfloat16 if h.get("discriminator_bf16", False)
            else jnp.float32,
        )
        self.msl = MultiScaleMelSpectrogramLoss(h["sampling_rate"])
        self.writer = SummaryLogger(os.path.join(a.checkpoint_path, "logs"))

        def mel_fn(wav):
            return mel_spectrogram(
                wav, h["n_fft"], h["num_mels"], h["sampling_rate"],
                h["hop_size"], h["win_size"], h["fmin"],
                h.get("fmax_for_loss"),
            )

        self.mel_fn = mel_fn
        self.init_fn, self.step_fn = make_stage2_train_step(
            gen_apply=lambda p, m: self.gen.apply(p, m),
            mpd_apply=lambda p, y, yh: self.mpd.apply(p, y, yh),
            mrd_apply=lambda p, y, yh: self.mrd.apply(p, y, yh),
            mel_fn=mel_fn,
            multiscale_mel_loss=self.msl,
            learning_rate=h["learning_rate"],
            adam_b1=h["adam_b1"],
            adam_b2=h["adam_b2"],
            lr_decay=h["lr_decay"],
            clip_grad_norm=h.get("clip_grad_norm", 1000.0),
            lambda_melloss=h.get("lambda_melloss", 45.0),
            freeze_step=getattr(a, "freeze_step", 0),
            use_multiscale_melloss=h.get("use_multiscale_melloss", False),
            silence_threshold_db=h.get("silence_threshold_db", -50.0),
            # remat costs ~27% step time; only needed when the activation
            # footprint exceeds one chip (measured: B=16·seg16384 fits,
            # B=32 needs it)
            remat=h["batch_size"] * h["segment_size"] > 16 * 16384,
        )
        self.state = None
        self.steps = 0
        self.last_epoch = -1
        self._val_apply = jax.jit(lambda p, m: self.gen.apply(p, m))

    # ------------------------------------------------------------------

    def init_params(self, seg_frames: int):
        rng = jax.random.PRNGKey(self.h["seed"])
        mel = jnp.zeros((1, self.h["num_mels"], seg_frames))
        audio = jnp.zeros((1, 1, seg_frames * self.h["hop_size"]))
        gen_params = self.gen.init(rng, mel)
        disc_params = {
            "mpd": self.mpd.init(rng, audio, audio),
            "mrd": self.mrd.init(rng, audio, audio),
        }
        self.state = self.init_fn(gen_params, disc_params)

    def try_resume(self):
        """3-tier: stage-2 dir → stage-1 dir (--load_stage1_checkpoint) →
        scratch (reference train_binaural_mel.py:480-537)."""
        d = self.a.checkpoint_path
        os.makedirs(d, exist_ok=True)
        cp_g = ckpt.scan_checkpoint(d, "g_", renamed_file="bigvgan_generator.pt")
        cp_do = ckpt.scan_checkpoint(d, "do_",
                                     renamed_file="bigvgan_discriminator_optimizer.pt")
        if cp_g and cp_do:
            g = ckpt.load_checkpoint(cp_g, {"generator": self.state.gen_params})
            do = ckpt.load_checkpoint(cp_do)
            from flax import serialization

            self.state = self.state.replace(
                gen_params=g["generator"],
                disc_params=serialization.from_state_dict(
                    self.state.disc_params,
                    {"mpd": do["mpd"], "mrd": do["mrd"]},
                ),
                step=jnp.asarray(int(do["steps"]) + 1, jnp.int32),
            )
            self.steps = int(do["steps"]) + 1
            self.last_epoch = int(do["epoch"])
            print(f"Resumed stage-2 from {cp_g} at step {self.steps}")
            return
        s1 = getattr(self.a, "stage1_checkpoint_path", None)
        if s1 and getattr(self.a, "load_stage1_checkpoint", False):
            cp_g = ckpt.scan_checkpoint(s1, "g_")
            if cp_g:
                g = ckpt.load_checkpoint(
                    cp_g, {"generator": self.state.gen_params}
                )
                self.state = self.state.replace(gen_params=g["generator"])
                print(f"Warm-started generator from stage-1 dir {cp_g}")

    def save(self, epoch: int):
        d = self.a.checkpoint_path
        ckpt.save_checkpoint(
            os.path.join(d, f"g_{self.steps:08d}"),
            {"generator": self.state.gen_params},
        )
        ckpt.save_checkpoint(
            os.path.join(d, f"do_{self.steps:08d}"),
            {
                "mpd": self.state.disc_params["mpd"],
                "mrd": self.state.disc_params["mrd"],
                "steps": self.steps,
                "epoch": epoch,
            },
        )

    # ------------------------------------------------------------------

    def validate(self, loader, max_samples: int = 10):
        """10-sample mel-L1 + TB figures (reference :617-674)."""
        errs = []
        for i, batch in enumerate(loader):
            mel = jnp.asarray(batch["mel"][:1])
            y = batch["audio"][:1]
            y_hat = np.asarray(self._val_apply(self.state.gen_params, mel))
            y_hat_mel = np.asarray(self.mel_fn(jnp.asarray(y_hat[:, 0, :])))
            t = min(y_hat_mel.shape[-1], batch["mel_loss"].shape[-1])
            errs.append(
                float(np.mean(np.abs(batch["mel_loss"][:1, :, :t]
                                     - y_hat_mel[:, :, :t])))
            )
            if i == 0:
                self.writer.mel_figure("val/pred_mel", y_hat_mel[0],
                                       self.steps, vmin=-11, vmax=2)
                self.writer.audio("val/audio", y_hat[0, 0], self.steps,
                                  self.h["sampling_rate"])
            if len(errs) >= max_samples:
                break
        val_err = float(np.mean(errs)) if errs else float("nan")
        self.writer.scalar("validation/mel_spec_error", val_err, self.steps)
        print(f"step {self.steps} validation mel error: {val_err:.4f}")
        return val_err

    def train(self, loader_train, loader_val, dataset_train=None):
        a, h = self.a, self.h
        t0 = time.time()
        for epoch in range(max(0, self.last_epoch), a.training_epochs):
            if dataset_train is not None and hasattr(dataset_train,
                                                    "update_epoch"):
                dataset_train.update_epoch(epoch)  # curriculum (:993)
                p = dataset_train.get_pred_mel_probability()
                print(f"epoch {epoch}: P(pred mel) = {p:.2f}")
                self.writer.scalar("training/pred_mel_prob", p, self.steps)
            loader_train.set_epoch(epoch)
            for batch in loader_train:
                b = shard_batch(
                    {
                        "mel": batch["mel"],
                        "audio": batch["audio"],
                        "mel_loss": batch["mel_loss"],
                    },
                    self.mesh,
                )
                with self.mesh:
                    self.state, metrics = self.step_fn(self.state, b)
                self.steps = int(self.state.step)

                if self.steps % a.stdout_interval == 0:
                    dt = time.time() - t0
                    t0 = time.time()
                    print(
                        f"Steps: {self.steps:d}, Gen Loss: "
                        f"{float(metrics['loss_gen_all']):4.3f}, Mel Error: "
                        f"{float(metrics['loss_mel']):4.3f}, "
                        f"s/b: {dt / max(a.stdout_interval, 1):4.3f}"
                    )
                if self.steps % a.summary_interval == 0:
                    for k in ("loss_disc", "loss_gen_all", "loss_mel",
                              "loss_fm", "grad_norm_g", "lr"):
                        self.writer.scalar(f"training/{k}",
                                           float(metrics[k]), self.steps)
                if self.steps % a.checkpoint_interval == 0 and self.steps:
                    self.save(epoch)
                if (self.steps % a.validation_interval == 0
                        and not getattr(a, "debug", False)):
                    self.validate(loader_val)
        self.writer.close()


def load_config(a) -> AttrDict:
    import json

    with open(a.config) as f:
        h = AttrDict(json.loads(f.read()))
    build_env(a.config, "config.json", a.checkpoint_path)
    return h
