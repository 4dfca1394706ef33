"""Config ingestion: JSON + AttrDict, compatible with the reference's flags.

The reference keeps three config mechanisms (argparse ArgParser, JSON+AttrDict,
and a dead python class — see /root/reference/BigVGAN/env.py:8-18). We keep the
JSON+AttrDict surface for the vocoder configs byte-compatible, and expose typed
dataclasses for the TPU-side training configs.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass


class AttrDict(dict):
    """dict with attribute access (reference: BigVGAN/env.py:8-11)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self


def load_hparams_from_json(path) -> AttrDict:
    with open(path) as f:
        return AttrDict(json.load(f))


def build_env(config, config_name, path):
    """Copy the config into the checkpoint dir (reference: BigVGAN/env.py:14-18)."""
    t_path = os.path.join(path, config_name)
    if config != t_path:
        os.makedirs(path, exist_ok=True)
        shutil.copyfile(config, t_path)


@dataclass(frozen=True)
class AudioConfig:
    """Shared audio-frontend parameters (reference production config:
    BigVGAN/configs/bigvgan_binaural_22khz_80band_256x.json:46-57)."""

    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None  # None → sr/2

    # ln-mel dynamic range used by the stage-1 wrappers
    # (reference: DiffBinaural/train_realBinaural.py:54-55)
    mel_min: float = -12.0
    mel_max: float = 2.5


@dataclass(frozen=True)
class DiffusionConfig:
    """Stage-1 diffusion hyperparameters
    (reference: DiffBinaural/train_fairplay.py:41-52)."""

    image_size: int = 80
    timesteps: int = 1000
    sampling_timesteps: int = 25
    beta_schedule: str = "cosine"
    objective: str = "pred_noise"
    loss_type: str = "l1"
    ddim_sampling_eta: float = 0.0
    p2_loss_weight_gamma: float = 0.0
    p2_loss_weight_k: float = 1.0
    cfg_drop_prob: float = 0.1
    self_condition: bool = True


@dataclass(frozen=True)
class UnetConfig:
    """Stage-1 UNet (reference: DiffBinaural/modules/unet.py:168-253 with
    build_unet defaults models.py:38-43: dim=64, in=2, out=2)."""

    dim: int = 64
    in_channels: int = 2
    out_channels: int = 2
    dim_mults: tuple = (1, 2, 4)
    resnet_block_groups: int = 8
    attn_heads: int = 4
    attn_dim_head: int = 32
    context_dim: int = 512
    dropout: float = 0.1
    linear_attn_resolution: int = 4


@dataclass(frozen=True)
class VocoderConfig:
    """BigVGAN generator (reference: bigvgan_binaural_22khz_80band_256x.json)."""

    num_mels: int = 80
    upsample_rates: tuple = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock: str = "1"
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_tanh_at_final: bool = False
    use_bias_at_final: bool = False

    @classmethod
    def from_attrdict(cls, h) -> "VocoderConfig":
        return cls(
            num_mels=h["num_mels"],
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=h["upsample_initial_channel"],
            resblock=str(h.get("resblock", "1")),
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in h["resblock_dilation_sizes"]
            ),
            activation=h.get("activation", "snakebeta"),
            snake_logscale=h.get("snake_logscale", True),
            use_tanh_at_final=h.get("use_tanh_at_final", True),
            use_bias_at_final=h.get("use_bias_at_final", True),
        )


@dataclass(frozen=True)
class CLIPConfig:
    """ViT-B/32 image tower (reference: clip.load("ViT-B/32"),
    DiffBinaural/modules/models.py:17-30)."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512


@dataclass(frozen=True)
class CLIPTextConfig:
    """ViT-B/32 text tower (the reference encoders' ``forward_text`` path,
    DiffBinaural/modules/networks.py:108-109 etc. → clip ``encode_text``)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
