"""Diffusion beta/alpha schedules and precomputed constants.

Re-derivation of the schedule-constant buffers the reference registers
(/root/reference/DiffBinaural/diffusion_utils/diffusion_pytorch.py:50-207):
computed in float64 and stored float32, exactly as the torch buffers are.
Kept as a frozen numpy struct so the arrays embed as jit constants — no
device round-trips and no retracing across steps.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, fields

import numpy as np


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """(reference diffusion_pytorch.py:50-57)"""
    scale = 1000 / timesteps
    return np.linspace(scale * 1e-6, scale * 0.006, timesteps, dtype=np.float64)


def linear_alpha_schedule(timesteps: int, clip_min: float = 1e-9) -> np.ndarray:
    """(reference diffusion_pytorch.py:59-68)"""
    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    alphas_cumprod = np.clip(1 - t, clip_min, 1.0)
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """(reference diffusion_pytorch.py:70-80 — the schedule actually used)"""
    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = 0, end: float = 3, tau: float = 1,
) -> np.ndarray:
    """(reference diffusion_pytorch.py:82-96)"""

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    v_start = sigmoid(start / tau)
    v_end = sigmoid(end / tau)
    alphas_cumprod = (-sigmoid((t * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "linear_alpha": linear_alpha_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


@dataclass(frozen=True)
class DiffusionSchedule:
    """All 12 schedule-constant buffers (reference diffusion_pytorch.py:158-207),
    float32, plus the p2 reweighting."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    p2_loss_weight: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    beta_schedule: str = "cosine",
    timesteps: int = 1000,
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
    **schedule_kwargs,
) -> DiffusionSchedule:
    betas = _SCHEDULES[beta_schedule](timesteps, **schedule_kwargs)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = (
        betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )

    f32 = lambda a: np.asarray(a, dtype=np.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        p2_loss_weight=f32(
            (p2_loss_weight_k + alphas_cumprod / (1 - alphas_cumprod))
            ** -p2_loss_weight_gamma
        ),
    )
