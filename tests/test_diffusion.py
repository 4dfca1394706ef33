"""Schedule golden tests (vs torch float64 re-derivation) + DDIM mechanics."""

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from diffbinaural_tpu.diffusion import (
    cosine_beta_schedule,
    make_schedule,
    GaussianDiffusion,
)


def _torch_cosine_betas(timesteps, s=0.008):
    """Independent re-derivation of the cosine schedule on torch float64
    (formula from diffusion_pytorch.py:70-80)."""
    steps = timesteps + 1
    t = torch.linspace(0, timesteps, steps, dtype=torch.float64) / timesteps
    ac = torch.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0, 0.999).numpy()


def test_cosine_schedule_matches_float64_reference():
    ours = cosine_beta_schedule(1000)
    ref = _torch_cosine_betas(1000)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_schedule_buffer_identities():
    s = make_schedule("cosine", 1000)
    assert s.num_timesteps == 1000
    np.testing.assert_allclose(
        s.sqrt_alphas_cumprod**2 + s.sqrt_one_minus_alphas_cumprod**2,
        1.0,
        atol=1e-5,
    )
    assert s.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(s.alphas_cumprod_prev[1:], s.alphas_cumprod[:-1])
    # p2 weight with gamma=0 is identically 1
    np.testing.assert_allclose(s.p2_loss_weight, 1.0)


def _dummy_model(x, t, condition):
    """Deterministic stand-in: predicts noise as a linear function of x."""
    return 0.1 * x


def test_q_sample_broadcast_mix_t():
    gd = GaussianDiffusion(image_size=8, timesteps=100, sampling_timesteps=5)
    mix = jnp.ones((2, 1, 8, 8))
    noise = jnp.zeros((2, 2, 8, 8))
    t = jnp.array([0, 50])
    mix_t = gd.q_sample(mix, t, noise)
    # (B,1,H,W) + (B,2,H,W) noise broadcasts to 2 channels (reference :441)
    assert mix_t.shape == (2, 2, 8, 8)


def test_p_losses_finite_and_deterministic():
    gd = GaussianDiffusion(image_size=8, timesteps=100, sampling_timesteps=5)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 2, 8, 8)) * 0.3
    cond = (jnp.ones((2, 1, 8, 8)) * 0.2, jnp.ones((2, 512)))
    l1 = gd(_dummy_model, rng, x, cond, cfg=True)
    l2 = gd(_dummy_model, rng, x, cond, cfg=True)
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)


def test_ddim_sample_shapes_and_determinism():
    gd = GaussianDiffusion(image_size=8, timesteps=100, sampling_timesteps=5)
    rng = jax.random.PRNGKey(13)
    cond = (jnp.ones((2, 1, 8, 8)) * 0.2, jnp.ones((2, 512)))
    out = gd.ddim_sample(_dummy_model, cond, rng)
    assert out.shape == (2, 2, 8, 8)
    out_all = gd.ddim_sample(_dummy_model, cond, rng, return_all_timesteps=True)
    assert out_all.shape == (2, 6, 2, 8, 8)
    # last frame of the trajectory == the non-trajectory output
    np.testing.assert_allclose(out_all[:, -1], out, atol=1e-6)
    out2 = gd.ddim_sample(_dummy_model, cond, rng)
    np.testing.assert_allclose(out, out2, atol=0)


def test_ddim_sample_jits():
    gd = GaussianDiffusion(image_size=8, timesteps=100, sampling_timesteps=5)

    @jax.jit
    def run(rng, mix, feat):
        return gd.ddim_sample(_dummy_model, (mix, feat), rng)

    out = run(jax.random.PRNGKey(0), jnp.zeros((1, 1, 8, 8)), jnp.zeros((1, 512)))
    assert out.shape == (1, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_p_sample_loop_runs():
    gd = GaussianDiffusion(image_size=8, timesteps=20)
    rng = jax.random.PRNGKey(0)
    cond = (jnp.zeros((1, 1, 8, 8)), jnp.zeros((1, 512)))
    out = gd.p_sample_loop(_dummy_model, cond, (1, 2, 8, 8), rng)
    assert out.shape == (1, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
