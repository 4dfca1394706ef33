"""DPM-Solver++(2M) sampler: solver accuracy vs DDIM on an analytic score.

Both samplers integrate the SAME probability-flow ODE (η=0); on a model
whose exact noise prediction is known in closed form (an isotropic
Gaussian-mixture data distribution), a fine-step DDIM run converges to the
true ODE solution and coarser runs can be ranked by their distance to it.
These tests pin the sampler's reason to exist: DPM++ at ~half the steps is
at least as accurate as 25-step DDIM (the reference's production setting,
/root/reference/DiffBinaural/test_realBinaural.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from diffbinaural_tpu.diffusion import GaussianDiffusion


def _gmm_model_fn(diffusion, mus, weights, s=0.25):
    """Exact ε̂(x_t, t) for data ~ Σ_k w_k N(μ_k, s²I).

    x_t = a·x0 + σ·ε with a = √ᾱ_t gives x_t ~ Σ_k w_k N(a·μ_k, v·I),
    v = a²s² + σ²; then ε̂* = −σ·∇log p = σ·(x − a·Σ_k γ_k μ_k)/v with
    responsibilities γ_k ∝ w_k · exp(−‖x − a·μ_k‖²/(2v))."""
    ac = jnp.asarray(diffusion.schedule.alphas_cumprod)
    mus = jnp.asarray(mus)  # (K, C, H, W)
    logw = jnp.log(jnp.asarray(weights))  # (K,)

    def model_fn(x, t, condition):
        del condition
        a = jnp.sqrt(ac[t]).reshape(-1, 1, 1, 1)  # (B,1,1,1)
        var = (a * s) ** 2 + (1.0 - ac[t].reshape(-1, 1, 1, 1))
        diff = x[:, None] - a[:, None] * mus[None]  # (B, K, C, H, W)
        sq = jnp.sum(diff**2, axis=(2, 3, 4))  # (B, K)
        gamma = jax.nn.softmax(logw[None] - sq / (2.0 * var[:, :, 0, 0]), -1)
        mean = jnp.einsum("bk,kchw->bchw", gamma, mus)
        return jnp.sqrt(var - (a * s) ** 2) * (x - a * mean) / var

    return model_fn


def _setup():
    diffusion = GaussianDiffusion(
        image_size=8, timesteps=1000, beta_schedule="cosine",
        objective="pred_noise", auto_normalize=False,
    )
    rng = np.random.default_rng(0)
    mus = 0.6 * np.tanh(rng.standard_normal((2, 2, 8, 8))).astype(np.float32)
    model_fn = _gmm_model_fn(diffusion, mus, np.asarray([0.6, 0.4]))
    mix = jnp.asarray(0.1 * rng.standard_normal((3, 1, 8, 8)), jnp.float32)
    feat = jnp.zeros((3, 512), jnp.float32)
    return diffusion, model_fn, (mix, feat)


def test_dpm_beats_ddim_at_half_the_steps():
    diffusion, model_fn, cond = _setup()
    key = jax.random.PRNGKey(7)
    gt = diffusion.ddim_sample(model_fn, cond, key, sampling_timesteps=400)

    def err(x):
        return float(jnp.mean(jnp.abs(x - gt)))

    e_ddim25 = err(diffusion.ddim_sample(model_fn, cond, key,
                                         sampling_timesteps=25))
    e_dpm12 = err(diffusion.dpm_sample(model_fn, cond, key,
                                       sampling_timesteps=12))
    e_dpm25 = err(diffusion.dpm_sample(model_fn, cond, key,
                                       sampling_timesteps=25))
    # the headline claim: half the NFE, at least DDIM-25 accuracy
    assert e_dpm12 <= e_ddim25, (e_dpm12, e_ddim25)
    # same NFE: strictly higher order, so meaningfully tighter
    assert e_dpm25 < 0.7 * e_ddim25, (e_dpm25, e_ddim25)


def test_dpm_converges_with_steps():
    diffusion, model_fn, cond = _setup()
    key = jax.random.PRNGKey(3)
    gt = diffusion.ddim_sample(model_fn, cond, key, sampling_timesteps=400)
    errs = [
        float(jnp.mean(jnp.abs(
            diffusion.dpm_sample(model_fn, cond, key, sampling_timesteps=n)
            - gt)))
        for n in (6, 12, 25)
    ]
    assert errs[0] > errs[1] > errs[2], errs


def test_dpm_single_step_equals_ddim_single_step():
    """One step of either sampler is x0̂(x_T): identical x_T (same rng
    split structure) ⇒ identical output."""
    diffusion, model_fn, cond = _setup()
    key = jax.random.PRNGKey(11)
    a = diffusion.ddim_sample(model_fn, cond, key, sampling_timesteps=1)
    b = diffusion.dpm_sample(model_fn, cond, key, sampling_timesteps=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dpm_return_all_timesteps_shape():
    diffusion, model_fn, cond = _setup()
    out = diffusion.dpm_sample(
        model_fn, cond, jax.random.PRNGKey(0),
        sampling_timesteps=5, return_all_timesteps=True,
    )
    assert out.shape == (3, 6, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_dpm_condition_contract_keeps_mono_mix():
    """condition[0] must stay the 1-channel mono mix (the repeat is local),
    and the carried mix_t must track the q-sampled mix at the state's noise
    level — the same contract the DDIM test pins."""
    diffusion, _, cond = _setup()
    seen = []

    def probe_fn(x, t, condition):
        seen.append(tuple(c.shape for c in condition))
        return jnp.zeros_like(x)

    diffusion.dpm_sample(probe_fn, cond, jax.random.PRNGKey(0),
                         sampling_timesteps=3)
    (mix_s, feat_s, mix_t_s) = seen[0]
    assert mix_s == (3, 1, 8, 8)  # mono, not repeated
    assert mix_t_s == (3, 2, 8, 8)
    assert feat_s == (3, 512)
