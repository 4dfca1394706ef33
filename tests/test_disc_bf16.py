"""Precision audit for the opt-in bf16 discriminator-conv mode.

CLAUDE.md round-2 TODO #3: before claiming training-quality parity with
bf16 discriminators, quantify what bf16 conv compute does to (a) the
discriminator logits, (b) the scalar GAN/feature-matching losses, and
(c) the GENERATOR-side gradient direction (the only thing the generator
ever sees from the discriminators).  The spectral frontends (STFT/CQT)
always run fp32 (signal/stft.py casts to fp32 before the rfft;
signal/cqt.py matmuls use preferred_element_type=f32), and losses/gan.py
upcasts logits/fmaps to fp32, so the bf16 surface is exactly the conv
stacks.

Reference policy being compared against: the torch trainers autocast the
generator only and keep discriminators fp32
(/root/reference/BigVGAN/train_binaural_mel.py:412-867) — hence our
default stays fp32 and bf16 is config-gated ("discriminator_bf16").

Bounds below were measured on CPU (fp64-free XLA path) and pinned with
~3x slack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbinaural_tpu.cli.gan_common import build_discriminators
from diffbinaural_tpu.core.config import AttrDict
from diffbinaural_tpu.losses.gan import (
    discriminator_loss,
    feature_loss,
    generator_loss,
)

SEG = 8192


def _tiny_h():
    # production discriminator family (CQTD+MPD) at toy width
    return AttrDict(
        {
            "use_cqtd_instead_of_mrd": True,
            "mpd_reshapes": [2, 3],
            "cqtd_hop_lengths": [512],
            "cqtd_n_octaves": [5],
            "cqtd_bins_per_octaves": [24],
            "cqtd_filters": 8,
            "sampling_rate": 22050,
            "discriminator_channel_mult": 0.25,
        }
    )


def _audio(seed, b=2):
    """Sine mixture + noise at vocoder-output-like amplitude."""
    rng = np.random.default_rng(seed)
    t = np.arange(SEG) / 22050.0
    wav = sum(
        a * np.sin(2 * np.pi * f * t + p)
        for a, f, p in zip(
            rng.uniform(0.05, 0.3, 4),
            rng.uniform(80, 6000, 4),
            rng.uniform(0, 6, 4),
        )
    )
    wav = wav[None] + 0.02 * rng.standard_normal((b, SEG))
    return jnp.asarray(wav, jnp.float32)[:, None, :]


@pytest.fixture(scope="module")
def setup():
    h = _tiny_h()
    mpd32, mrd32 = build_discriminators(h, dtype=jnp.float32)
    mpd16, mrd16 = build_discriminators(h, dtype=jnp.bfloat16)
    y, y_hat = _audio(0), _audio(1)
    rng = jax.random.PRNGKey(0)
    params = {
        "mpd": mpd32.init(rng, y, y_hat),
        "mrd": mrd32.init(rng, y, y_hat),
    }
    return h, (mpd32, mrd32), (mpd16, mrd16), params, y, y_hat


def _gen_side(mpd, mrd, params, y, y_hat):
    """adv + feature-matching generator losses (what G's grad flows through)."""
    _, g_mpd, fr_mpd, fg_mpd = mpd.apply(params["mpd"], y, y_hat)
    _, g_mrd, fr_mrd, fg_mrd = mrd.apply(params["mrd"], y, y_hat)
    adv = generator_loss(g_mpd)[0] + generator_loss(g_mrd)[0]
    fm = feature_loss(
        jax.lax.stop_gradient(fr_mpd + fr_mrd), fg_mpd + fg_mrd
    )
    return adv + fm


def test_loss_dtype_is_fp32_under_bf16(setup):
    _, _, (mpd16, mrd16), params, y, y_hat = setup
    r, g, fr, fg = mpd16.apply(params["mpd"], y, y_hat)
    assert r[0].dtype == jnp.bfloat16  # convs really ran bf16
    d_loss, _, _ = discriminator_loss(r, g)
    assert d_loss.dtype == jnp.float32  # losses upcast
    assert feature_loss(fr, fg).dtype == jnp.float32


def test_bf16_logit_and_loss_error_bounded(setup):
    _, (mpd32, mrd32), (mpd16, mrd16), params, y, y_hat = setup
    for m32, m16, p in ((mpd32, mpd16, params["mpd"]),
                        (mrd32, mrd16, params["mrd"])):
        r32, g32, _, _ = m32.apply(p, y, y_hat)
        r16, g16, _, _ = m16.apply(p, y, y_hat)
        for a, b in zip(r32 + g32, r16 + g16):
            b = b.astype(jnp.float32)
            rel = float(
                jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-12)
            )
            assert rel < 0.15, rel  # bf16 ~ 2^-8 mantissa through 5-6 convs

    l32 = _gen_side(mpd32, mrd32, params, y, y_hat)
    l16 = _gen_side(mpd16, mrd16, params, y, y_hat)
    assert abs(float(l32 - l16)) / abs(float(l32)) < 0.05


def test_bf16_generator_gradient_direction(setup):
    """The gradient G receives (w.r.t. its waveform) must point the same
    way in bf16 — cosine >= 0.98 and magnitude within 10%."""
    _, (mpd32, mrd32), (mpd16, mrd16), params, y, y_hat = setup

    g32 = jax.grad(lambda yh: _gen_side(mpd32, mrd32, params, y, yh))(y_hat)
    g16 = jax.grad(lambda yh: _gen_side(mpd16, mrd16, params, y, yh))(y_hat)
    a = np.asarray(g32).ravel()
    b = np.asarray(g16).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    assert cos > 0.98, cos
    assert 0.9 < np.linalg.norm(b) / np.linalg.norm(a) < 1.1
