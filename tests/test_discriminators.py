"""Discriminator + loss tests (tiny audio, structural + numeric checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffbinaural_tpu.losses import (
    MultiScaleMelSpectrogramLoss,
    discriminator_loss,
    feature_loss,
    generator_loss,
    simple_silence_aware_mel_loss,
    detect_silence_regions,
    enhanced_l1_loss,
    BinauralEnhancedLoss,
)
from diffbinaural_tpu.models.discriminators import (
    DiscriminatorP,
    DiscriminatorR,
    MultiBandDiscriminator,
    MultiPeriodDiscriminator,
    MultiScaleSubbandCQTDiscriminator,
)
from diffbinaural_tpu.signal.cqt import cqt


def _audio(b=2, t=4096, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, 1, t)) * 0.1


def test_discriminator_p_contract():
    d = DiscriminatorP(period=3)
    x = _audio(t=1000)  # not divisible by 3 → exercises reflect pad
    params = d.init(jax.random.PRNGKey(0), x)
    logits, fmap = d.apply(params, x)
    assert logits.ndim == 2 and logits.shape[0] == 2
    assert len(fmap) == 6  # 5 convs + post


def test_mpd_four_tuple():
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    y, y_hat = _audio(seed=0), _audio(seed=1)
    params = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    rs, gs, fr, fg = mpd.apply(params, y, y_hat)
    assert len(rs) == len(gs) == len(fr) == len(fg) == 2
    # identical inputs → identical logits
    rs2, gs2, _, _ = mpd.apply(params, y, y)
    np.testing.assert_allclose(np.asarray(rs2[0]), np.asarray(gs2[0]), atol=1e-6)


def test_discriminator_r_contract():
    d = DiscriminatorR(resolution=(512, 128, 512))
    x = _audio()
    params = d.init(jax.random.PRNGKey(0), x)
    logits, fmap = d.apply(params, x)
    assert len(fmap) == 6


def test_mbd_contract():
    mbd = MultiBandDiscriminator(fft_sizes=(512,))
    y, y_hat = _audio(seed=0), _audio(seed=1)
    params = mbd.init(jax.random.PRNGKey(0), y, y_hat)
    rs, gs, fr, fg = mbd.apply(params, y, y_hat)
    assert len(rs) == 1
    assert len(fr[0]) == 5 * 4 + 1  # 4 fmaps/band × 5 bands + post


def test_cqt_shape_and_tone_peak():
    """A pure tone must peak at the right CQT bin."""
    sr, bpo, n_oct, hop = 44100, 24, 9, 512
    fmin = 32.70319566257483
    bin_idx = 140
    f = fmin * 2 ** (bin_idx / bpo)
    t = np.arange(2**15) / sr
    x = jnp.asarray(np.sin(2 * np.pi * f * t, dtype=np.float32))[None]
    z = cqt(x, sr, hop, n_oct, bpo)
    assert z.shape[1] == bpo * n_oct
    mag = np.asarray(jnp.sqrt(z[..., 0] ** 2 + z[..., 1] ** 2))
    mean_per_bin = mag[0].mean(axis=-1)
    assert abs(int(mean_per_bin.argmax()) - bin_idx) <= 1


def test_cqtd_contract():
    d = MultiScaleSubbandCQTDiscriminator(
        sampling_rate=22050, hop_lengths=(512,), n_octaves=(9,),
        bins_per_octaves=(24,), filters=8,
    )
    y, y_hat = _audio(t=8192, seed=0), _audio(t=8192, seed=1)
    params = d.init(jax.random.PRNGKey(0), y, y_hat)
    rs, gs, fr, fg = d.apply(params, y, y_hat)
    assert len(rs) == 1 and len(fr[0]) == 5


def test_gan_losses_optima():
    """LS-GAN: D loss is 0 at (D(y)=1, D(ŷ)=0); G loss 0 at D(ŷ)=1."""
    ones = [jnp.ones((2, 4))]
    zeros = [jnp.zeros((2, 4))]
    d_loss, r_l, g_l = discriminator_loss(ones, zeros)
    assert float(d_loss) == 0.0
    g_loss, _ = generator_loss(ones)
    assert float(g_loss) == 0.0
    d_worst, _, _ = discriminator_loss(zeros, ones)
    assert float(d_worst) == 2.0


def test_feature_loss_lambda2():
    fr = [[jnp.ones((2, 3))], [jnp.zeros((2, 3))]]
    fg = [[jnp.zeros((2, 3))], [jnp.zeros((2, 3))]]
    assert float(feature_loss(fr, fg)) == 2.0  # mean|1-0|·2


def test_multiscale_mel_loss_zero_for_identical():
    loss = MultiScaleMelSpectrogramLoss(
        22050, n_mels=(5, 10), window_lengths=(32, 64)
    )
    x = _audio(t=2048)
    assert float(loss(x, x)) == 0.0
    y = _audio(t=2048, seed=7)
    assert float(loss(x, y)) > 0.0


def test_silence_mask_and_loss():
    mel = jnp.full((1, 4, 20), 1e-8)  # silence everywhere
    mask = detect_silence_regions(mel, threshold_db=-60)
    assert mask.shape == (1, 1, 20)
    # the min-length conv (k=5, pad=2) zeroes 2 boundary frames exactly like
    # torch F.conv1d in the reference (train_binaural_mel.py:84-90)
    np.testing.assert_allclose(np.asarray(mask[..., 2:-2]), 1.0)
    np.testing.assert_allclose(np.asarray(mask[..., :2]), 0.0)
    loud = jnp.ones((1, 4, 20))
    mask2 = detect_silence_regions(loud, threshold_db=-60)
    np.testing.assert_allclose(np.asarray(mask2), 0.0)
    # simple loss (no min-length filter): silence penalty ×2 everywhere
    pred = mel + 0.5
    plain = float(jnp.mean(jnp.abs(mel - pred)))
    weighted = float(simple_silence_aware_mel_loss(mel, pred))
    np.testing.assert_allclose(weighted, 2.0 * plain, rtol=1e-5)


def test_enhanced_loss_contract():
    pred = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 8, 8))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 8, 8))
    base = jnp.asarray(1.0)
    loss = BinauralEnhancedLoss()(pred, tgt, base)
    assert float(loss) > 1.0  # adds non-negative terms to base
    same = BinauralEnhancedLoss()(tgt, tgt, base)
    np.testing.assert_allclose(float(same), 1.0, atol=1e-6)
    assert float(enhanced_l1_loss(tgt, tgt)) == 0.0
