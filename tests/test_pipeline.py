"""Fused whole-clip pipeline (infer.pipeline.BinauralPipeline): stitch math
vs a numpy replica of the reference overlap-average, plus a tiny end-to-end
run (the production path bench.py times)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffbinaural_tpu.infer.pipeline import BinauralPipeline
from diffbinaural_tpu.infer.stage1 import denormalize_mel


def _dummy_pipe(total_frames, **kw):
    return BinauralPipeline(
        unet_apply=lambda p, x, t, c: x,
        voc_apply=lambda p, mel: mel,
        total_frames=total_frames,
        sampling_timesteps=2,
        **kw,
    )


def test_stitch_matches_numpy_overlap_average():
    """_stitch must reproduce reference test_realBinaural.py:199-205:
    denormalise → 8-frame edge crop (middle half for short tails) →
    overlap-average; uncovered frames stay 0."""
    total = 130  # starts [0, 40, 50] — includes a right-aligned last window
    pipe = _dummy_pipe(total, unet_batch=2)
    assert pipe.starts == [0, 40, 50]
    rng = np.random.default_rng(0)
    preds = rng.standard_normal((pipe.n_slots, 2, 80, 80)).astype(np.float32)

    got = np.asarray(pipe._stitch(jnp.asarray(preds)))

    mel = np.zeros((2, 80, total), np.float32)
    count = np.zeros((total,), np.float32)
    dn = np.asarray(denormalize_mel(jnp.asarray(preds[: pipe.n_windows])))
    for (s, (lo, hi)), p in zip(zip(pipe.starts, pipe._spans), dn):
        mel[:, :, s + lo : s + hi] += p[:, :, lo:hi]
        count[s + lo : s + hi] += 1.0
    want = mel / np.clip(count, 1.0, None)[None, None]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert (got[:, :, :8] == 0).all()  # cropped clip head is never covered


def test_make_windows_slices_and_pads():
    total = 130
    pipe = _dummy_pipe(total, unet_batch=4)  # n_windows=3 → 1 pad slot
    mono = np.arange(80 * total, dtype=np.float32).reshape(1, 80, total)
    mono = mono / mono.max() * 2.0 - 7.0  # keep inside [-12, 2.5]
    wins = np.asarray(pipe._make_windows(jnp.asarray(mono)))
    assert wins.shape == (4, 1, 80, 80)
    # pad slot repeats the last real window
    np.testing.assert_array_equal(wins[3], wins[2])


def test_two_dispatch_mode_matches_fused():
    """fuse_vocoder=False (compile-size escape hatch) must be bit-identical
    to the single-program path."""
    total = 130
    mono = jnp.full((1, 80, total), -6.0)
    feat = jnp.zeros((3, 512))
    p1 = _dummy_pipe(total, unet_batch=2)
    p2 = _dummy_pipe(total, unet_batch=2, fuse_vocoder=False)
    w1 = np.asarray(p1(None, None, mono, feat))
    w2 = np.asarray(p2(None, None, mono, feat))
    np.testing.assert_array_equal(w1, w2)


def test_short_clip_pads_to_one_window():
    """Clips shorter than one window pad with MEL_MIN (generate_clip's
    convention) and produce a middle-half-stitched result."""
    total = 20  # < window=80 → single padded window, 8-frame crop → [8, 12)
    pipe = _dummy_pipe(total, unet_batch=1)
    assert pipe.starts == [0] and pipe._spans == [(8, 12)]
    mono = jnp.full((1, 80, total), -6.0)
    out = np.asarray(pipe(None, None, mono, jnp.zeros((512,))))
    assert out.shape == (2, 80, total)
    assert np.isfinite(out).all()
    assert (out[:, :, :8] == 0).all() and (out[:, :, 12:] == 0).all()


def test_pipeline_sharded_matches_unsharded():
    """With a mesh, all windows run in ONE sharded DDIM group; same math as
    the unsharded single-group pipeline (identical rng folding)."""
    from diffbinaural_tpu.parallel import make_mesh

    total = 130  # 3 windows → n_slots=4 on a 4-wide data axis
    mesh = make_mesh(8, model_parallel=2, devices=jax.devices("cpu")[:8])
    mono = jnp.full((1, 80, total), -6.0) + 0.3 * jnp.sin(
        jnp.arange(total) / 7.0
    )
    feat = jnp.zeros((3, 512))

    p_ref = _dummy_pipe(total, unet_batch=4)  # one group of 4 slots
    p_sh = BinauralPipeline(
        unet_apply=lambda p, x, t, c: x,
        voc_apply=lambda p, mel: mel,
        total_frames=total,
        sampling_timesteps=2,
        mesh=mesh,
    )
    assert p_sh.n_slots == 4 and p_sh.n_batches == 1
    want = np.asarray(p_ref(None, None, mono, feat))
    got = np.asarray(p_sh(None, None, mono, feat))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pipeline_end_to_end_tiny():
    from diffbinaural_tpu.core.config import VocoderConfig
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.models.bigvgan import BigVGAN

    total = 120
    unet = AudioVisualModel(dim=16)
    voc_cfg = VocoderConfig(
        num_mels=80, upsample_rates=(4, 4, 4, 4),
        upsample_kernel_sizes=(8, 8, 8, 8), upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    voc = BigVGAN(voc_cfg)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 2, 80, 80))
    cond0 = (jnp.zeros((1, 1, 80, 80)), jnp.zeros((1, 512)),
             jnp.zeros((1, 2, 80, 80)))
    unet_params = unet.init(rng, x0, jnp.zeros((1,), jnp.int32), cond0)
    voc_params = voc.init(rng, jnp.zeros((1, 80, 16)))

    pipe = BinauralPipeline(
        unet_apply=lambda p, x, t, c: unet.apply(p, x, t, c),
        voc_apply=lambda p, mel: voc.apply(p, mel),
        total_frames=total,
        unet_batch=2,
        sampling_timesteps=2,
    )
    mono = jnp.full((1, 80, total), -6.0)
    feat = jnp.zeros((512,))  # shared-feature broadcast path
    wav = pipe(unet_params, voc_params, mono, feat)
    assert wav.shape == (2, total * 256)
    assert np.isfinite(np.asarray(wav)).all()

    # same rng → identical output; different rng → different DDIM noise
    wav2 = pipe(unet_params, voc_params, mono, feat)
    np.testing.assert_array_equal(np.asarray(wav), np.asarray(wav2))
    wav3 = pipe(unet_params, voc_params, mono, feat, jax.random.PRNGKey(7))
    assert not np.array_equal(np.asarray(wav), np.asarray(wav3))


def test_pipeline_dpm_sampler_mode():
    """sampler='dpm++' runs the same windowing/stitch glue over the
    DPM-Solver++ sampler; unknown names fail at construction."""
    import pytest

    total = 130
    pipe = _dummy_pipe(total, unet_batch=2, sampler="dpm++")
    mono = jnp.full((1, 80, total), -6.0)
    out = np.asarray(pipe(None, None, mono, jnp.zeros((3, 512))))
    assert out.shape == (2, 80, total)
    assert np.isfinite(out).all()

    with pytest.raises(ValueError, match="sampler"):
        _dummy_pipe(total, sampler="euler")


def test_mismatched_inputs_raise():
    """A clip whose length differs from the compiled total_frames (or a
    feats array with a wrong row count) must fail loudly — dynamic_slice
    would clamp the late window starts and silently stitch predictions at
    wrong positions."""
    import pytest

    pipe = _dummy_pipe(160)
    good = jnp.full((1, 80, 160), -6.0)
    feat = jnp.zeros((512,))
    pipe(None, None, good, feat)  # sanity: correct shapes pass

    with pytest.raises(ValueError, match="total_frames"):
        pipe(None, None, jnp.full((1, 80, 150), -6.0), feat)
    with pytest.raises(ValueError, match="visual_feats"):
        pipe(None, None, good, jnp.zeros((pipe.n_slots + 1, 512)))
