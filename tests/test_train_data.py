"""Train-step + data-layer tests (CPU mesh)."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffbinaural_tpu.diffusion import GaussianDiffusion
from diffbinaural_tpu.models import AudioVisualModel
from diffbinaural_tpu.train import make_stage1_train_step, TrainingStabilizer
from diffbinaural_tpu.data.loader import DataLoader
from diffbinaural_tpu.data.audio_io import save_wav, load_wav, resample


def test_stage1_train_step_reduces_loss():
    size = 16
    unet = AudioVisualModel(dim=16)
    rng = jax.random.PRNGKey(0)
    b = 2
    x = jnp.zeros((b, 2, size, size))
    cond = (jnp.zeros((b, 1, size, size)), jnp.zeros((b, 512)),
            jnp.zeros((b, 2, size, size)))
    params = {"unet": unet.init(rng, x, jnp.zeros((b,), jnp.int32), cond)}
    diffusion = GaussianDiffusion(image_size=size, timesteps=50,
                                  sampling_timesteps=5, auto_normalize=False)
    init_fn, step_fn = make_stage1_train_step(
        unet_apply=lambda p, x_, t_, c: unet.apply(p, x_, t_, c),
        diffusion=diffusion, lr_unet=1e-3, donate=False,
    )
    state = init_fn(params)
    batch = {
        "mono_mel": jnp.zeros((b, 1, size, size)),
        "binaural_mel": jnp.zeros((b, 2, size, size)),
        "feat": jnp.zeros((b, 512)),
    }
    losses = []
    for i in range(8):
        state, m = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 8
    # same fixed batch: loss must trend down
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_stage1_clip_value_bounds_updates():
    """Optional clip-by-value (GradientStabilizer's clip_grad_value_,
    default-off like the reference's shipped façade): with a tiny clip the
    pre-LR update magnitude is bounded and the step still runs finite."""
    size = 16
    unet = AudioVisualModel(dim=16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 2, size, size))
    cond = (jnp.zeros((1, 1, size, size)), jnp.zeros((1, 512)),
            jnp.zeros((1, 2, size, size)))
    params = {"unet": unet.init(rng, x, jnp.zeros((1,), jnp.int32), cond)}
    diffusion = GaussianDiffusion(image_size=size, timesteps=50,
                                  sampling_timesteps=5, auto_normalize=False)
    batch = {
        "mono_mel": jnp.ones((1, 1, size, size)),
        "binaural_mel": jnp.ones((1, 2, size, size)),
        "feat": jnp.ones((1, 512)),
    }
    outs = {}
    for cv in (None, 1e-8):
        init_fn, step_fn = make_stage1_train_step(
            unet_apply=lambda p, x_, t_, c: unet.apply(p, x_, t_, c),
            diffusion=diffusion, clip_value=cv, weight_decay=0.0,
            donate=False,
        )
        state, m = step_fn(init_fn(params), batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(m["loss"]))
        outs[cv] = state.params
    # the value clip must actually change the update
    a = jax.tree_util.tree_leaves(outs[None])
    b_ = jax.tree_util.tree_leaves(outs[1e-8])
    assert any(not np.allclose(np.asarray(x1), np.asarray(x2))
               for x1, x2 in zip(a, b_))


def test_lr_scale_changes_updates_without_recompile():
    size = 16
    unet = AudioVisualModel(dim=16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 2, size, size))
    cond = (jnp.zeros((1, 1, size, size)), jnp.zeros((1, 512)),
            jnp.zeros((1, 2, size, size)))
    params = {"unet": unet.init(rng, x, jnp.zeros((1,), jnp.int32), cond)}
    diffusion = GaussianDiffusion(image_size=size, timesteps=50,
                                  auto_normalize=False)
    init_fn, step_fn = make_stage1_train_step(
        unet_apply=lambda p, x_, t_, c: unet.apply(p, x_, t_, c),
        diffusion=diffusion, donate=False,
    )
    batch = {
        "mono_mel": jnp.zeros((1, 1, size, size)),
        "binaural_mel": jnp.zeros((1, 2, size, size)),
        "feat": jnp.zeros((1, 512)),
    }
    s0 = init_fn(params)
    s_full, _ = step_fn(s0, batch, jax.random.PRNGKey(0))
    s0_zero = s0.replace(lr_scale=jnp.zeros(()))
    s_frozen, _ = step_fn(s0_zero, batch, jax.random.PRNGKey(0))
    # lr_scale=0 → parameters unchanged
    a = jax.tree_util.tree_leaves(s_frozen.params)
    b_ = jax.tree_util.tree_leaves(s0.params)
    assert all(np.allclose(np.asarray(x1), np.asarray(x2)) for x1, x2 in zip(a, b_))
    changed = jax.tree_util.tree_leaves(s_full.params)
    assert any(not np.allclose(np.asarray(x1), np.asarray(x2))
               for x1, x2 in zip(changed, b_))


def test_stabilizer_anomaly_and_plateau():
    stab = TrainingStabilizer(lr_patience=2)
    for _ in range(12):
        r = stab.training_step(1.0, 0.5)
    assert not r["is_anomaly"]
    with pytest.warns(UserWarning):
        r = stab.training_step(100.0, 0.5)
    assert r["is_anomaly"]
    stab.validation_step(1.0)
    stab.validation_step(2.0)
    r = stab.validation_step(3.0)
    assert r["lr_reduced"] and r["lr_scale"] == 0.5


class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "name": f"s{i}"}


def test_dataloader_batches_and_sharding():
    dl = DataLoader(_ToyDataset(), batch_size=2, shuffle=False, num_workers=2)
    batches = list(dl)
    assert len(batches) == 5
    assert batches[0]["x"].shape == (2, 3)
    np.testing.assert_array_equal(batches[0]["x"][:, 0], [0, 1])
    assert batches[0]["name"] == ["s0", "s1"]
    # two shards split the index space disjointly
    d0 = DataLoader(_ToyDataset(), batch_size=1, shuffle=False,
                    num_shards=2, shard_index=0)
    d1 = DataLoader(_ToyDataset(), batch_size=1, shuffle=False,
                    num_shards=2, shard_index=1)
    v0 = {int(b["x"][0, 0]) for b in d0}
    v1 = {int(b["x"][0, 0]) for b in d1}
    assert v0 | v1 == set(range(10)) and not (v0 & v1)


def test_wav_roundtrip_and_resample(tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, x, sr)
    y, sr2 = load_wav(p)
    assert sr2 == sr and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-3)
    z = resample(x, sr, 44100)
    assert abs(len(z) - 2 * len(x)) <= 2


def test_stage2_freeze_step_skips_discriminator():
    """freeze_step gating via lax.cond: while frozen, disc params AND
    optimizer moments stay bit-identical, d_loss reports 0, and the
    generator still trains on the regression loss; after the freeze the
    discriminator starts updating (reference train_binaural_both.py
    :1045-1058, :1088-1095)."""
    from diffbinaural_tpu.train import make_stage2_train_step

    def gen_apply(p, mel):  # (B, M, T) -> (B, 1, T)
        return jnp.tanh(mel.mean(axis=1, keepdims=True) * p["w"])

    def disc_apply(p, y, yh):
        f = lambda s: [s * p["d"]]
        return ([y.mean() * p["d"]], [yh.mean() * p["d"]], [f(y)], [f(yh)])

    init_fn, step_fn = make_stage2_train_step(
        gen_apply=gen_apply,
        mpd_apply=disc_apply,
        mrd_apply=disc_apply,
        mel_fn=lambda w: w[:, None, :],
        multiscale_mel_loss=lambda y, yh: jnp.mean(jnp.abs(y - yh)),
        freeze_step=2,
        donate=False,
    )
    gen_params = {"w": jnp.ones(())}
    disc_params = {
        "mpd": {"d": jnp.asarray(0.5)},
        "mrd": {"d": jnp.asarray(-0.5)},
    }
    state = init_fn(gen_params, disc_params)
    batch = {
        "mel": jnp.ones((2, 4, 8)),
        "audio": 0.1 * jnp.ones((2, 8)),
        "mel_loss": jnp.ones((2, 4, 8)),
    }

    d0 = jax.tree_util.tree_leaves(state.disc_params)
    m0 = jax.tree_util.tree_leaves(state.disc_opt)
    for i in range(2):  # frozen steps
        state, m = step_fn(state, batch)
        assert float(m["loss_disc"]) == 0.0
        assert float(m["loss_fm"]) == 0.0
    assert all(
        np.array_equal(a, b)
        for a, b in zip(d0, jax.tree_util.tree_leaves(state.disc_params))
    )
    assert all(
        np.array_equal(a, b)
        for a, b in zip(m0, jax.tree_util.tree_leaves(state.disc_opt))
    )
    assert not np.allclose(float(state.gen_params["w"]), 1.0)

    state, m = step_fn(state, batch)  # step 2: unfrozen
    assert float(m["loss_disc"]) != 0.0
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(d0, jax.tree_util.tree_leaves(state.disc_params))
    )
