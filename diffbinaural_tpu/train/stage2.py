"""Stage-2 GAN vocoder training: D step + G step in one jitted program.

Capability parity with the reference GAN loop
(/root/reference/BigVGAN/train_binaural_both.py:676-1211 ≡
train_binaural_mel.py:412-867):

  * AdamW for G and for the chained (MPD + MRD/CQTD) discriminators,
    β=(adam_b1, adam_b2)=(0.8, 0.99), lr from config (:766-773)
  * per-STEP ExponentialLR γ=lr_decay (0.9999996), reconstructed from the
    step counter — identical to torch scheduler.step() each iteration
    (:779-783, :1204-1206)
  * D trains on stop_gradient(ŷ) with grad clip ``clip_grad_norm`` (500 in
    the production config) and is frozen for the first ``freeze_step`` steps
    (:1025-1059); during the freeze G uses the regression (mel) loss only
    (:1088-1095)
  * G loss = λ·mel (multiscale on waveforms, or single-scale mel + 0.2λ
    silence-aware) + feature-matching + LS-GAN adversarial for both
    discriminator families (:1060-1102)

TPU design: both phases compile into ONE step function — the generator
forward runs once, its stop-gradient copy feeds the D update and the live
copy feeds the G update; XLA shares the fwd computation.  The freeze_step
gate is a ``jnp.where`` on the update trees (no recompile at the boundary).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class Stage2TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any       # {'mpd': ..., 'mrd': ...}  (mrd may be the CQTD)
    gen_opt: Any
    disc_opt: Any


def _exp_lr(base_lr: float, decay: float, step):
    return base_lr * decay**step


def make_stage2_train_step(
    gen_apply: Callable,      # (params, mel (B, M, T)) -> (B, 1, T·hop)
    mpd_apply: Callable,      # (params, y, y_hat) -> 4-tuple
    mrd_apply: Callable,      # (params, y, y_hat) -> 4-tuple (MRD or CQTD)
    mel_fn: Callable,         # (wav (B, T)) -> (B, M, frames), differentiable
    multiscale_mel_loss: Optional[Callable] = None,
    learning_rate: float = 5e-5,
    adam_b1: float = 0.8,
    adam_b2: float = 0.99,
    lr_decay: float = 0.9999996,
    clip_grad_norm: float = 500.0,
    lambda_melloss: float = 60.0,
    freeze_step: int = 0,
    use_multiscale_melloss: bool = True,
    silence_threshold_db: float = -50.0,
    donate: bool = True,
    remat: bool = False,
):
    """Returns (init_fn, step_fn).

    step_fn(state, batch) → (state, metrics); batch keys:
      'mel' (B, M, T) input mels, 'audio' (B, T·hop) target waveforms,
      'mel_loss' (B, M, T) loss-target mels (fmax_for_loss variant).
    """
    from ..losses import (
        discriminator_loss,
        feature_loss,
        generator_loss,
        simple_silence_aware_mel_loss,
    )

    if remat:
        # trade FLOPs for HBM: the 256×-upsampled activations of the
        # generator + two discriminator towers exceed a 16 GB chip at the
        # production batch — rematerialisation recovers the reference's
        # global batch on one chip
        gen_apply = jax.checkpoint(gen_apply)
        mpd_apply = jax.checkpoint(mpd_apply)
        mrd_apply = jax.checkpoint(mrd_apply)

    tx_g = optax.chain(
        optax.clip_by_global_norm(clip_grad_norm),
        optax.scale_by_adam(b1=adam_b1, b2=adam_b2),
        optax.add_decayed_weights(1e-2),
    )
    tx_d = optax.chain(
        optax.clip_by_global_norm(clip_grad_norm),
        optax.scale_by_adam(b1=adam_b1, b2=adam_b2),
        optax.add_decayed_weights(1e-2),
    )

    def init_fn(gen_params, disc_params) -> Stage2TrainState:
        return Stage2TrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=tx_g.init(gen_params),
            disc_opt=tx_d.init(disc_params),
        )

    def d_loss_fn(disc_params, y, y_hat_sg):
        rs_f, gs_f, _, _ = mpd_apply(disc_params["mpd"], y, y_hat_sg)
        loss_f, _, _ = discriminator_loss(rs_f, gs_f)
        rs_s, gs_s, _, _ = mrd_apply(disc_params["mrd"], y, y_hat_sg)
        loss_s, _, _ = discriminator_loss(rs_s, gs_s)
        return loss_f + loss_s

    def g_loss_fn(gen_params, disc_params, batch, frozen):
        y_g_hat = gen_apply(gen_params, batch["mel"])  # (B, 1, T·hop)
        y = batch["audio"][:, None, :]

        if use_multiscale_melloss:
            loss_mel = multiscale_mel_loss(y, y_g_hat) * lambda_melloss
        else:
            y_mel = batch["mel_loss"]
            y_g_hat_mel = mel_fn(y_g_hat[:, 0, :])
            base = jnp.mean(jnp.abs(y_mel - y_g_hat_mel)) * lambda_melloss
            silence = simple_silence_aware_mel_loss(
                y_mel, y_g_hat_mel, silence_threshold_db, 2.0
            ) * (lambda_melloss * 0.2)
            loss_mel = base + silence

        def adv_fn(y_g_hat):
            _, gs_f, fm_fr, fm_fg = mpd_apply(disc_params["mpd"], y, y_g_hat)
            loss_fm_f = feature_loss(jax.lax.stop_gradient(fm_fr), fm_fg)
            loss_gen_f, _ = generator_loss(gs_f)
            _, gs_s, fm_sr, fm_sg = mrd_apply(disc_params["mrd"], y, y_g_hat)
            loss_fm_s = feature_loss(jax.lax.stop_gradient(fm_sr), fm_sg)
            loss_gen_s, _ = generator_loss(gs_s)
            adv = loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f
            return adv, loss_gen_f + loss_gen_s, loss_fm_f + loss_fm_s

        if freeze_step == 0:
            adv, loss_gen, loss_fm = adv_fn(y_g_hat)
        else:
            # during the freeze the reference's G loss is regression-only
            # (:1088-1095); lax.cond skips the two discriminator towers'
            # forward+backward instead of computing-then-zeroing them
            adv, loss_gen, loss_fm = jax.lax.cond(
                frozen,
                lambda _yh: (jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
                adv_fn,
                y_g_hat,
            )
        total = adv + loss_mel
        aux = {
            "loss_mel": loss_mel,
            "loss_gen": loss_gen,
            "loss_fm": loss_fm,
            "y_g_hat": y_g_hat,
        }
        return total, aux

    def step_fn(state: Stage2TrainState, batch):
        frozen = state.step < freeze_step
        lr = _exp_lr(learning_rate, lr_decay, state.step)

        # ---- D phase on detached generator output (reference :1025-1059)
        y = batch["audio"][:, None, :]

        def d_phase(disc_params, disc_opt):
            # the detached forward lives INSIDE the phase so the freeze
            # cond below skips the generator work too, not just the towers
            y_hat_sg = jax.lax.stop_gradient(
                gen_apply(state.gen_params, batch["mel"])
            )
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
                disc_params, y, y_hat_sg
            )
            d_updates, disc_opt = tx_d.update(d_grads, disc_opt, disc_params)
            d_updates = jax.tree_util.tree_map(lambda u: -lr * u, d_updates)
            return optax.apply_updates(disc_params, d_updates), disc_opt, d_loss

        if freeze_step == 0:
            disc_params, disc_opt, d_loss = d_phase(
                state.disc_params, state.disc_opt
            )
        else:
            # skip the D forward/backward entirely during the freeze
            # (reference simply doesn't call optim_d.step(), :1053-1058 —
            # moments stay untouched; d_loss reports 0 while frozen).
            # ``lax.cond`` executes only the live branch, recovering the
            # ~40% of step time an always-compute-then-zero gate wastes.
            disc_params, disc_opt, d_loss = jax.lax.cond(
                frozen,
                lambda p, o: (p, o, jnp.zeros(())),
                d_phase,
                state.disc_params,
                state.disc_opt,
            )

        # ---- G phase (reference :1060-1102)
        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params, disc_params, batch, frozen
        )
        g_grad_norm = optax.global_norm(g_grads)
        g_updates, gen_opt = tx_g.update(g_grads, state.gen_opt, state.gen_params)
        g_updates = jax.tree_util.tree_map(lambda u: -lr * u, g_updates)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = Stage2TrainState(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=gen_opt,
            disc_opt=disc_opt,
        )
        metrics = {
            "loss_disc": d_loss,
            "loss_gen_all": g_loss,
            "loss_mel": aux["loss_mel"] / lambda_melloss,
            "loss_fm": aux["loss_fm"],
            "grad_norm_g": g_grad_norm,
            "lr": lr,
        }
        return new_state, metrics

    # donate=False only disables buffer donation; the step is ALWAYS jitted
    # (an eager GAN step dispatches every op separately — unusably slow).
    return init_fn, jax.jit(step_fn, donate_argnums=(0,) if donate else ())
