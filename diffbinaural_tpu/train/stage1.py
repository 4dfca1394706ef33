"""Stage-1 diffusion training: one jitted step, data-parallel over a Mesh.

Capability parity with the reference epoch loop
(/root/reference/DiffBinaural/train_realBinaural.py:244-345 +
train_fairplay.py:376-390):

  * joint (frame-encoder, UNet) AdamW with two LR groups — lr_unet for the
    denoiser, lr_frame for the conditioning head (create_optimizer :326-332;
    torch AdamW defaults β=(0.9, 0.999), wd=1e-2)
  * LR ×0.95 at `lr_steps` epochs and ×decay_factor every
    `learning_rate_decrease_itr` epochs (:334-344, :461-467) — expressed as
    a host-fed multiplicative ``lr_scale`` carried in the train state, so LR
    changes never recompile the step
  * global-norm grad clip 1.0 (training_stabilizer.py:13-49) fused into the
    step, with the pre-clip norm returned for the stabiliser
  * diffusion loss with CFG dropout p=0.1 and the noised-mix condition
    (diffusion_pytorch.py:434-472 — see diffusion.gaussian)

The reference's DataParallel scatter/gather becomes a NamedSharding over the
mesh 'data' axis: batch sharded, params replicated, gradient all-reduce
inserted by XLA.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion import GaussianDiffusion
from ..infer.stage1 import normalize_mel


class Stage1TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any            # {'frame': ..., 'unet': ...}
    opt_state: Any
    lr_scale: jnp.ndarray  # host-updated multiplicative LR factor


def make_stage1_train_step(
    unet_apply: Callable,
    visual_apply: Optional[Callable] = None,
    diffusion: Optional[GaussianDiffusion] = None,
    lr_unet: float = 1e-4,
    lr_frame: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    weight_decay: float = 1e-2,
    clip_norm: float = 1.0,
    clip_value: Optional[float] = None,
    cfg: bool = True,
    donate: bool = True,
):
    """Returns (init_fn, step_fn).

    step_fn(state, batch, rng) → (state, metrics); batch keys:
      'mono_mel' (B,1,H,W), 'binaural_mel' (B,2,H,W) in RAW ln-mel range,
      plus either precomputed 'feat' (B,512) or ('frames','pos','mask') for
      the live visual-encoder path.
    """
    diffusion = diffusion or GaussianDiffusion(
        image_size=80, timesteps=1000, sampling_timesteps=25,
        loss_type="l1", objective="pred_noise", beta_schedule="cosine",
        auto_normalize=False,
    )
    # AdamW = clip → adam moments → decoupled weight decay → per-group LR.
    # clip_value mirrors GradientStabilizer's optional clip_grad_value_
    # (training_stabilizer.py:42-43, applied after the norm clip); the
    # reference's shipped TrainingStabilizer leaves it None (:176), so the
    # default here is also off.
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        *([optax.clip(clip_value)] if clip_value is not None else []),
        optax.scale_by_adam(b1=b1, b2=b2),
        optax.add_decayed_weights(weight_decay),
    )
    group_lr = {"unet": lr_unet, "frame": lr_frame}

    def init_fn(params) -> Stage1TrainState:
        return Stage1TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            lr_scale=jnp.ones(()),
        )

    def loss_fn(params, batch, rng):
        mono = normalize_mel(batch["mono_mel"])
        target = normalize_mel(batch["binaural_mel"])
        if "feat" in batch:
            feat = batch["feat"]
        else:
            feat = visual_apply(
                params["frame"], batch["frames"], batch["pos"], batch["mask"]
            )
        # The reference computes a weighted_loss mask (train_fairplay.py:
        # 113-118) that its diffusion engine then ignores
        # (diffusion_pytorch.py:434-472) — we preserve that net behaviour.
        model_fn = lambda x, t, cond: unet_apply(params["unet"], x, t, cond)
        return diffusion.p_losses(model_fn, rng, target, (mono, feat), cfg=cfg)

    def step_fn(state: Stage1TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # per-group LR × host-fed scale (negative: gradient descent)
        updates = {
            k: jax.tree_util.tree_map(
                lambda u: -group_lr[k] * state.lr_scale * u, updates[k]
            )
            for k in updates
        }
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    # donate=False only disables buffer donation (callers that keep the old
    # state alive); the step is ALWAYS jitted — an eager step dispatches the
    # whole fwd+bwd op-by-op and is orders of magnitude slower.
    return init_fn, jax.jit(step_fn, donate_argnums=(0,) if donate else ())
