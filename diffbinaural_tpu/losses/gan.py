"""LS-GAN + feature-matching losses (reference: /root/reference/BigVGAN/loss.py:215-257)."""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """Σ mean|fr − fg| over every fmap of every sub-discriminator, ×2
    (reference loss.py:215-225).  Real fmaps are treated as constants by the
    caller (stop_gradient before the G step, mirroring torch's detached D)."""
    losses = []
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            # upcast: with bf16 discriminator compute the fmaps arrive in
            # bf16; the L1 reduction must accumulate in fp32
            losses.append(
                jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
            )
    return 2.0 * sum(losses)


def discriminator_loss(
    disc_real_outputs, disc_generated_outputs
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """LS-GAN D loss: mean (1−D(y))² + D(ŷ)² per sub-discriminator
    (reference loss.py:228-243)."""
    losses, r_losses, g_losses = [], [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        losses.append(r_loss + g_loss)
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return sum(losses), r_losses, g_losses


def generator_loss(disc_outputs) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """LS-GAN G loss: mean (1−D(ŷ))² (reference loss.py:246-257)."""
    gen_losses = [
        jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2) for dg in disc_outputs
    ]
    return sum(gen_losses), gen_losses
