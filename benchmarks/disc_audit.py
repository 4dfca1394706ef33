"""bf16-discriminator precision audit (VERDICT r4 next-round #8).

`build_discriminators(h, dtype=bf16)` (config "discriminator_bf16") casts
ONLY the conv stacks to bf16 — the STFT/CQT spectral frontends stay fp32
and the GAN/feature-matching losses upcast to fp32 (gan_common.py:40-58
docstring).  Before any training-perf number with bf16 discriminators on
can be trusted, this audit quantifies what the cast does to the training
signal on realistic inputs:

  1. discriminator LOGITS: relative error bf16 vs fp32;
  2. the three LOSSES that feed optimisers (disc LS-GAN loss, generator
     adversarial loss, feature-matching loss): relative error;
  3. GENERATOR-side gradient of (adv + fm) loss w.r.t. the fake audio:
     cosine similarity + relative L2 error bf16 vs fp32 — the quantity
     that actually steers training.

Run (CPU, ~2-4 min):  CONVERGENCE_CPU=1 python -u benchmarks/disc_audit.py
Prints one JSON line; archive in benchmarks/results/ + VALIDATION.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CONVERGENCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import convergence as conv


def main(seg=16384, batch=2):
    from diffbinaural_tpu.cli.gan_common import build_discriminators
    from diffbinaural_tpu.core.config import AttrDict
    from diffbinaural_tpu.losses import (
        discriminator_loss,
        feature_loss,
        generator_loss,
    )

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
            "configs/bigvgan_binaural_22khz_80band_256x.json")) as f:
        h = AttrDict(json.load(f))

    t0 = time.time()
    audio = conv.make_stage2_dataset(batch, seg, seed=3)
    y = jnp.asarray(audio)[:, None, :]
    # "fake" = ground truth + small broadband error, the late-training
    # regime where precision matters most (early training errors are huge
    # and bf16 noise is irrelevant)
    rng = np.random.default_rng(0)
    y_hat = y + 0.03 * jnp.asarray(
        rng.standard_normal(y.shape).astype(np.float32))

    res = {"run": "disc_bf16_audit", "seg": seg, "batch": batch}
    for name in ("mpd", "mrd"):
        d32 = build_discriminators(h, dtype=jnp.float32)[0 if name == "mpd"
                                                         else 1]
        d16 = build_discriminators(h, dtype=jnp.bfloat16)[0 if name == "mpd"
                                                          else 1]
        params = d32.init(jax.random.PRNGKey(1), y, y_hat)

        def heads(d, p):
            rs, gs, fr, fg = d.apply(p, y, y_hat)
            l_d, _, _ = discriminator_loss(rs, gs)
            l_g, _ = generator_loss(gs)
            l_fm = feature_loss(fr, fg)
            return rs, gs, l_d, l_g, l_fm

        rs32, gs32, ld32, lg32, lfm32 = heads(d32, params)
        rs16, gs16, ld16, lg16, lfm16 = heads(d16, params)

        def rel(a, b):
            a = np.concatenate([np.ravel(np.asarray(x, np.float64))
                                for x in jax.tree_util.tree_leaves(a)])
            b = np.concatenate([np.ravel(np.asarray(x, np.float64))
                                for x in jax.tree_util.tree_leaves(b)])
            return float(np.linalg.norm(a - b)
                         / max(np.linalg.norm(b), 1e-12))

        # generator-side gradient wrt the fake audio (what steers training)
        def gen_side(d, p, yh):
            _, gs, fr, fg = d.apply(p, y, yh)
            l_g, _ = generator_loss(gs)
            return l_g + feature_loss(jax.lax.stop_gradient(fr), fg)

        g32 = jax.grad(lambda yh: gen_side(d32, params, yh))(y_hat)
        g16 = jax.grad(lambda yh: gen_side(d16, params, yh))(y_hat)
        a = np.ravel(np.asarray(g32, np.float64))
        b = np.ravel(np.asarray(g16, np.float64))
        cos = float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b),
                                1e-20))
        res[name] = {
            "logits_rel_err": round(rel((rs16, gs16), (rs32, gs32)), 5),
            "loss_disc_rel": round(abs(float(ld16 - ld32))
                                   / max(abs(float(ld32)), 1e-12), 5),
            "loss_gen_rel": round(abs(float(lg16 - lg32))
                                  / max(abs(float(lg32)), 1e-12), 5),
            "loss_fm_rel": round(abs(float(lfm16 - lfm32))
                                 / max(abs(float(lfm32)), 1e-12), 5),
            "gen_grad_cosine": round(cos, 5),
            "gen_grad_rel_l2": round(rel(g16, g32), 5),
        }
        print(name, json.dumps(res[name]), flush=True)
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res), flush=True)
    return res


if __name__ == "__main__":
    main()
