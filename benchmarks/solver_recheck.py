"""Re-certify the serving sampler on a FRESH training run of the serving
model — the retrain-robustness check the r4 λ-grid certification turned
out to need.

Background: the 2026-08-20 morning certification (solver_eval_r4.log,
VALIDATION.md) was computed on the r3-session training run of the dim=64
stage-1 UNet and found ddim/λ-grid/12 beating uniform DDIM-25 on every
yardstick.  The same evaluation on a *fresh* training run of the same
recipe (same seeds; bf16/tunnel numerics differ run-to-run) tells whether
that certification is a property of the RECIPE or of one particular
parameter draw.  Candidates are the headline-relevant subset (full sweep:
convergence.py dpmcheck); yardsticks are dpmcheck's tgt (L1 to the true
held-out binaural target in normalized mel space) and melrmse (raw
ln-mel RMSE, what evaluation/mel_rmse.py scores).

Usage:  DPMCHECK_PARAMS=/path python -u benchmarks/solver_recheck.py
        [steps batch dim frames n_clips]
Prints one JSON line; archive in benchmarks/results/.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("CONVERGENCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import convergence as conv


def main(steps=1500, batch=16, dim=64, frames=80, n_clips=256, n_eval=8,
         candidates=None, n_draws=3):
    from diffbinaural_tpu.diffusion import GaussianDiffusion
    from diffbinaural_tpu.infer.stage1 import denormalize_mel, normalize_mel

    t0 = time.time()
    unet, params, _, (mono, target, feat) = conv.train_stage1_params(
        dim, frames=frames, n_clips=n_clips, steps=steps, batch=batch,
        cache=os.environ.get("DPMCHECK_PARAMS", ""), holdout=n_eval)

    diff = GaussianDiffusion(image_size=frames, timesteps=1000,
                             beta_schedule="cosine", objective="pred_noise",
                             auto_normalize=False)
    model_fn = lambda x, t, c: unet.apply(params["unet"], x, t, c)
    cond = (normalize_mel(jnp.asarray(mono[:n_eval])),
            jnp.asarray(feat[:n_eval]))
    t_norm = normalize_mel(jnp.asarray(target[:n_eval]))
    t_raw = jnp.asarray(target[:n_eval])
    mono_rep = jnp.repeat(normalize_mel(jnp.asarray(mono[:n_eval])), 2, axis=1)

    if candidates is None:
        candidates = [
            ("ddim120", dict(sampling_timesteps=120)),
            ("ddim25", dict(sampling_timesteps=25)),
            ("ddiml12", dict(sampling_timesteps=12, time_grid="lambda")),
            ("ddim12", dict(sampling_timesteps=12)),
        ]
    gate_name = ("ddim25" if any(n == "ddim25" for n, _ in candidates)
                 else candidates[0][0])
    res = {"run": "solver_recheck", "steps": steps, "dim": dim,
           "frames": frames, "n_eval": n_eval,
           "tgt_monocopy": round(float(jnp.mean(jnp.abs(mono_rep - t_norm))), 4),
           "draws": {}}
    gate_ref = None
    for name, kw in candidates:
        fn = jax.jit(lambda c, k, kw=kw: diff.ddim_sample(model_fn, c, k, **kw))
        tgts, rmses = [], []
        for d in range(n_draws):  # independent x_T draws (solver_robust.py)
            x = fn(cond, jax.random.PRNGKey(11 + 37 * d))
            tgts.append(float(jnp.mean(jnp.abs(x - t_norm))))
            rmses.append(float(jnp.sqrt(jnp.mean(
                (denormalize_mel(x) - t_raw) ** 2))))
        res["draws"][name] = {
            "tgt": [round(v, 4) for v in tgts],
            "melrmse": [round(v, 4) for v in rmses],
            "tgt_mean": round(float(np.mean(tgts)), 4),
            "melrmse_mean": round(float(np.mean(rmses)), 4),
        }
        if name == gate_name:
            gate_ref = res["draws"][name]
        print(f"{name}: tgt {tgts} melrmse {rmses}", flush=True)
    for name in list(res["draws"]):
        if gate_ref and name != gate_name:
            r = res["draws"][name]
            r["passes_2pct_gate"] = bool(
                r["tgt_mean"] <= 1.02 * gate_ref["tgt_mean"]
                and r["melrmse_mean"] <= 1.02 * gate_ref["melrmse_mean"])
            # ADVICE r4: a mean over n_draws noise draws can pass/fail on
            # draw noise alone.  Draw d shares its x_T key across
            # candidates, so gate per paired draw and require ALL to hold;
            # certification keys on this stricter boolean.
            per_draw = [
                bool(r["tgt"][d] <= 1.02 * gate_ref["tgt"][d]
                     and r["melrmse"][d] <= 1.02 * gate_ref["melrmse"][d])
                for d in range(len(r["tgt"]))
            ]
            r["gate_per_draw"] = per_draw
            r["passes_2pct_gate_all_draws"] = bool(all(per_draw))
            r["tgt_spread"] = [round(min(r["tgt"]), 4),
                               round(max(r["tgt"]), 4)]
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res), flush=True)
    return res


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
