"""Seed-robustness check for the solver certification winner.

The dpmcheck table (VALIDATION.md) scores every solver from ONE x_T draw
(key 11) on 8 held-out conditions.  ddiml12's non-monotonic neighbourhood
(ddiml16/20 are much worse) makes grid-placement luck a live hypothesis,
so before the bench headline moves to ddiml12 this re-scores the
candidate vs the reference production sampler under K independent noise
draws.  Certification rule: ddiml12 must pass the same 2% gates vs
ddim25 under EVERY draw (pass/fail per draw is paired — same x_T, same
conditions).

Usage:  DPMCHECK_PARAMS=/tmp/dpmcheck_prod_d64.msgpack \
          python -u benchmarks/solver_robust.py [n_keys] [dim] [frames]
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


def main(n_keys=3, dim=64, frames=80, n_clips=256,
         candidates=(("ddiml12", 12, "lambda"),)):
    from diffbinaural_tpu.diffusion import GaussianDiffusion
    from diffbinaural_tpu.infer.stage1 import normalize_mel

    n_eval = 8
    t0 = time.time()
    unet, params, _, (mono, target, feat) = conv.train_stage1_params(
        dim, frames=frames, n_clips=n_clips, steps=1500, batch=16,
        cache=os.environ.get("DPMCHECK_PARAMS", ""), holdout=n_eval,
    )
    diffusion = GaussianDiffusion(
        image_size=80, timesteps=1000, beta_schedule="cosine",
        objective="pred_noise", auto_normalize=False,
    )
    model_fn = lambda x, t, c: unet.apply(params["unet"], x, t, c)
    cond = (normalize_mel(jnp.asarray(mono[:n_eval])),
            jnp.asarray(feat[:n_eval]))
    t_eval = normalize_mel(jnp.asarray(target[:n_eval]))

    # ONE jit per (solver, grid); keys vary as a traced argument
    def make(n, grid):
        kw = {} if grid is None else {"time_grid": grid}
        return jax.jit(lambda c, k: diffusion.ddim_sample(
            model_fn, c, k, sampling_timesteps=n, **kw))

    fns = {"ddim25": make(25, None)}
    for name, n, grid in candidates:
        fns[name] = make(n, grid)

    res = {"run": "solver_seed_robustness", "dim": dim, "n_keys": n_keys,
           "draws": []}
    all_pass = {name: True for name, _, _ in candidates}
    for ki in range(n_keys):
        key = jax.random.PRNGKey(1100 + 97 * ki)
        row = {}
        for name, fn in fns.items():
            x = fn(cond, key)
            row[f"tgt_{name}"] = round(
                float(jnp.mean(jnp.abs(x - t_eval))), 5)
        for name, _, _ in candidates:
            ok = row[f"tgt_{name}"] <= 1.02 * row["tgt_ddim25"]
            row[f"{name}_pass"] = bool(ok)
            all_pass[name] &= ok
        print(f"draw {ki}: " + " ".join(
            f"{k}={v}" for k, v in row.items()))
        res["draws"].append(row)
    for name, _, _ in candidates:
        res[f"{name}_certified_all_draws"] = bool(all_pass[name])
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    main(n_keys=n_keys, dim=dim, frames=frames)
