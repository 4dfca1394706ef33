"""Training-convergence validation on synthetic-but-LEARNABLE binaural data.

The reference documents expected loss trajectories
(/root/reference/DiffBinaural/README.md:333-348: stage-1 L1 0.5 -> 0.05;
/root/reference/BigVGAN/README.md:265-275: mel error descending, adversarial
losses stable).  Real datasets (FairPlay / RealBinaural) are not available in
this environment, so this script builds an ITD/ILD-coherent synthetic task
that is *learnable by construction* and demonstrates that both production
train steps actually descend — not just compile:

  stage1: mono harmonic tones panned with constant-power ILD + integer-sample
          ITD; the conditioning feature encodes the pan position, so the UNet
          can in principle recover the L/R mel pair from (mono mel, feat).
          Production UNet (dim=64, bf16 matmuls), B=16 AdamW, loss=L1.
  stage2: BigVGAN production config (configs/bigvgan_binaural_22khz_80band_
          256x.json) on the synthetic tone audio with ground-truth mels,
          CQTD+MPD discriminators — records mel-error descent and the
          adversarial-loss balance.

Steps are chunk-scanned inside one jit (per-call dispatch of the full train
state costs ~2 s through the tunnel — see CLAUDE.md); every chunk fetches the
loss trace to the host, which also fences execution.

Usage:
  python -u benchmarks/convergence.py stage1 [steps] [batch]
  python -u benchmarks/convergence.py stage2 [steps] [batch]

Prints a JSON line per run; paste results into VALIDATION.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CONVERGENCE_CPU"):  # pin BEFORE backend init (CLAUDE.md:
    jax.config.update("jax_platforms", "cpu")  # env-var selection is ignored)

import jax.numpy as jnp
import numpy as np

SR = 22050
HOP = 256


def _harmonic_clip(rng, n_samples, f0):
    """Mono harmonic tone with random partial amplitudes + envelope."""
    t = np.arange(n_samples) / SR
    x = np.zeros(n_samples)
    for k in range(1, 5):
        x += rng.uniform(0.1, 1.0) / k * np.sin(
            2 * np.pi * f0 * k * t + rng.uniform(0, 2 * np.pi)
        )
    env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t)
    x = 0.3 * env * x / np.max(np.abs(x))
    return (x + 0.005 * rng.standard_normal(n_samples)).astype(np.float32)


def _pan_binaural(mono, p, max_itd=12):
    """Constant-power pan + integer-sample ITD. p in [-1, 1], +1 = right."""
    theta = (p + 1.0) * np.pi / 4.0
    gl, gr = np.cos(theta), np.sin(theta)
    s = int(round(p * max_itd))
    left = np.roll(mono, max(0, s)) * gl    # source right -> left delayed
    right = np.roll(mono, max(0, -s)) * gr
    return np.stack([left, right]).astype(np.float32)


def _feat_basis(rng):
    """The (u, v) basis that encodes pan position p as feat = p*u + v.
    Drawn FIRST from the dataset rng so held-out clip generators (seeded
    differently for content) can recover the identical training basis."""
    u = rng.standard_normal(512).astype(np.float32)
    u /= np.linalg.norm(u)
    v = rng.standard_normal(512).astype(np.float32)
    v /= np.linalg.norm(v)
    return u, v


def make_stage1_dataset(n_clips=256, frames=80, seed=0):
    """Returns (mono_mel (N,1,80,F), binaural_mel (N,2,80,F), feat (N,512))."""
    from diffbinaural_tpu.data.meldataset import _MelFrontend

    rng = np.random.default_rng(seed)
    mel = _MelFrontend(1024, 80, SR, HOP, 1024, 0.0, None)
    n_samples = frames * HOP + 1024
    u, v = _feat_basis(rng)
    monos, bins, feats = [], [], []
    for _ in range(n_clips):
        f0 = rng.uniform(150.0, 900.0)
        p = rng.uniform(-1.0, 1.0)
        x = _harmonic_clip(rng, n_samples, f0)
        y = _pan_binaural(x, p)
        monos.append(mel(x)[None, :, :frames])
        bins.append(np.stack([mel(ch)[:, :frames] for ch in y]))
        feats.append(p * u + v)
    return (
        np.stack(monos).astype(np.float32),
        np.stack(bins).astype(np.float32),
        np.stack(feats).astype(np.float32),
    )


def run_stage1(steps=400, batch=16, chunk=25, n_clips=256):
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.train import make_stage1_train_step

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    print(f"building stage-1 synthetic dataset ({n_clips} clips)...")
    mono, target, feat = make_stage1_dataset(n_clips)
    data = jax.device_put(
        {
            "mono_mel": jnp.asarray(mono),
            "binaural_mel": jnp.asarray(target),
            "feat": jnp.asarray(feat),
        },
        tpu,
    )

    unet = AudioVisualModel(dim=64, dtype=jnp.bfloat16)
    with jax.default_device(cpu):
        params = {
            "unet": unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 2, 80, 80)),
                jnp.zeros((1,), jnp.int32),
                (jnp.zeros((1, 1, 80, 80)), jnp.zeros((1, 512)),
                 jnp.zeros((1, 2, 80, 80))),
            )
        }
    params = jax.device_put(params, tpu)
    init_fn, step_fn = make_stage1_train_step(
        unet_apply=lambda p, x, t, c: unet.apply(p, x, t, c),
        lr_unet=1e-4, donate=False,
    )
    state = init_fn(params)

    @jax.jit
    def run_chunk(state, rng):
        def body(st, i):
            r = jax.random.fold_in(rng, i)
            idx = jax.random.randint(r, (batch,), 0, n_clips)
            b = {k: v[idx] for k, v in data.items()}
            st, m = step_fn(st, b, jax.random.fold_in(r, 1))
            return st, m["loss"]

        return jax.lax.scan(body, state, jnp.arange(chunk))

    rng = jax.random.PRNGKey(42)
    losses = []
    t0 = time.time()
    for c in range(-(-steps // chunk)):
        state, chunk_losses = run_chunk(state, jax.random.fold_in(rng, c))
        chunk_losses = np.asarray(chunk_losses)  # host fetch = fence
        losses.extend(chunk_losses.tolist())
        print(f"step {min((c + 1) * chunk, steps):4d}  "
              f"loss {chunk_losses.mean():.4f}")
    dt = time.time() - t0
    losses = np.asarray(losses[:steps])
    first, last = float(losses[:20].mean()), float(losses[-20:].mean())
    print(json.dumps({
        "run": "stage1_convergence", "steps": steps, "batch": batch,
        "loss_first20": round(first, 4), "loss_last20": round(last, 4),
        "loss_every_50": [round(float(x), 4) for x in losses[::50]],
        "descended": bool(last < 0.6 * first),
        "wall_s": round(dt, 1),
    }))


def train_stage1_params(dim, frames=80, n_clips=256, steps=1500, batch=16,
                        cache="", lr=2e-4, seed=0, holdout=0):
    """Train (or load from ``cache``) stage-1 UNet params on the panned-tone
    task at the given architecture size.  The first ``holdout`` clips of the
    seed-``seed`` dataset are excluded from training (eval conditions).
    Returns (unet_module, params, losses, (mono, target, feat)) — losses are
    NaN when loaded from cache.  Shared by dpmcheck and benchmarks/quality.py
    so both validations score the SAME trained score field."""
    from diffbinaural_tpu.core import checkpoint as ckpt
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.train import make_stage1_train_step

    print(f"building dataset ({n_clips} clips, {frames} frames, dim={dim})...")
    mono, target, feat = make_stage1_dataset(n_clips, frames=frames, seed=seed)
    dev = jax.devices()[0]
    data = jax.device_put({
        "mono_mel": jnp.asarray(mono[holdout:]),
        "binaural_mel": jnp.asarray(target[holdout:]),
        "feat": jnp.asarray(feat[holdout:]),
    }, dev)
    n_train = n_clips - holdout

    # production serving runs bf16 matmuls; match it at production dim so
    # downstream solver/quality comparisons see the score field the
    # pipeline actually uses
    unet = AudioVisualModel(
        dim=dim, dtype=jnp.bfloat16 if dim >= 64 else jnp.float32
    )
    with jax.default_device(jax.devices("cpu")[0]):
        params = {
            "unet": unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 2, 80, frames)),
                jnp.zeros((1,), jnp.int32),
                (jnp.zeros((1, 1, 80, frames)), jnp.zeros((1, 512)),
                 jnp.zeros((1, 2, 80, frames))),
            )
        }
    params = jax.device_put(params, dev)
    init_fn, step_fn = make_stage1_train_step(
        unet_apply=lambda p, x, t, c: unet.apply(p, x, t, c),
        lr_unet=lr, donate=False,
    )
    state = init_fn(params)
    losses = [float("nan")] * steps
    if cache and os.path.exists(cache):
        print(f"loading cached stage-1 params from {cache}")
        final = ckpt.load_checkpoint(cache, target=state.params)
        return unet, final, losses, (mono, target, feat)

    chunk = min(50, steps)

    @jax.jit
    def run_chunk(state, rng, idxs):
        def body(st, i):
            r = jax.random.fold_in(rng, i)
            idx = jax.random.randint(r, (batch,), 0, n_train)
            b = {k: v[idx] for k, v in data.items()}
            st, m = step_fn(st, b, jax.random.fold_in(r, 1))
            return st, m["loss"]

        return jax.lax.scan(body, state, idxs)

    rng = jax.random.PRNGKey(7)
    losses = []
    done = 0
    while done < steps:
        # last chunk may be short: jit caches at most two scan lengths
        # (ADVICE r3: steps=4 used to silently run 50 optimizer steps)
        n = min(chunk, steps - done)
        state, ls = run_chunk(
            state, jax.random.fold_in(rng, done), jnp.arange(done, done + n))
        losses.extend(np.asarray(ls).tolist())
        done += n
        print(f"step {done:4d}  loss {np.asarray(ls).mean():.4f}")
    losses = losses[:steps]
    if cache:
        ckpt.save_checkpoint(cache, state.params)
        print(f"saved trained stage-1 params to {cache}")
    return unet, state.params, losses, (mono, target, feat)


def run_dpmcheck(steps=600, batch=8, frames=16, n_clips=64, dim=16,
                 grids=False):
    """Solver-accuracy check on a TRAINED model of the real architecture.

    A random-init UNet is not a score field (measured: DPM-12 is WORSE
    than DDIM-25 on random weights — second-order extrapolation amplifies
    the non-smoothness), so the DPM claim is only meaningful once the net
    approximates a real score.  This trains the UNet on the panned-
    tone task until L1 clearly descends, then compares solvers against a
    120-step DDIM ground truth on held-out conditions, all in the
    NORMALIZED mel space the model was trained in (the train step
    normalizes internally — conditioning on raw ln-mels is off-manifold
    and was measured to send every solver to a different endpoint).
    CPU-runnable at the toy default (dim=16, 16 frames); the PRODUCTION
    validation is ``dpmcheck 1500 16 64 80 256`` on TPU (dim=64, 80x80
    windows — the exact serving architecture).  Set DPMCHECK_PARAMS=/path
    to cache/reuse the trained params across reruns of the eval.

    ``grids=True`` (CLI mode ``gridsweep``) additionally re-runs the DPM
    time-grid sweep from diffusion/gaussian._dpm_time_pairs on the TRAINED
    net (t-uniform / power-p / λ-uniform / Karras-ρ at NFE 8 and 12),
    scoring each grid by tgt (L1 to the true held-out target) — the
    trained-model justification for the shipped power-2.5 default, which
    the analytic-GMM sweep alone could not give.
    """
    from diffbinaural_tpu.diffusion import GaussianDiffusion
    from diffbinaural_tpu.infer.stage1 import denormalize_mel, normalize_mel

    n_eval = 8
    t0 = time.time()
    unet, final_params, losses, (mono, target, feat) = train_stage1_params(
        dim, frames=frames, n_clips=n_clips, steps=steps, batch=batch,
        cache=os.environ.get("DPMCHECK_PARAMS", ""), holdout=n_eval,
    )

    diffusion = GaussianDiffusion(
        image_size=80, timesteps=1000, beta_schedule="cosine",
        objective="pred_noise", auto_normalize=False,
    )
    model_fn = lambda x, t, c: unet.apply(final_params["unet"], x, t, c)
    # the model lives in NORMALIZED mel space (train/stage1.py:92-93)
    cond = (normalize_mel(jnp.asarray(mono[:n_eval])),
            jnp.asarray(feat[:n_eval]))
    key = jax.random.PRNGKey(11)
    gt = diffusion.ddim_sample(model_fn, cond, key, sampling_timesteps=120)

    # TWO yardsticks, deliberately:
    #   err_*      — trajectory distance to the DDIM-120 endpoint.  Only
    #                meaningful between DDIM step counts (coarse vs fine
    #                grid of the SAME update rule).  DPM-Solver++ converges
    #                to a slightly different endpoint on a rough learned
    #                score field (the per-step mix_t refresh makes the
    #                effective dynamics discretisation-dependent), so a
    #                plateauing err_dpm* does NOT measure sample quality.
    #   tgt_*      — L1 to the TRUE held-out binaural target in normalized
    #                mel space: the product metric (what evaluation/
    #                mel_rmse.py scores).  This is the gate for serving-
    #                mode step counts: dpm-N parity means tgt_dpmN is
    #                within tol of tgt_ddim25.
    t_eval = normalize_mel(jnp.asarray(target[:n_eval]))

    def sample(n, fn, **kw):
        # one fresh jit per (solver, n, grid): eager dispatch of a 25-step
        # scan through the tunnel is minutes at production size
        return jax.jit(
            lambda c, k: fn(model_fn, c, k, sampling_timesteps=n, **kw)
        )(cond, key)

    def err(x):
        return float(jnp.mean(jnp.abs(x - gt)))

    def tgt(x):
        return float(jnp.mean(jnp.abs(x - t_eval)))

    t_raw = jnp.asarray(target[:n_eval])

    def melrmse(x):
        # e2e product metric: RMSE in raw ln-mel space (the units
        # evaluation/mel_rmse.py scores), denormalized sample vs true target
        return float(jnp.sqrt(jnp.mean(
            (denormalize_mel(x) - t_raw) ** 2)))

    res = {
        "run": "dpm_vs_ddim_trained", "steps": steps, "dim": dim,
        "frames": frames, "n_clips": n_clips,
        "loss_first20": round(float(np.mean(losses[:20])), 4),
        "loss_last20": round(float(np.mean(losses[-20:])), 4),
        "tgt_ddim120": round(tgt(gt), 5),
        "melrmse_ddim120": round(melrmse(gt), 5),
        "wall_s": 0.0,
    }
    tgt_raw = {}  # unrounded, for gate comparisons (rounding can flip a gate)
    melrmse_raw = {}
    for name, n, fn, kw in (
        ("ddim25", 25, diffusion.ddim_sample, {}),
        ("ddim12", 12, diffusion.ddim_sample, {}),
        # uniform-grid DDIM at intermediate NFE: the r4 certification
        # candidates after every fancy solver/grid LOST to uniform DDIM at
        # production scale (benchmarks/results/solver_eval.log) — the open
        # question is simply how few uniform steps still pass the 2% gate
        ("ddim16", 16, diffusion.ddim_sample, {}),
        ("ddim20", 20, diffusion.ddim_sample, {}),
        ("ddim22", 22, diffusion.ddim_sample, {}),
        # λ-uniform under the DDIM update rule (λ was the best DPM grid by
        # far at production scale; never yet tried with DDIM updates)
        ("ddiml12", 12, diffusion.ddim_sample, {"time_grid": "lambda"}),
        ("ddiml16", 16, diffusion.ddim_sample, {"time_grid": "lambda"}),
        ("ddiml20", 20, diffusion.ddim_sample, {"time_grid": "lambda"}),
        ("ddimk16", 16, diffusion.ddim_sample, {"time_grid": "karras7"}),
        ("ddimk20", 20, diffusion.ddim_sample, {"time_grid": "karras7"}),
        # SAME DDIM update rule, terminal-at-zero power grid (the few-step
        # serving candidate after DPM-Solver++ failed the production-scale
        # gate — 2M extrapolation lands at a systematically worse endpoint
        # on the trained attention UNet's rough score field)
        ("ddimp10", 10, diffusion.ddim_sample, {"time_grid": "power2.5"}),
        ("ddimp12", 12, diffusion.ddim_sample, {"time_grid": "power2.5"}),
        ("ddimp14", 14, diffusion.ddim_sample, {"time_grid": "power2.5"}),
        ("ddimp16", 16, diffusion.ddim_sample, {"time_grid": "power2.5"}),
        ("ddimp20", 20, diffusion.ddim_sample, {"time_grid": "power2.5"}),
        ("dpm8", 8, diffusion.dpm_sample, {}),
        ("dpm10", 10, diffusion.dpm_sample, {}),
        ("dpm12", 12, diffusion.dpm_sample, {}),
        ("dpm16", 16, diffusion.dpm_sample, {}),
        ("dpm25", 25, diffusion.dpm_sample, {}),
        # λ-uniform was the best DPM grid at production scale (r3 gridsweep:
        # tgt 0.1429 @ NFE 12 vs power2.5's 0.2075) — test whether more
        # steps close its remaining gap to ddim25
        ("dpml12", 12, diffusion.dpm_sample, {"time_grid": "lambda"}),
        ("dpml16", 16, diffusion.dpm_sample, {"time_grid": "lambda"}),
        ("dpml20", 20, diffusion.dpm_sample, {"time_grid": "lambda"}),
    ):
        x = sample(n, fn, **kw)
        tgt_raw[name] = tgt(x)
        melrmse_raw[name] = melrmse(x)
        res[f"err_{name}"] = round(err(x), 5)
        res[f"tgt_{name}"] = round(tgt_raw[name], 5)
        res[f"melrmse_{name}"] = round(melrmse_raw[name], 5)
        print(f"  {name}: tgt={tgt_raw[name]:.5f} "
              f"melrmse={melrmse_raw[name]:.5f}")
    # quality gates: within 2% of the DDIM-25 target error (or better).
    # These tgt_* gates are the ONLY serving-mode quality claim here; err_*
    # is a DDIM-grid diagnostic and is never compared across solvers (see
    # the yardstick comment above).
    for nm in ("dpm8", "dpm10", "dpm12", "dpml12", "dpml16", "dpml20",
               "ddimp10", "ddimp12", "ddimp14", "ddimp16", "ddimp20",
               "ddim12", "ddim16", "ddim20", "ddim22",
               "ddiml12", "ddiml16", "ddiml20", "ddimk16", "ddimk20"):
        res[f"{nm}_quality_parity"] = bool(
            tgt_raw[nm] <= 1.02 * tgt_raw["ddim25"])
        res[f"{nm}_melrmse_parity"] = bool(
            melrmse_raw[nm] <= 1.02 * melrmse_raw["ddim25"])
    if grids:
        # trained-net re-sweep of the DPM time grid (VERDICT r2 item 7):
        # same trained score field, same x_T, only the grid varies
        for g in ("power1", "power1.5", "power2", "power2.5", "power3",
                  "lambda", "karras7"):
            for n in (8, 12):
                x = sample(n, diffusion.dpm_sample, time_grid=g)
                res[f"grid_{g}_dpm{n}_tgt"] = round(tgt(x), 5)
                print(f"  grid {g} dpm{n}: tgt={res[f'grid_{g}_dpm{n}_tgt']}")
        # the same grid family under the DDIM update rule (the production
        # serving candidate): which discretisation serves best at low NFE?
        for g in ("power1.5", "power2", "power2.5", "power3",
                  "lambda", "karras7"):
            for n in (10, 12):
                x = sample(n, diffusion.ddim_sample, time_grid=g)
                res[f"grid_{g}_ddim{n}_tgt"] = round(tgt(x), 5)
                print(f"  grid {g} ddim{n}: "
                      f"tgt={res[f'grid_{g}_ddim{n}_tgt']}")
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res))


def make_stage2_dataset(n_segs=64, seg=16384, seed=1):
    rng = np.random.default_rng(seed)
    segs = []
    for _ in range(n_segs):
        x = _harmonic_clip(rng, seg, rng.uniform(150.0, 900.0))
        segs.append(x)
    return np.stack(segs).astype(np.float32)


def run_stage2(steps=1000, batch=16, chunk=25):
    """Trains the production BigVGAN GAN step on the synthetic-tone task.
    Set STAGE2_PARAMS=/path to cache the trained generator params (reused
    by benchmarks/quality.py); returns the final generator params."""
    from diffbinaural_tpu.cli.gan_common import build_discriminators
    from diffbinaural_tpu.core import checkpoint as ckpt
    from diffbinaural_tpu.core.config import AttrDict, VocoderConfig
    from diffbinaural_tpu.losses import MultiScaleMelSpectrogramLoss
    from diffbinaural_tpu.models.bigvgan import BigVGAN
    from diffbinaural_tpu.signal import mel_spectrogram
    from diffbinaural_tpu.train import make_stage2_train_step

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
            "configs/bigvgan_binaural_22khz_80band_256x.json")) as f:
        h = AttrDict(json.load(f))
    cfg = VocoderConfig.from_attrdict(h)
    seg = h["segment_size"]

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    gen = BigVGAN(cfg, dtype=jnp.bfloat16)
    mpd, mrd = build_discriminators(h)
    msl = MultiScaleMelSpectrogramLoss(h["sampling_rate"])

    def mel_fn(wav):
        return mel_spectrogram(
            wav, h["n_fft"], h["num_mels"], h["sampling_rate"],
            h["hop_size"], h["win_size"], h["fmin"], h.get("fmax_for_loss"),
        )

    print("building stage-2 synthetic dataset...")
    n_segs = 64
    audio_np = make_stage2_dataset(n_segs, seg)
    audio = jax.device_put(jnp.asarray(audio_np), tpu)
    mels = jax.jit(mel_fn)(audio)  # ground-truth mels (fine-tuning=GT case)

    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        mel0 = jnp.zeros((1, h["num_mels"], 16))
        audio0 = jnp.zeros((1, 1, 16 * h["hop_size"]))
        gen_params = gen.init(rng, mel0)
        disc_params = {
            "mpd": mpd.init(rng, audio0, audio0),
            "mrd": mrd.init(rng, audio0, audio0),
        }
    cache = os.environ.get("STAGE2_PARAMS", "")
    if cache and os.path.exists(cache):
        print(f"loading cached stage-2 generator params from {cache}")
        return ckpt.load_checkpoint(cache, target=gen_params)

    gen_params = jax.device_put(gen_params, tpu)
    disc_params = jax.device_put(disc_params, tpu)

    init_fn, step_fn = make_stage2_train_step(
        gen_apply=lambda p, m: gen.apply(p, m),
        mpd_apply=lambda p, y, yh: mpd.apply(p, y, yh),
        mrd_apply=lambda p, y, yh: mrd.apply(p, y, yh),
        mel_fn=mel_fn,
        multiscale_mel_loss=msl,
        learning_rate=h["learning_rate"],
        adam_b1=h["adam_b1"], adam_b2=h["adam_b2"], lr_decay=h["lr_decay"],
        clip_grad_norm=h.get("clip_grad_norm", 1000.0),
        lambda_melloss=h.get("lambda_melloss", 45.0),
        use_multiscale_melloss=h.get("use_multiscale_melloss", False),
        remat=batch * seg > 16 * 16384,
        donate=False,
    )
    state = init_fn(gen_params, disc_params)

    @jax.jit
    def run_chunk(state, rng):
        def body(st, i):
            r = jax.random.fold_in(rng, i)
            idx = jax.random.randint(r, (batch,), 0, n_segs)
            b = {"mel": mels[idx], "audio": audio[idx], "mel_loss": mels[idx]}
            st, m = step_fn(st, b)
            return st, (m["loss_mel"], m["loss_disc"], m["loss_gen_all"])

        return jax.lax.scan(body, state, jnp.arange(chunk))

    rng = jax.random.PRNGKey(7)
    mel_l, disc_l, gen_l = [], [], []
    t0 = time.time()
    for c in range(-(-steps // chunk)):
        state, (lm, ld, lg) = run_chunk(state, jax.random.fold_in(rng, c))
        lm = np.asarray(lm)  # host fetch = fence
        mel_l.extend(lm.tolist())
        disc_l.extend(np.asarray(ld).tolist())
        gen_l.extend(np.asarray(lg).tolist())
        print(f"step {min((c + 1) * chunk, steps):5d}  mel {lm.mean():7.3f}  "
              f"disc {np.asarray(ld).mean():6.3f}  "
              f"gen {np.asarray(lg).mean():6.3f}")
    dt = time.time() - t0
    mel_l = np.asarray(mel_l[:steps])
    disc_l = np.asarray(disc_l[:steps])
    first, last = float(mel_l[:25].mean()), float(mel_l[-25:].mean())
    print(json.dumps({
        "run": "stage2_convergence", "steps": steps, "batch": batch,
        "mel_first25": round(first, 3), "mel_last25": round(last, 3),
        "mel_every_100": [round(float(x), 3) for x in mel_l[::100]],
        "disc_every_100": [round(float(x), 3) for x in disc_l[::100]],
        "mel_descended": bool(last < 0.7 * first),
        "disc_alive": bool(0.01 < float(disc_l[-100:].mean()) < 10.0),
        "wall_s": round(dt, 1),
    }))
    cache = os.environ.get("STAGE2_PARAMS", "")
    if cache:
        ckpt.save_checkpoint(cache, state.gen_params)
        print(f"saved trained generator params to {cache}")
    return state.gen_params


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stage1"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else (
        400 if mode == "stage1" else 1000
    )
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    if mode == "stage1":
        run_stage1(steps=steps, batch=batch)
    elif mode == "stage2":
        run_stage2(steps=steps, batch=batch)
    elif mode in ("dpmcheck", "gridsweep"):
        # dpmcheck [steps] [batch] [dim] [frames] [n_clips]
        # toy (CPU-runnable): dpmcheck          -> 600 8 16 16 64
        # production (TPU):   dpmcheck 1500 16 64 80 256
        if len(sys.argv) <= 2:
            steps = 600
        if len(sys.argv) <= 3:
            batch = 8
        dim = int(sys.argv[4]) if len(sys.argv) > 4 else 16
        frames = int(sys.argv[5]) if len(sys.argv) > 5 else 16
        n_clips = int(sys.argv[6]) if len(sys.argv) > 6 else 64
        run_dpmcheck(steps=steps, batch=batch, dim=dim, frames=frames,
                     n_clips=n_clips, grids=(mode == "gridsweep"))
    else:
        raise SystemExit(f"unknown mode {mode}")
