"""Score the trained stack's OWN audio with the shipped metric battery.

VERDICT r2 missing #1 / next-round item 3: the reference closes its loop by
scoring generated binaural audio (test_realBinaural.py -> inference_e2e.py ->
/root/reference/DiffBinaural/evaluate_binaural_22050.py:695-831).  Real
FairPlay/RealBinaural data is unavailable in this environment, so this
harness closes the same loop on the synthetic ILD/ITD-panned task whose
ground-truth spatial cues are known by construction:

  1. train stage-1 (production UNet architecture) on panned harmonic tones
     (benchmarks/convergence.train_stage1_params — cached via
     QUALITY_S1_PARAMS / DPMCHECK_PARAMS);
  2. train stage-2 (production BigVGAN config) on the tone audio
     (convergence.run_stage2 — cached via STAGE2_PARAMS), or a tiny
     vocoder in the CPU-runnable toy mode;
  3. run the full fused BinauralPipeline (mono ln-mel + pan feature ->
     stereo waveform, the exact serving path bench.py times) on HELD-OUT
     clips the trainer never saw;
  4. score with evaluation/metrics.py + evaluation/pesq.py against ground
     truth, side by side with the mono-copy baseline (centre-panned mono
     in both ears — the "no spatialisation" prediction, the comparison
     the reference's evaluation section draws).

Expected physics: ILD/IACC/mel-RMSE/envelope improve over mono-copy (level
cues live in the mels the UNet predicts); ITD is reported but NOT gated —
the +-12-sample (<0.6 ms) interaural delays are sub-hop (256 samples), so
no mel-domain pipeline (reference included) can encode them, and the two
channels are vocoded as independent batch items with unrelated phase.

Usage:
  python -u benchmarks/quality.py prod [s1_steps] [s2_steps] [n_eval]
      # TPU: defaults 1500 / 2000 / 6, dim=64, 240-frame eval clips
  python -u benchmarks/quality.py toy  [s1_steps] [s2_steps] [n_eval]
      # CPU smoke: dim=16, 16-frame windows, tiny vocoder

Prints a JSON line; paste into VALIDATION.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CONVERGENCE_CPU"):  # pin BEFORE backend init (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import convergence as conv

SR = 22050
HOP = 256


def make_quality_clips(n_clips, total_frames, seed=12345, train_seed=0):
    """Held-out full-length clips: content drawn from ``seed`` (disjoint
    from the training stream) but pan features encoded with the SAME
    (u, v) basis the seed-``train_seed`` training set used."""
    from diffbinaural_tpu.data.meldataset import _MelFrontend

    u, v = conv._feat_basis(np.random.default_rng(train_seed))
    rng = np.random.default_rng(seed)
    mel = _MelFrontend(1024, 80, SR, HOP, 1024, 0.0, None)
    n_samples = total_frames * HOP + 1024
    clips = []
    for _ in range(n_clips):
        f0 = rng.uniform(150.0, 900.0)
        p = rng.uniform(-1.0, 1.0)
        x = conv._harmonic_clip(rng, n_samples, f0)
        y = conv._pan_binaural(x, p)
        clips.append({
            "mono_wav": x,
            "gt_wav": y,
            "mono_mel": mel(x)[None, :, :total_frames].astype(np.float32),
            "feat": (p * u + v).astype(np.float32),
            "pan": float(p),
        })
    return clips


def _train_tiny_vocoder(steps, seg=4096, n_segs=16, batch=4):
    """CPU-runnable stand-in for run_stage2 in the toy mode: a 4x4x4x4
    (256x, matching the mel hop) BigVGAN on the tone audio."""
    from diffbinaural_tpu.core.config import VocoderConfig
    from diffbinaural_tpu.losses import MultiScaleMelSpectrogramLoss
    from diffbinaural_tpu.models.bigvgan import BigVGAN
    from diffbinaural_tpu.models.discriminators import (
        MultiPeriodDiscriminator,
        MultiResolutionDiscriminator,
    )
    from diffbinaural_tpu.signal import mel_spectrogram
    from diffbinaural_tpu.train import make_stage2_train_step

    cfg = VocoderConfig(
        num_mels=80, upsample_rates=(4, 4, 4, 4),
        upsample_kernel_sizes=(8, 8, 8, 8), upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    gen = BigVGAN(cfg)
    mpd = MultiPeriodDiscriminator(periods=(2,), channel_mult=0.125)
    mrd = MultiResolutionDiscriminator(resolutions=((128, 32, 128),),
                                       channel_mult=0.25)
    mel_fn = lambda w: mel_spectrogram(w, 1024, 80, SR, HOP, 1024)
    audio = jnp.asarray(conv.make_stage2_dataset(n_segs, seg))
    mels = jax.jit(mel_fn)(audio)
    rng = jax.random.PRNGKey(0)
    gen_params = gen.init(rng, jnp.zeros((1, 80, 16)))
    audio0 = jnp.zeros((1, 1, seg))
    disc_params = {"mpd": mpd.init(rng, audio0, audio0),
                   "mrd": mrd.init(rng, audio0, audio0)}
    msl = MultiScaleMelSpectrogramLoss(SR, n_mels=(5,), window_lengths=(32,))
    init_fn, step_fn = make_stage2_train_step(
        gen_apply=lambda p, m: gen.apply(p, m),
        mpd_apply=lambda p, y, yh: mpd.apply(p, y, yh),
        mrd_apply=lambda p, y, yh: mrd.apply(p, y, yh),
        mel_fn=mel_fn, multiscale_mel_loss=msl, donate=False,
    )
    state = init_fn(gen_params, disc_params)

    @jax.jit
    def run_chunk(state, rng):
        def body(st, i):
            r = jax.random.fold_in(rng, i)
            idx = jax.random.randint(r, (batch,), 0, n_segs)
            b = {"mel": mels[idx], "audio": audio[idx], "mel_loss": mels[idx]}
            st, m = step_fn(st, b)
            return st, m["loss_mel"]

        return jax.lax.scan(body, state, jnp.arange(min(steps, 25)))

    rng = jax.random.PRNGKey(3)
    done = 0
    while done < steps:
        state, lm = run_chunk(state, jax.random.fold_in(rng, done))
        done += int(lm.shape[0])
        print(f"  tiny vocoder step {done}  mel {float(np.mean(lm)):.3f}")
    return gen, state.gen_params


def _score(pred, gt, sr=SR, with_bss=True):
    """One candidate vs ground truth through the full shipped battery
    (evaluation/metrics.py + pesq.py), after the reference's lag
    alignment (evaluate_binaural_22050.py:50-104)."""
    from diffbinaural_tpu.evaluation import metrics as M
    from diffbinaural_tpu.evaluation.pesq import pesq_binaural

    n = min(pred.shape[1], gt.shape[1])
    gt_a, pred_a, _lag = M.align_signals(gt[:, :n], pred[:, :n])
    out = {
        "stft_rmse": M.STFT_RMSE_distance(pred_a, gt_a, sr),
        "mel_rmse": M.MEL_RMSE_distance(pred_a, gt_a, sr=sr),
        "env_dist": M.Envelope_distance(pred_a, gt_a),
        "snr_db": M.calculate_snr(gt_a, pred_a),
        "ild_err_db": M.compute_ild_error(pred_a, gt_a, sr=sr)[0],
        "itd_err_ms": M.compute_itd_error(pred_a, gt_a, sr=sr)[1],
        "iacc_diff": M.compute_iacc_difference(pred_a, gt_a)[0],
        "pesq_mos": pesq_binaural(pred_a, gt_a, sr),
    }
    if with_bss:
        sar, sir, sdr = M.compute_sar_sir_sdr(pred_a, gt_a)
        out["sdr_db"] = sdr
    return out


def run_quality(tiny=False, s1_steps=None, s2_steps=None, n_eval=6,
                sampler="ddim", sampling_timesteps=25, time_grid=None):
    """Train both stages, generate held-out clips through the fused
    pipeline, score vs ground truth and vs the mono-copy baseline."""
    from diffbinaural_tpu.infer.pipeline import BinauralPipeline

    if tiny:
        dim, window, total_frames, crop = 16, 16, 32, 2
        s1_steps = s1_steps or 30
        s2_steps = s2_steps or 10
    else:
        dim, window, total_frames, crop = 64, 80, 240, 8
        s1_steps = s1_steps or 1500
        s2_steps = s2_steps or 2000

    t0 = time.time()
    s1_cache = os.environ.get(
        "QUALITY_S1_PARAMS", os.environ.get("DPMCHECK_PARAMS", ""))
    # holdout=8 matches dpmcheck's training split exactly, so the cached
    # params file is interchangeable between the two harnesses WITHOUT
    # contaminating dpmcheck's held-out clips 0-7 (ADVICE r3 medium #1).
    # quality's own eval clips come from a disjoint seed (12345) either way.
    unet, s1_params, s1_losses, _ = conv.train_stage1_params(
        dim, frames=window, n_clips=64 if tiny else 256, steps=s1_steps,
        batch=4 if tiny else 16, cache=s1_cache, holdout=8,
    )
    if tiny:
        gen, gen_params = _train_tiny_vocoder(s2_steps)
    else:
        from diffbinaural_tpu.core.config import AttrDict, VocoderConfig
        from diffbinaural_tpu.models.bigvgan import BigVGAN

        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
                "configs/bigvgan_binaural_22khz_80band_256x.json")) as f:
            h = AttrDict(json.load(f))
        gen = BigVGAN(VocoderConfig.from_attrdict(h), dtype=jnp.bfloat16)
        gen_params = conv.run_stage2(steps=s2_steps, batch=16)
    train_s = time.time() - t0

    pipe = BinauralPipeline(
        unet_apply=lambda p, x, t, c: unet.apply(p["unet"], x, t, c),
        voc_apply=lambda p, m: gen.apply(p, m),
        total_frames=total_frames, window=window, stride=window // 2,
        crop_frames=crop, unet_batch=4 if tiny else 8,
        sampler=sampler, sampling_timesteps=sampling_timesteps,
        time_grid=time_grid,
    )

    clips = make_quality_clips(n_eval, total_frames)
    model_scores, base_scores = [], []
    t1 = time.time()
    for i, c in enumerate(clips):
        key = jax.random.PRNGKey(100 + i)
        wav = np.asarray(
            pipe(s1_params, gen_params, c["mono_mel"], c["feat"], key),
            dtype=np.float64)
        # mono-copy baseline: centre-panned mono in both ears (constant-
        # power pan at p=0 => gain cos(pi/4) per channel)
        base = np.stack([c["mono_wav"], c["mono_wav"]]) * np.cos(np.pi / 4)
        gt = c["gt_wav"].astype(np.float64)
        ms = _score(wav, gt, with_bss=not tiny)
        bs = _score(base.astype(np.float64), gt, with_bss=not tiny)
        model_scores.append(ms)
        base_scores.append(bs)
        print(f"clip {i} (pan {c['pan']:+.2f}): "
              f"ild {ms['ild_err_db']:.2f} vs base {bs['ild_err_db']:.2f} dB, "
              f"melrmse {ms['mel_rmse']:.3f} vs {bs['mel_rmse']:.3f}")

    def agg(scores):
        return {k: round(float(np.mean([s[k] for s in scores])), 4)
                for k in scores[0]}

    model_m, base_m = agg(model_scores), agg(base_scores)
    res = {
        "run": "quality_battery", "tiny": tiny, "dim": dim,
        "sampler": f"{sampler}{sampling_timesteps}"
        + (f"/{time_grid}" if time_grid else ""),
        "s1_steps": s1_steps, "s2_steps": s2_steps, "n_eval": n_eval,
        "total_frames": total_frames,
        # None (-> JSON null) when params came from cache: losses are NaN
        # placeholders then, and bare NaN is not strict JSON (ADVICE r3)
        "s1_loss_last20": (
            None if np.isnan(s1_losses[-20:]).any()
            else round(float(np.mean(s1_losses[-20:])), 4)),
        "model": model_m, "monocopy": base_m,
        # gates: the trained stack must beat no-spatialisation on the cues
        # a mel-domain pipeline can carry (see module docstring for why
        # ITD is report-only)
        "beats_monocopy_ild": bool(
            model_m["ild_err_db"] < base_m["ild_err_db"]),
        "beats_monocopy_melrmse": bool(
            model_m["mel_rmse"] < base_m["mel_rmse"]),
        "beats_monocopy_env": bool(model_m["env_dist"] < base_m["env_dist"]),
        "beats_monocopy_iacc": bool(
            model_m["iacc_diff"] < base_m["iacc_diff"]),
        "train_s": round(train_s, 1),
        "eval_s": round(time.time() - t1, 1),
    }
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "prod"
    if mode not in ("prod", "toy"):
        raise SystemExit(f"unknown mode {mode}")
    s1 = int(sys.argv[2]) if len(sys.argv) > 2 else None
    s2 = int(sys.argv[3]) if len(sys.argv) > 3 else None
    n_eval = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    run_quality(tiny=(mode == "toy"), s1_steps=s1, s2_steps=s2,
                n_eval=n_eval,
                sampler=os.environ.get("QUALITY_SAMPLER", "ddim"),
                sampling_timesteps=int(os.environ.get("QUALITY_STEPS", "25")),
                time_grid=os.environ.get("QUALITY_GRID") or None)
