"""Long stage-2 GAN training run (VERDICT r4 next-round #1).

Closes the one remaining capability gap: end-to-end audio that beats the
mono-copy baseline.  r4's production quality battery root-caused the gate
failure to the vocoder training budget (2k steps vs the reference's 2000
epochs, /root/reference/BigVGAN/README.md:302-307) — the oracle-mel control
showed predicted ILD ~= 0 regardless of input level.  Two fixes here:

1. **Budget**: chunk-scanned multi-hour run (default 36k steps), full
   TrainState checkpoints every CKPT_EVERY steps so tunnel outages resume
   instead of zeroing the run (r4 weak: outages killed every attempt).
2. **Level diversity**: r4 trained on 64 tone segments ALL peak-normalised
   to 0.3 — a vocoder trained on that has never seen a quiet input, so it
   cannot learn the level-preservation that ILD requires.  Real corpora
   (LibriTTS etc., what the reference trains on) have natural loudness
   diversity; this run restores it synthetically with a log-uniform
   per-item gain in [GAIN_MIN, 1.0] (~30 dB, covering the constant-power
   pan-gain range of the eval task), with the input mel recomputed
   in-graph from the gained waveform, exactly as MelDataset would.

Every EVAL_EVERY steps an oracle-mel probe vocodes the GT mels of held-out
panned clips (quality.make_quality_clips geometry) and records ILD error +
mel-RMSE vs ground truth — the ILD-vs-steps curve VERDICT asks for.  All
eval points append to LONGRUN_DIR/log.jsonl.

Usage:
  LONGRUN_DIR=/root/repo/benchmarks/results/longrun2 \
    python -u benchmarks/longrun2.py [total_steps] [batch]

Resume is automatic from LONGRUN_DIR/state.msgpack.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import convergence as conv

SR = 22050
HOP = 256
GAIN_MIN = float(os.environ.get("LONGRUN_GAIN_MIN", "0.03"))
CKPT_EVERY = int(os.environ.get("LONGRUN_CKPT_EVERY", "2000"))
EVAL_EVERY = int(os.environ.get("LONGRUN_EVAL_EVERY", "1500"))
SNAP_EVERY = int(os.environ.get("LONGRUN_SNAP_EVERY", "6000"))
N_SEGS = int(os.environ.get("LONGRUN_N_SEGS", "128"))
N_EVAL = int(os.environ.get("LONGRUN_N_EVAL", "4"))
EVAL_FRAMES = 240


def _log(run_dir, rec):
    with open(os.path.join(run_dir, "log.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def make_eval_clips(n):
    """Held-out panned clips, same construction as quality.make_quality_clips
    (seed 12345, disjoint from the seed-1 training stream)."""
    from diffbinaural_tpu.data.meldataset import _MelFrontend

    rng = np.random.default_rng(12345)
    mel = _MelFrontend(1024, 80, SR, HOP, 1024, 0.0, None)
    n_samples = EVAL_FRAMES * HOP + 1024
    clips = []
    for _ in range(n):
        f0 = rng.uniform(150.0, 900.0)
        p = rng.uniform(-1.0, 1.0)
        x = conv._harmonic_clip(rng, n_samples, f0)
        y = conv._pan_binaural(x, p)
        gt_mels = np.stack([mel(ch)[:, :EVAL_FRAMES] for ch in y])
        clips.append({"gt_wav": y.astype(np.float64),
                      "gt_mel": gt_mels.astype(np.float32),
                      "pan": float(p)})
    return clips


def oracle_eval(voc_jit, gen_params, clips):
    """Vocode GT mels -> stereo wav; score ILD err / mel-RMSE vs GT."""
    from diffbinaural_tpu.evaluation import metrics as M

    ild, mrmse, env = [], [], []
    for c in clips:
        wav = np.asarray(voc_jit(gen_params, jnp.asarray(c["gt_mel"])),
                         dtype=np.float64)[:, 0, :]
        n = min(wav.shape[1], c["gt_wav"].shape[1])
        gt_a, pred_a, _ = M.align_signals(c["gt_wav"][:, :n], wav[:, :n])
        ild.append(M.compute_ild_error(pred_a, gt_a, sr=SR)[0])
        mrmse.append(M.MEL_RMSE_distance(pred_a, gt_a, sr=SR))
        env.append(M.Envelope_distance(pred_a, gt_a))
    return (float(np.mean(ild)), float(np.mean(mrmse)), float(np.mean(env)))


def main(total_steps=36000, batch=16, chunk=25):
    from diffbinaural_tpu.cli.gan_common import build_discriminators
    from diffbinaural_tpu.core import checkpoint as ckpt
    from diffbinaural_tpu.core.config import AttrDict, VocoderConfig
    from diffbinaural_tpu.losses import MultiScaleMelSpectrogramLoss
    from diffbinaural_tpu.models.bigvgan import BigVGAN
    from diffbinaural_tpu.signal import mel_spectrogram
    from diffbinaural_tpu.train import make_stage2_train_step

    run_dir = os.environ.get(
        "LONGRUN_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "results", "longrun2"))
    os.makedirs(run_dir, exist_ok=True)
    state_path = os.path.join(run_dir, "state.msgpack")

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

    print(f"building stage-2 dataset ({N_SEGS} segs, gain>={GAIN_MIN})...",
          flush=True)
    audio = jax.device_put(
        jnp.asarray(conv.make_stage2_dataset(N_SEGS, seg)), tpu)

    rng0 = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        gen_params = gen.init(rng0, jnp.zeros((1, h["num_mels"], 16)))
        audio0 = jnp.zeros((1, 1, 16 * h["hop_size"]))
        disc_params = {"mpd": mpd.init(rng0, audio0, audio0),
                       "mrd": mrd.init(rng0, audio0, audio0)}

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
    state_tmpl = init_fn(gen_params, disc_params)

    start_step = 0
    if os.path.exists(state_path):
        state = ckpt.load_checkpoint(state_path, target=state_tmpl)
        start_step = int(np.asarray(state.step))
        print(f"RESUMED from {state_path} at step {start_step}", flush=True)
        state = jax.device_put(state, tpu)
    else:
        state = jax.device_put(state_tmpl, tpu)
    del state_tmpl, gen_params, disc_params

    log2_min = np.log(GAIN_MIN)

    @jax.jit
    def run_chunk(state, rng):
        def body(st, i):
            r = jax.random.fold_in(rng, i)
            idx = jax.random.randint(r, (batch,), 0, N_SEGS)
            # log-uniform gain in [GAIN_MIN, 1]: level-diversity augmentation
            g = jnp.exp(jax.random.uniform(
                jax.random.fold_in(r, 2), (batch, 1)) * (-log2_min) + log2_min)
            wav = audio[idx] * g
            m = mel_fn(wav)
            st, met = step_fn(st, {"mel": m, "audio": wav, "mel_loss": m})
            return st, (met["loss_mel"], met["loss_disc"], met["loss_gen_all"])

        return jax.lax.scan(body, state, jnp.arange(chunk))

    voc_jit = jax.jit(lambda p, m: gen.apply(p, m))
    clips = make_eval_clips(N_EVAL)

    rng = jax.random.PRNGKey(7)
    t0 = time.time()
    step = start_step
    last_eval = step - (step % EVAL_EVERY)
    last_ckpt = step - (step % CKPT_EVERY)
    last_snap = step - (step % SNAP_EVERY)
    recent_mel = []
    while step < total_steps:
        c = step // chunk
        state, (lm, ld, lg) = run_chunk(state, jax.random.fold_in(rng, c))
        lm = np.asarray(lm)  # host fetch = fence
        step += chunk
        recent_mel.extend(lm.tolist())
        recent_mel = recent_mel[-200:]
        if step % 100 == 0:
            print(f"step {step:6d}  mel {np.mean(recent_mel[-100:]):7.3f}  "
                  f"disc {float(np.asarray(ld).mean()):6.3f}  "
                  f"gen {float(np.asarray(lg).mean()):6.3f}  "
                  f"({(time.time() - t0) / max(step - start_step, 1) * 1000:.0f}"
                  f" ms/step)", flush=True)
        if step - last_eval >= EVAL_EVERY:
            last_eval = step
            ild, mrmse, env = oracle_eval(voc_jit, state.gen_params, clips)
            _log(run_dir, {"step": step, "oracle_ild_db": round(ild, 3),
                           "oracle_mel_rmse": round(mrmse, 4),
                           "oracle_env": round(env, 4),
                           "train_mel": round(float(np.mean(recent_mel)), 3),
                           "wall_s": round(time.time() - t0, 1)})
        if step - last_ckpt >= CKPT_EVERY:
            last_ckpt = step
            ckpt.save_checkpoint(state_path, state)
            print(f"  checkpointed at step {step}", flush=True)
        if step - last_snap >= SNAP_EVERY:
            last_snap = step
            ckpt.save_checkpoint(
                os.path.join(run_dir, f"gen_{step:06d}.msgpack"),
                state.gen_params)

    ckpt.save_checkpoint(state_path, state)
    ckpt.save_checkpoint(os.path.join(run_dir, "gen_final.msgpack"),
                         state.gen_params)
    ild, mrmse, env = oracle_eval(voc_jit, state.gen_params, clips)
    _log(run_dir, {"step": step, "oracle_ild_db": round(ild, 3),
                   "oracle_mel_rmse": round(mrmse, 4),
                   "oracle_env": round(env, 4), "final": True,
                   "wall_s": round(time.time() - t0, 1)})
    print("DONE", flush=True)


if __name__ == "__main__":
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 36000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    main(total, batch)
