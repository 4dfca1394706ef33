"""End-to-end benchmark: 10 s mono clip → binaural waveform, on one chip.

Times the shipped library pipeline (`infer.pipeline.BinauralPipeline`) on
production shapes with random weights (throughput is weight-independent),
faithful to the production glue
(/root/reference/DiffBinaural/test_realBinaural.py:137-211 +
/root/reference/BigVGAN/inference_e2e.py:114-206):

  stage 1: diffusion sampling over all 21 80-frame mel windows of the clip
           (batched through the UNet, bf16 matmuls).  Headline: the
           CERTIFIED sampler — as of r4 the DDIM update rule on a
           λ-uniform terminal-at-zero grid at 12 steps, measured BETTER
           than the reference's uniform 25-step grid on the trained
           production model across 3 noise draws (VALIDATION.md
           "Production-scale solver certification").  The reference-parity
           25-step pipeline is timed too (ddim25_* fields).
  stitch : denormalise → 8-frame edge crop → overlap-average scatter-add,
           ON DEVICE, consuming the stage-1 predictions
  stage 2: BigVGAN 256× vocoder on the stitched 2-channel full-clip mel
  fetch  : host sync on the waveform sum — the wav depends on the stitch,
           which depends on every DDIM window, so the single fetch fences
           the entire pipeline (block_until_ready lies on tunneled
           backends; a host fetch is the only hard sync).

The whole clip is ONE jitted dispatch (see BinauralPipeline's docstring).

The visual encoder is NOT timed (matching the A100 anchor below, which
also counts only UNet passes + vocoder; the reference precomputes/shares
frozen CLIP features outside its reported per-sample latency). The JSON
line records this.

Prints ONE JSON line:  {"metric", "value", "unit", "vs_baseline", ...}.

Baseline (vs_baseline=1.0): the PyTorch reference on A100-class hardware —
~0.1 s per 80-frame window × 21 windows (DiffBinaural/README.md:423) plus
the torch-path BigVGAN RTF ≈76× for 2×10 s of audio
(BigVGAN/README_original.md:233-240) ≈ 2.36 s per clip ≈ 0.42 clips/s.

METRIC REGIME: this measures sustained THROUGHPUT at queue depth 2 (clip
i+1 is dispatched before clip i's waveform is fetched), not single-clip
blocking latency.  The overlap hides ~45 ms/clip of host fetch + dispatch
latency — ~3% on a ~1.4 s clip — relative to the queue-depth-1 numbers
recorded before 2026-08-18 (e.g. BENCH_r01.json).  The JSON's queue_depth
field marks the regime; per-clip device time is unchanged between regimes.
"""

import json
import os
import subprocess
import sys
import time

CLIP_SECONDS = 10.0
SR = 22050
HOP = 256
WINDOW = 80
UNET_BATCH = 8
BASELINE_CLIPS_PER_SEC = 0.42

# Headline = the reference-parity 25-step uniform DDIM pipeline.  No fast
# sampler is certifiable: the production-scale gates (tgt + melrmse
# within 2% of DDIM-25 on the trained dim=64 serving model) give
# TRAINING-RUN-DEPENDENT rankings — the λ-grid-12 mode that won every
# yardstick on the 2026-08-20-morning training run (solver_eval_r4.log)
# came out +65% tgt on a fresh run of the same recipe, where uniform
# DDIM-12 (which had FAILED the first run) won instead
# (benchmarks/results/solver_recheck_r4.log; analysis in VALIDATION.md
# "r4 retrain-robustness recheck").  A serving default must be robust to
# retraining, so the headline is the reference's own production setting;
# the 12-step timing is still reported as fast_uncertified_* in the same
# JSON.  BENCH_SAMPLER/BENCH_STEPS/BENCH_GRID override for ad-hoc runs.
SAMPLER = os.environ.get("BENCH_SAMPLER", "ddim")
STEPS = int(os.environ.get("BENCH_STEPS", "25"))
TIME_GRID = (
    (os.environ["BENCH_GRID"] or None)
    if "BENCH_GRID" in os.environ else None
)
PARITY_STEPS = 25  # the reference's production DDIM setting
# BENCH_FUSE=0 → two-dispatch pipeline (stage1+stitch / vocoder), the
# hedge if the single-graph remote compile is pathological on the tunnel.
FUSE = os.environ.get("BENCH_FUSE", "1") != "0"
# BENCH_VISUAL=1 → per-clip frozen-CLIP feature extraction (ClipPos2D over
# one 224×224 crop × ≤4 sources per window — the reference's live
# conditioning path, networks.py:389-439) is timed INSIDE the per-clip
# loop instead of consuming precomputed features.  Off by default: the
# A100 anchor counts only UNet passes + vocoder.
VISUAL = os.environ.get("BENCH_VISUAL", "0") == "1"
N_SOURCES = 4


def _wait_for_backend(attempts: int = 4, probe_timeout: int = 150) -> None:
    """Fail fast (and retry) when the TPU tunnel is down.

    Observed failure mode: backend init hangs ~28 minutes before raising
    UNAVAILABLE, which would silently eat the whole benchmark budget.  A
    tiny op in a SUBPROCESS (so a hung init can be killed) proves the
    backend is usable before this process commits to it."""
    code = "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((4,)))))"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=probe_timeout,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                env=dict(os.environ),
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if i < attempts - 1:
            print(f"[bench] backend probe failed, retrying "
                  f"({i + 1}/{attempts})", file=sys.stderr)
            time.sleep(30)
    print("[bench] TPU backend unavailable after "
          f"{attempts} probes — aborting", file=sys.stderr)
    sys.exit(1)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffbinaural_tpu.core.config import VocoderConfig
    from diffbinaural_tpu.infer.pipeline import BinauralPipeline
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.models.bigvgan import BigVGAN

    total_frames = int(CLIP_SECONDS * SR) // HOP  # 861

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    # ---- build + init on CPU (fast), transfer to the chip ----------------
    unet = AudioVisualModel(dim=64, dtype=jnp.bfloat16)
    voc = BigVGAN(VocoderConfig(), dtype=jnp.bfloat16)
    with jax.default_device(cpu):
        rng = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, 2, WINDOW, WINDOW))
        cond0 = (
            jnp.zeros((1, 1, WINDOW, WINDOW)),
            jnp.zeros((1, 512)),
            jnp.zeros((1, 2, WINDOW, WINDOW)),
        )
        unet_params = unet.init(rng, x0, jnp.zeros((1,), jnp.int32), cond0)
        voc_params = voc.init(rng, jnp.zeros((1, 80, 16)))
    unet_params = jax.device_put(unet_params, tpu)
    voc_params = jax.device_put(voc_params, tpu)

    if VISUAL:
        from diffbinaural_tpu.models.visual import ClipPos2D

        enc = ClipPos2D(dtype=jnp.bfloat16)
        with jax.default_device(cpu):
            enc_params = enc.init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, 3, 1, 1, 224, 224)),
                jnp.zeros((1, 1, 1, 2)),
                jnp.zeros((1, 1, 1), bool),
            )
        enc_params = jax.device_put(enc_params, tpu)
        # enc_params is an explicit jit ARGUMENT: closing over the ~88M-param
        # CLIP tree would embed it as compile-time constants (HLO bloat, a
        # known remote-compile killer on the tunnel — ADVICE r3).
        feat_fn = jax.jit(
            lambda ep, f, po, ma: enc.apply(ep, f, po, ma))

    def make_pipe(sampler, steps, fuse=None, time_grid=None):
        base = BinauralPipeline(
            unet_apply=lambda p, x, t, c: unet.apply(p, x, t, c),
            voc_apply=lambda p, mel: voc.apply(p, mel),
            total_frames=total_frames,
            unet_batch=UNET_BATCH,
            sampling_timesteps=steps,
            sampler=sampler,
            time_grid=time_grid,
            fuse_vocoder=FUSE if fuse is None else fuse,
        )
        if not VISUAL:
            return base

        # per-window frames → ClipPos2D features INSIDE the timed path;
        # the wav fetch still fences it (feat → stage-1 → stitch → wav)
        def with_visual(up, vp, mono, vis, key):
            return base(up, vp, mono, feat_fn(enc_params, *vis), key)

        with_visual.n_slots = base.n_slots
        return with_visual

    pipe = make_pipe(SAMPLER, STEPS, time_grid=TIME_GRID)

    # distinct inputs per call — rules out any result caching in the stack
    rng_np = np.random.default_rng(0)

    def fresh_clip():
        mono = rng_np.standard_normal((1, 80, total_frames)) - 6.0
        mono = jnp.asarray(mono.astype(np.float32))
        n = pipe.n_slots
        if VISUAL:
            # one 224×224 crop × N_SOURCES per window (num_frames=1, the
            # reference default); window axis = encoder batch axis
            vis = (
                jnp.asarray(rng_np.standard_normal(
                    (n, 3, 1, N_SOURCES, 224, 224)).astype(np.float32)),
                jnp.asarray(rng_np.uniform(
                    -1, 1, (n, 1, N_SOURCES, 2)).astype(np.float32)),
                jnp.zeros((n, 1, N_SOURCES), bool),
            )
            return mono, vis
        feat = rng_np.standard_normal((n, 512))
        return mono, jnp.asarray(feat.astype(np.float32))

    key = jax.random.PRNGKey(13)

    # NOTE: completion is forced by fetching a scalar to the host —
    # block_until_ready() alone does NOT guarantee remote execution has
    # finished on tunneled TPU backends, which silently turns a benchmark
    # into a dispatch-latency measurement.
    def sync(x):
        return float(jnp.sum(x))

    def timed_clips_per_sec(p, n_iters):
        """One host fetch per clip; wav ← stitch ← all stage-1 windows, so
        the fetch fences the whole pipeline.  Clip i+1 is DISPATCHED before
        clip i's wav is fetched (queue depth 2): dispatch is async, so the
        ~45 ms of host fetch + dispatch latency per clip overlaps the device
        compute of the next clip.  Every wav is still fetched, in order —
        the device executes clips serially and each fetch fences its own
        clip."""
        inputs = [fresh_clip() for _ in range(n_iters)]
        mono, feat = fresh_clip()
        sync(p(unet_params, voc_params, mono, feat, key))  # warmup/compile
        t0 = time.time()
        pending = None
        marks = []  # fetch-to-fetch intervals = per-clip device time
        for it in range(n_iters):
            mono, feat = inputs[it]
            wav = p(
                unet_params, voc_params, mono, feat,
                jax.random.fold_in(key, 1000 + it),
            )
            if pending is not None:
                sync(pending)
                marks.append(time.time())
            pending = wav
        sync(pending)
        marks.append(time.time())
        per_clip = np.diff([t0] + marks).tolist()
        return n_iters / (time.time() - t0), per_clip

    import signal

    def _with_deadline(seconds, fn):
        def _alarm(signum, frame):
            raise TimeoutError(f"exceeded {seconds} s")

        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(seconds)
        try:
            return fn()
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    HEADLINE_ITERS = int(os.environ.get("BENCH_ITERS", "30"))
    fused_error = None
    if FUSE:
        # the single-graph compile has been observed to stall through the
        # tunnel's remote-compile helper; cap it and fall back to the
        # two-dispatch pipeline instead of losing the whole benchmark
        try:
            clips_per_sec, per_clip = _with_deadline(
                1500, lambda: timed_clips_per_sec(pipe, HEADLINE_ITERS)
            )
        except Exception as e:  # noqa: BLE001 — incl. the deadline's TimeoutError
            fused_error = f"{type(e).__name__}: {e}"[:200]
            print(f"[bench] fused pipeline failed ({fused_error}); "
                  "falling back to two-dispatch", file=sys.stderr)
            pipe = make_pipe(SAMPLER, STEPS, fuse=False)
            clips_per_sec, per_clip = timed_clips_per_sec(pipe, HEADLINE_ITERS)
    else:
        clips_per_sec, per_clip = timed_clips_per_sec(pipe, HEADLINE_ITERS)
    record = {
        "metric": "e2e_10s_clips_per_sec",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
        "pipeline": (
            f"mono_mel->windows->{SAMPLER}{STEPS}->stitch->vocoder->wav"
        ),
        "dispatches_per_clip": (1 if fused_error is None and FUSE else 2)
        + (1 if VISUAL else 0),
        "queue_depth": 2,
        "n_iters": HEADLINE_ITERS,
        "per_clip_s_min": round(min(per_clip), 4),
        "per_clip_s_p10": round(float(np.percentile(per_clip, 10)), 4),
        "per_clip_s_median": round(float(np.median(per_clip)), 4),
        "per_clip_s_p90": round(float(np.percentile(per_clip, 90)), 4),
        "per_clip_s_max": round(max(per_clip), 4),
        # fetch-to-fetch intervals under queue depth 2: when fetch i's RPC
        # is tunnel-delayed (the max outliers), clip i+1 has already run to
        # completion on-device, so the NEXT interval collapses to bare fetch
        # latency (~25-45 ms) — min/max are paired tunnel-jitter artifacts;
        # the mean (= value) and p10-p90 band carry the signal.
        "per_clip_note": "min/max are paired tunnel-jitter artifacts",
        "visual_encoder_included": VISUAL,
    }
    # VERDICT r4 weak #5: DEMONSTRATE the pairing claim instead of asserting
    # it.  A collapsed interval (< 0.5×median: the fetch that ran after a
    # delayed one) is paired with its predecessor; if the pair SUM sits near
    # 2×median, the two intervals are one delayed-fetch artifact split in
    # two, not memoization (a memoized clip would make the pair sum ~1×
    # median).  outlier_pair_sums lists [prev, collapsed, sum] per event.
    med0 = float(np.median(per_clip))
    pairs = [
        [round(per_clip[i - 1], 4), round(per_clip[i], 4),
         round(per_clip[i - 1] + per_clip[i], 4)]
        for i in range(1, len(per_clip)) if per_clip[i] < 0.5 * med0
    ]
    record["outlier_pair_sums"] = pairs
    record["outlier_pair_expected_sum_2x_median"] = round(2 * med0, 4)
    inlier = [v for v in per_clip if 0.5 * med0 <= v <= 1.5 * med0]
    record["per_clip_s_trimmed_mean"] = (
        round(float(np.mean(inlier)), 4) if inlier else None)
    record["n_inliers"] = len(inlier)
    # ---- FLOPs / MFU accounting (VERDICT r3 item 5) ----------------------
    # jax.stages.Lowered.cost_analysis() runs XLA's HLO cost analysis on
    # the UNOPTIMIZED module on the host — no backend compile, so it is
    # tunnel-safe.  The fused pipeline itself can NOT be lowered for this
    # (HLO cost analysis counts a scan/while body ONCE, undercounting the
    # N-step DDIM loop), so flops are assembled from scan-free component
    # lowerings: per-denoise-step UNet forward × (groups × NFE) + vocoder
    # on the full stitched clip.  MFU is reported against the v5e nominal
    # bf16 peak (197 TFLOP/s); CLAUDE.md's measured big-matmul ceiling
    # through this tunnel is ~160 TFLOP/s (mfu_vs_measured_peak).
    V5E_PEAK_FLOPS = 197e12
    MEASURED_MATMUL_PEAK = 160e12

    from diffbinaural_tpu.utils.profiling import hlo_cost_flops as _flops

    def _retry(fn, attempts=3, backoff_s=15, label=""):
        """VERDICT r4 weak #3: one transient tunnel HTTP-500 must not blank
        a driver-artifact field — retry with backoff before giving up."""
        last = None
        for a in range(attempts):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001
                last = e
                if a < attempts - 1:
                    print(f"[bench] {label} attempt {a + 1}/{attempts} "
                          f"failed ({type(e).__name__}); retrying",
                          file=sys.stderr)
                    time.sleep(backoff_s)
        raise last

    try:
        def account():
            b = UNET_BATCH
            xw = jnp.zeros((b, 2, WINDOW, WINDOW))
            condw = (jnp.zeros((b, 1, WINDOW, WINDOW)), jnp.zeros((b, 512)),
                     jnp.zeros((b, 2, WINDOW, WINDOW)))
            unet_flops = _flops(
                lambda p, x, t, c: unet.apply(p, x, t, c),
                unet_params, xw, jnp.zeros((b,), jnp.int32), condw)
            voc_flops = _flops(
                lambda p, m: voc.apply(p, m),
                voc_params, jnp.zeros((2, 80, total_frames)))
            enc_flops = 0.0
            if VISUAL:
                n = pipe.n_slots
                enc_flops = _flops(
                    lambda ep, f, po, ma: enc.apply(ep, f, po, ma),
                    enc_params,
                    jnp.zeros((n, 3, 1, N_SOURCES, 224, 224)),
                    jnp.zeros((n, 1, N_SOURCES, 2)),
                    jnp.zeros((n, 1, N_SOURCES), bool))
            return unet_flops, voc_flops, enc_flops

        unet_flops, voc_flops, enc_flops = _retry(account, label="mfu")
        n_groups = -(-21 // UNET_BATCH)  # 21 windows of a 10 s clip
        flops = unet_flops * n_groups * STEPS + voc_flops + enc_flops
        med = float(np.median(per_clip))
        record["flops_per_clip_tflop"] = round(flops / 1e12, 3)
        record["flops_split_tflop"] = {
            "unet_total": round(unet_flops * n_groups * STEPS / 1e12, 3),
            "vocoder": round(voc_flops / 1e12, 3),
            **({"visual_encoder": round(enc_flops / 1e12, 3)}
               if VISUAL else {}),
        }
        record["achieved_tflops"] = round(flops / med / 1e12, 2)
        record["mfu"] = round(flops / med / V5E_PEAK_FLOPS, 4)
        record["mfu_vs_measured_peak"] = round(
            flops / med / MEASURED_MATMUL_PEAK, 4)
    except Exception as e:  # noqa: BLE001 — accounting must never kill bench
        record["mfu_error"] = f"{type(e).__name__}: {e}"[:120]
    if VISUAL:
        record["visual_frames_per_clip"] = pipe.n_slots * N_SOURCES
    if fused_error is not None:
        record["fused_fallback"] = fused_error
    record["sampler_quality_evidence"] = (
        "VALIDATION.md production-scale solver certification + r4 "
        "retrain-robustness recheck (benchmarks/results/solver_eval_r4.log, "
        "solver_robust_r4.log, solver_recheck_r4.log: fast-mode rankings "
        "flip across training runs; serving default = reference parity)"
    )

    def secondary(prefix, sampler, steps, time_grid, n=8):
        # A failure here (e.g. a second remote compile dying mid-run) must
        # not lose the already-measured headline — and one transient
        # HTTP-500 must not blank the field either (VERDICT r4 weak #3):
        # retry the whole measurement up to 3 times.
        try:
            sec, sec_clips = _retry(
                lambda: _with_deadline(
                    900,
                    lambda: timed_clips_per_sec(
                        make_pipe(sampler, steps, time_grid=time_grid), n)),
                attempts=3, backoff_s=30, label=prefix)
            record[f"{prefix}_clips_per_sec"] = round(sec, 4)
            record[f"{prefix}_vs_baseline"] = round(
                sec / BASELINE_CLIPS_PER_SEC, 3)
            record[f"{prefix}_per_clip_s_median"] = round(
                float(np.median(sec_clips)), 4)
        except Exception as e:  # noqa: BLE001
            record[f"{prefix}_error"] = f"{type(e).__name__}: {e}"[:200]

    if (SAMPLER, STEPS, TIME_GRID) != ("ddim", PARITY_STEPS, None):
        # reference-parity pipeline, same glue — solver is the only change
        secondary("ddim25", "ddim", PARITY_STEPS, None)
    else:
        # 12-step timing for reference: NOT certified (solver rankings are
        # training-run-dependent — see sampler_quality_evidence)
        secondary("fast_uncertified_ddim12", "ddim", 12, None)
    print(json.dumps(record))


if __name__ == "__main__":
    _wait_for_backend()
    main()
