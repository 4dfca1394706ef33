"""Smoke tests for the measurement harness itself (VERDICT r2 weak #7).

benchmarks/micro.py (~1000 LoC) is the source of every floor claim in
BASELINE.md and benchmarks/convergence.py underwrites VALIDATION.md —
untested measurement code can silently rot and take the evidence chain
with it.  These tests import both modules, exercise the cheap pure
helpers, and run one tiny CPU end-to-end of the convergence harness so a
refactor that breaks a bench mode fails in CI, not mid-TPU-session.
"""

import importlib
import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _import(name):
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        return importlib.import_module(name)
    finally:
        sys.path.pop(0)


def test_micro_imports_and_exposes_all_modes():
    micro = _import("micro")
    for fn in (
        "bench_unet", "bench_vocoder", "bench_attn", "bench_flash_sweep",
        "check_flash_correctness", "bench_act", "bench_train1",
        "bench_train2", "bench_conv_narrow", "verify_gates",
    ):
        assert callable(getattr(micro, fn)), fn


def test_convergence_imports_and_builds_tiny_dataset():
    conv = _import("convergence")
    mono, target, feat = conv.make_stage1_dataset(n_clips=3, frames=16)
    assert mono.shape == (3, 1, 80, 16)
    assert target.shape == (3, 2, 80, 16)
    assert feat.shape == (3, 512)
    assert np.isfinite(mono).all() and np.isfinite(target).all()
    # the pan encoding must be recoverable from feat (the task's premise)
    assert np.linalg.norm(feat[0] - feat[1]) > 1e-3


def test_bench_py_importable_without_backend():
    # bench.py must be importable (syntax/import health) without touching
    # the TPU: main() is only called under __main__ after a backend probe
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)
    assert mod.BASELINE_CLIPS_PER_SEC > 0


def test_dpmcheck_tiny_end_to_end():
    """One micro dpmcheck on CPU: 20 train steps, 10 clips of 16 frames,
    dim=16 — exercises the full train->sample->score->gate path."""
    conv = _import("convergence")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        conv.run_dpmcheck(steps=20, batch=2, frames=16, n_clips=10, dim=16,
                          grids=False)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
    res = json.loads(lines[-1])
    for k in ("tgt_ddim25", "tgt_dpm12", "melrmse_dpm12",
              "dpm12_quality_parity", "dpm12_melrmse_parity"):
        assert k in res, k
    assert np.isfinite(res["tgt_dpm12"])


def test_quality_battery_tiny_end_to_end():
    """Micro run of benchmarks/quality.py: train both tiny stages a few
    steps, generate 2 held-out clips through the fused pipeline, score
    with the full shipped metric battery vs the mono-copy baseline.
    Gates are NOT asserted (2 clips / 4 steps is noise) — this pins the
    harness mechanics: shapes, metric API, JSON schema."""
    q = _import("quality")
    res = q.run_quality(tiny=True, s1_steps=4, s2_steps=2, n_eval=2)
    for k in ("model", "monocopy", "beats_monocopy_ild",
              "beats_monocopy_melrmse", "s1_loss_last20"):
        assert k in res, k
    for k in ("ild_err_db", "mel_rmse", "env_dist", "iacc_diff", "pesq_mos"):
        assert np.isfinite(res["model"][k]), k
        assert np.isfinite(res["monocopy"][k]), k


def test_micro_help_modes_run_as_subprocess():
    """`micro.py nosuchmode` must exit cleanly (no mode matched => no-op),
    proving the dispatch table parses end-to-end."""
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "micro.py"),
         "nosuchmode"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_solver_recheck_tiny_end_to_end():
    """Micro solver_recheck on CPU: exercises the retrain-robustness
    harness (train -> per-candidate multi-draw eval -> gate fields) with
    short-step candidates.  slow: ~4-8 min of CPU sampler compiles."""
    sr = _import("solver_recheck")
    res = sr.main(
        steps=4, batch=2, dim=16, frames=16, n_clips=12, n_eval=2,
        candidates=[("ddim4", dict(sampling_timesteps=4)),
                    ("ddim2", dict(sampling_timesteps=2))],
        n_draws=2)
    assert res["run"] == "solver_recheck"
    assert np.isfinite(res["tgt_monocopy"])
    for name in ("ddim4", "ddim2"):
        d = res["draws"][name]
        assert len(d["tgt"]) == 2 and all(np.isfinite(v) for v in d["tgt"])
    assert "passes_2pct_gate" in res["draws"]["ddim2"]
    assert "passes_2pct_gate" not in res["draws"]["ddim4"]
    # ADVICE r4: certification keys on the stricter all-draws gate
    d2 = res["draws"]["ddim2"]
    assert len(d2["gate_per_draw"]) == 2
    assert d2["passes_2pct_gate_all_draws"] == all(d2["gate_per_draw"])
    assert len(d2["tgt_spread"]) == 2
