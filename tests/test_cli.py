"""CLI surface tests: every entry point parses --help; tiny e2e inference."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

CLI_MODULES = [
    "train_realbinaural",
    "train_fairplay",
    "test_realbinaural",
    "test_fairplay",
    "test_pos",
    "test_realbinaural_few",
    "train_binaural_mel",
    "train_binaural_both",
    "inference_e2e",
    "inference_binaural",
    "inference_diffbinaural_mels",
    "evaluate_binaural_22050",
    "evaluate_mel_spectrogram_rmse",
    "generate_binaural",
]


@pytest.mark.parametrize("mod", CLI_MODULES)
def test_cli_help(mod):
    r = subprocess.run(
        [sys.executable, "-m", f"diffbinaural_tpu.cli.{mod}", "--help"],
        capture_output=True, text=True, timeout=180,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "usage" in r.stdout.lower()


def test_inference_e2e_tiny(tmp_path):
    """Tiny vocoder checkpoint → inference_e2e over 2 clips → wavs exist."""
    import jax
    from diffbinaural_tpu.core import checkpoint as ckpt
    from diffbinaural_tpu.core.config import VocoderConfig
    from diffbinaural_tpu.models.bigvgan import BigVGAN
    from diffbinaural_tpu.cli.inference_e2e import main as e2e_main

    h = {
        "num_mels": 8, "upsample_rates": [4, 2],
        "upsample_kernel_sizes": [8, 4], "upsample_initial_channel": 32,
        "resblock": "1", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]], "activation": "snakebeta",
        "snake_logscale": True, "use_tanh_at_final": False,
        "use_bias_at_final": False, "sampling_rate": 22050, "hop_size": 8,
    }
    cfg = VocoderConfig.from_attrdict(h)
    model = BigVGAN(cfg)
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 8, 16)))

    ckdir = tmp_path / "ck"
    ckdir.mkdir()
    ckpt.save_checkpoint(str(ckdir / "g_00000001"),
                         {"generator": params})
    with open(ckdir / "config.json", "w") as f:
        json.dump(h, f)

    left = tmp_path / "left"
    right = tmp_path / "right"
    left.mkdir()
    right.mkdir()
    rng = np.random.default_rng(0)
    for name in ("clip_a", "clip_b"):
        mel = rng.standard_normal((8, 24)).astype(np.float32) - 6
        mel[:, 5:8] = 0.0  # zero frames → exercises silence handling
        np.save(left / f"{name}.npy", mel)
        np.save(right / f"{name}.npy", mel * 0.9)

    out = tmp_path / "out"
    e2e_main([
        "--input_mels_left_dir", str(left),
        "--input_mels_right_dir", str(right),
        "--output_dir", str(out),
        "--checkpoint_file", str(ckdir / "g_00000001"),
    ])
    wavs = sorted(os.listdir(out))
    assert wavs == ["clip_a_binaural_generated.wav",
                    "clip_b_binaural_generated.wav"]
    from diffbinaural_tpu.data.audio_io import load_wav

    y, sr = load_wav(str(out / wavs[0]))
    assert sr == 22050 and y.shape == (2, 24 * 8)
    # zero-frame region must be silent
    assert np.abs(y[:, 5 * 8 : 8 * 8]).max() == 0.0


def test_evaluate_cli_on_generated(tmp_path):
    from diffbinaural_tpu.data.audio_io import save_wav
    from diffbinaural_tpu.cli.evaluate_binaural_22050 import main as eval_main

    rng = np.random.default_rng(0)
    gt_dir = tmp_path / "gt"
    gen_dir = tmp_path / "gen"
    gt_dir.mkdir()
    gen_dir.mkdir()
    t = 22050
    for name in ("a", "b"):
        x = (0.1 * rng.standard_normal((2, t))).astype(np.float32)
        save_wav(str(gt_dir / f"{name}.wav"), x, 22050)
        save_wav(str(gen_dir / f"{name}_binaural_generated.wav"),
                 x + 0.005 * rng.standard_normal((2, t)).astype(np.float32),
                 22050)
    csv = tmp_path / "res.csv"
    eval_main([
        "--generated_dir", str(gen_dir),
        "--gt_dir", str(gt_dir),
        "--output_csv", str(csv),
        "--skip_bss",
    ])
    assert csv.exists()
    assert (tmp_path / "res_summary.csv").exists()
