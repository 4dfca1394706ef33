"""Smoke test: the one-command mono→binaural CLI over the fused pipeline."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

SR = 22050


def test_generate_binaural_cli(tmp_path):
    from diffbinaural_tpu.cli.generate_binaural import main
    from diffbinaural_tpu.core import checkpoint as ckpt
    from diffbinaural_tpu.core.config import VocoderConfig
    from diffbinaural_tpu.data.audio_io import load_wav, save_wav
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.models.bigvgan import BigVGAN

    # ---- tiny checkpoints -------------------------------------------------
    rng = jax.random.PRNGKey(0)
    unet = AudioVisualModel(dim=16)
    x0 = jnp.zeros((1, 2, 80, 80))
    cond0 = (jnp.zeros((1, 1, 80, 80)), jnp.zeros((1, 512)),
             jnp.zeros((1, 2, 80, 80)))
    unet_params = unet.init(rng, x0, jnp.zeros((1,), jnp.int32), cond0)
    ckpt.save_checkpoint(str(tmp_path / "unet_best.pth"), unet_params)

    h = {
        "num_mels": 80, "n_fft": 1024, "hop_size": 256, "win_size": 1024,
        "sampling_rate": SR, "fmin": 0, "fmax": None,
        "upsample_rates": [4, 4, 4, 4], "upsample_kernel_sizes": [8, 8, 8, 8],
        "upsample_initial_channel": 32, "resblock": "1",
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
    }
    cfg = VocoderConfig.from_attrdict(h)
    voc = BigVGAN(cfg)
    voc_params = voc.init(rng, jnp.zeros((1, 80, 16)))
    voc_dir = tmp_path / "voc"
    ckpt.save_checkpoint(str(voc_dir / "g_00000001"),
                         {"generator": voc_params})
    with open(voc_dir / "config.json", "w") as f:
        json.dump(h, f)

    # ---- a 1 s test tone --------------------------------------------------
    t = np.arange(SR) / SR
    tone = (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    wav_dir = tmp_path / "in"
    wav_dir.mkdir()
    save_wav(str(wav_dir / "tone.wav"), tone, SR)

    out_dir = tmp_path / "out"
    main([
        "--input_wav", str(wav_dir),
        "--output_dir", str(out_dir),
        "--weights_unet", str(tmp_path / "unet_best.pth"),
        "--vocoder_checkpoint", str(voc_dir / "g_00000001"),
        "--unet_dim", "16",
        "--ddim_steps", "2",
        "--unet_batch", "4",
    ])

    out = out_dir / "tone_binaural_generated.wav"
    assert os.path.exists(out)
    stereo, out_sr = load_wav(str(out))
    assert out_sr == SR
    assert stereo.shape == (2, (SR // 256) * 256)
    assert np.isfinite(stereo).all()
