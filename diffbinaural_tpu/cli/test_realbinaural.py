"""Stage-1 → stage-2 bridge: dump full-clip L/R mels for every test clip.

CLI parity with /root/reference/DiffBinaural/test_realBinaural.py
(:222-313): file list from the CSV's first column (:213-220), weights from
{ckpt}/{frame,unet}_best.pth (:302-303), per-clip overlap-averaged mels
saved to left/{base}.npy + right/{base}.npy (:266-278).
Run: python -m diffbinaural_tpu.cli.test_realbinaural --mode test ...
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def build_inference(args, mel_key="mono_mel"):
    from ..core import checkpoint as ckpt
    from ..diffusion import GaussianDiffusion
    from ..infer.stage1 import Stage1Sampler
    from ..models import AudioVisualModel
    from ..models.visual import build_visual

    net_unet = AudioVisualModel(dim=64)
    net_frame = build_visual(args.arch_frame) if args.arch_frame else None

    diffusion = GaussianDiffusion(
        image_size=80, timesteps=1000, sampling_timesteps=25,
        beta_schedule="cosine", auto_normalize=False,
    )

    def model_apply(params, x, t, cond):
        return net_unet.apply(params["unet"], x, t, cond)

    sampler = Stage1Sampler(model_apply, diffusion)

    exp_dir = os.path.join(args.ckpt, args.id)
    unet_path = args.weights_unet or os.path.join(exp_dir, "unet_best.pth")
    frame_path = args.weights_frame or os.path.join(exp_dir, "frame_best.pth")
    params = {"unet": ckpt.load_checkpoint(unet_path)}
    feats_fn = None
    if os.path.exists(frame_path):
        frame_params = ckpt.load_checkpoint(frame_path)
        params["frame"] = frame_params

        def feats_fn(item):
            pos = (item["pos_data"] if args.arch_frame == "clip_pos"
                   else item["2d_pos_data"])
            from .common import visual_apply_fn

            apply = visual_apply_fn(net_frame, args.arch_frame)
            return np.asarray(
                apply(frame_params, jnp.asarray(item["frames"][None]),
                      jnp.asarray(pos[None]), jnp.asarray(item["mask"][None]))
            )[0]

    return sampler, params, feats_fn


def run(args, dataset_cls, mel_key="mono_mel"):
    from .common import dump_clip_mels
    from ..data.stage1 import load_split_csv

    sampler, params, feats_fn = build_inference(args, mel_key)
    rows = load_split_csv(args.list_test)
    out_left = args.output_dir_left
    out_right = args.output_dir_right
    detection_csv = os.path.join(
        args.data_root, "action_detection_results", "detection_results.csv"
    )
    for row in rows:
        vid = row["video_id"]
        wav = None
        for cand in (
            vid,
            os.path.join(args.data_root, "processed",
                         "mono_audios_22050Hz", vid + ".wav"),
            os.path.join(args.data_root, vid + ".wav"),
        ):
            if os.path.exists(cand):
                wav = cand
                break
        if wav is None:
            print(f"[WARNING] no audio for {vid}")
            continue
        ds = dataset_cls(wav, video_id=os.path.splitext(os.path.basename(vid))[0],
                         detection_csv=detection_csv,
                         data_root=args.data_root, n_mels=args.num_mels)
        mel = dump_clip_mels(args, sampler, params, ds, out_left, out_right,
                             features_fn=feats_fn)
        print(f"{vid}: mel {mel.shape} → {out_left}")


def main(argv=None):
    from .arguments import ArgParser
    from ..data import GenAudioRealBinauralDataset

    args = ArgParser().parse_test_arguments(argv)
    run(args, GenAudioRealBinauralDataset, mel_key="mono_mel")


if __name__ == "__main__":
    main()
