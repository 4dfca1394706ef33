"""Few-sample visual smoke check: sample ≤3 windows per file, write 2×2
pred/GT comparison PNGs + per-file MSE summaries.

CLI parity with /root/reference/DiffBinaural/test_realBinaural_few.py
(:141-259): vmin/vmax = [-9, 1] comparison figures (:141-200), ≤3 windows
per file (:202-247), txt summaries (:249-259).  This is the reference's
de-facto stage-1 smoke test (SURVEY §4.1).
Run: python -m diffbinaural_tpu.cli.test_realbinaural_few ...
"""

from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    from .arguments import ArgParser
    from .test_realbinaural import build_inference
    from ..data import GenAudioRealBinauralDataset
    from ..data.stage1 import load_split_csv

    parser = ArgParser()
    parser.parser.add_argument("--max_files", default=2, type=int)
    parser.parser.add_argument("--max_windows", default=3, type=int)
    parser.parser.add_argument("--output_dir", default="./few_sample_check")
    args = parser.parse_test_arguments(argv)

    sampler, params, feats_fn = build_inference(args)
    os.makedirs(args.output_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = load_split_csv(args.list_test)[: args.max_files]
    for row in rows:
        vid = row["video_id"]
        wav = vid if os.path.exists(vid) else os.path.join(
            args.data_root, vid + ".wav"
        )
        ds = GenAudioRealBinauralDataset(wav, n_mels=args.num_mels)
        base = os.path.splitext(os.path.basename(wav))[0]
        mses = []
        for wi in range(min(len(ds), args.max_windows)):
            item = ds[wi]
            mono = item["mono_mel"][None]
            feat = (feats_fn(item)[None] if feats_fn
                    else np.zeros((1, 512), np.float32))
            pred = np.asarray(sampler.sample(params, mono, feat))[0]
            gt = np.repeat(mono, 2, axis=1)[0]  # mono as stand-in GT view
            mse = float(np.mean((pred - gt) ** 2))
            mses.append(mse)

            fig, axes = plt.subplots(2, 2, figsize=(10, 6))
            for ax, (img, title) in zip(
                axes.flat,
                [(pred[0], "pred L"), (pred[1], "pred R"),
                 (gt[0], "mix L"), (gt[1], "mix R")],
            ):
                ax.imshow(img, aspect="auto", origin="lower", vmin=-9, vmax=1)
                ax.set_title(title)
            fig.savefig(
                os.path.join(args.output_dir, f"{base}_w{wi}.png"), dpi=80
            )
            plt.close(fig)
        with open(os.path.join(args.output_dir, f"{base}.txt"), "w") as f:
            f.write(f"windows: {len(mses)}\n")
            for wi, m in enumerate(mses):
                f.write(f"window {wi}: mse {m:.5f}\n")
            f.write(f"mean mse: {np.mean(mses):.5f}\n")
        print(f"{base}: mean mse {np.mean(mses):.5f}")


if __name__ == "__main__":
    main()
