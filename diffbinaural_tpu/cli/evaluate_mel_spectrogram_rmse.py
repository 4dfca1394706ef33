"""Offline mel-RMSE evaluation CLI.

CLI parity with /root/reference/DiffBinaural/evaluate_mel_spectrogram_rmse.py
(:160-290).
Run: python -m diffbinaural_tpu.cli.evaluate_mel_spectrogram_rmse ...
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from ..evaluation.mel_rmse import evaluate_mel_rmse_dirs

    parser = argparse.ArgumentParser()
    parser.add_argument("--pred_left_dir", required=True)
    parser.add_argument("--pred_right_dir", required=True)
    parser.add_argument("--gt_audio_dir", required=True)
    parser.add_argument("--output_csv", default="mel_rmse_evaluation.csv")
    parser.add_argument("--sr", default=22050, type=int)
    a = parser.parse_args(argv)

    summary = evaluate_mel_rmse_dirs(
        a.pred_left_dir, a.pred_right_dir, a.gt_audio_dir, a.output_csv,
        sr=a.sr,
    )
    print(f"files: {summary['files']}  mean RMSE: {summary['mean']:.4f} "
          f"± {summary['std']:.4f}")


if __name__ == "__main__":
    main()
