"""Full binaural metric battery CLI.

CLI parity with /root/reference/DiffBinaural/evaluate_binaural_22050.py
(:695-831).
Run: python -m diffbinaural_tpu.cli.evaluate_binaural_22050 ...
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from ..evaluation.runner import evaluate_binaural_dirs

    parser = argparse.ArgumentParser()
    parser.add_argument("--generated_dir", required=True,
                        help="dir of *_binaural_generated.wav")
    parser.add_argument("--gt_dir", required=True,
                        help="dir of matching GT wavs")
    parser.add_argument("--output_csv", default="binaural_evaluation.csv")
    parser.add_argument("--sr", default=22050, type=int)
    parser.add_argument("--skip_bss", action="store_true",
                        help="skip the (slow) SDR/SIR/SAR computation")
    parser.add_argument("--pesq", action="store_true",
                        help="add the from-scratch P.862-style MOS "
                             "(evaluation/pesq.py; the reference imports "
                             "pesq but never calls it)")
    a = parser.parse_args(argv)

    summary = evaluate_binaural_dirs(
        a.generated_dir, a.gt_dir, a.output_csv, sr=a.sr,
        compute_bss=not a.skip_bss, compute_pesq=a.pesq,
    )
    print("\n==== summary ====")
    for k, s in summary.items():
        print(f"{k:>20}: mean {s['mean']:.4f} ± {s['std']:.4f} "
              f"(n={s['count']})")


if __name__ == "__main__":
    main()
