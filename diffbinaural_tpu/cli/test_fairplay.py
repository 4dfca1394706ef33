"""FairPlay mel dump (CLI parity with
/root/reference/DiffBinaural/test_fairplay.py — mix_mel key :100, same
generate/crop/overlap logic :146-220).
Run: python -m diffbinaural_tpu.cli.test_fairplay --mode test ...
"""

from __future__ import annotations


def main(argv=None):
    from .arguments import ArgParser
    from .test_realbinaural import run
    from ..data import GenAudioFairPlayDataset

    args = ArgParser().parse_test_arguments(argv)
    run(args, GenAudioFairPlayDataset, mel_key="mix_mel")


if __name__ == "__main__":
    main()
