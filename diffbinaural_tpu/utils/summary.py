"""TensorBoard logging wrapper.

Capability parity with the reference's SummaryWriter usage (SURVEY §5.5):
stage-1 writes to ``{ckpt}/runs`` (train_realBinaural.py:288), stage-2 to
``{ckpt}/logs`` (train_binaural_both.py:1146-1200) — scalars, ln-mel figures
at the fixed −12..2.5 scale, and audio clips.  Backed by tensorboardX, with
a no-op fallback if unavailable.
"""

from __future__ import annotations


import numpy as np


class SummaryLogger:
    def __init__(self, log_dir: str):
        try:
            from tensorboardX import SummaryWriter

            self._w = SummaryWriter(log_dir)
        except Exception:  # pragma: no cover
            self._w = None

    def scalar(self, tag: str, value: float, step: int):
        if self._w:
            self._w.add_scalar(tag, float(value), step)

    def figure(self, tag: str, fig, step: int):
        if self._w:
            self._w.add_figure(tag, fig, step)

    def mel_figure(self, tag: str, mel: np.ndarray, step: int,
                   vmin: float = -12.0, vmax: float = 2.5):
        from .helpers import plot_spectrogram_fixed

        self.figure(tag, plot_spectrogram_fixed(mel, vmin, vmax), step)

    def audio(self, tag: str, wav: np.ndarray, step: int, sr: int = 22050):
        if self._w:
            self._w.add_audio(tag, wav[None] if wav.ndim == 1 else wav, step,
                              sample_rate=sr)

    def flush(self):
        if self._w:
            self._w.flush()

    def close(self):
        if self._w:
            self._w.close()
