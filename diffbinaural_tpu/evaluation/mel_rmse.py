"""Offline mel-RMSE evaluation (predicted .npy mels vs GT wavs).

Capability parity with /root/reference/DiffBinaural/evaluate_mel_spectrogram_rmse.py:
GT mel recomputed from the wav with the canonical frontend (:42-77), GT wav
pre-trimmed 8·hop samples per side (:95), predicted mel trimmed 8 frames per
side (:116-119), per-channel RMSE + mean (:108-147), NaN-safe summary stats
(:21-40), the ``*_m40_*.npy → *_0_*.wav`` filename mapping (:160-170).
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Dict, List, Optional

import numpy as np

from ..data.audio_io import load_wav
from .metrics import _ln_mel


def map_pred_to_gt_name(pred_basename: str) -> str:
    """``*_m40_*.npy → *_0_*.wav`` (reference :160-170)."""
    base = pred_basename[: -len(".npy")] if pred_basename.endswith(".npy") else (
        pred_basename
    )
    parts = base.split("_")
    parts = ["0" if p.startswith("m") and p[1:].isdigit() else p for p in parts]
    return "_".join(parts) + ".wav"


def evaluate_mel_rmse_pair(
    pred_left: np.ndarray,
    pred_right: np.ndarray,
    gt_wav: np.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    num_mels: int = 80,
    hop: int = 256,
    win: int = 1024,
    trim_frames: int = 8,
) -> Dict[str, float]:
    """pred mels (80, T); gt_wav (2, S).  Returns per-channel + mean RMSE."""
    cut = trim_frames * hop
    gt_wav = gt_wav[:, cut : gt_wav.shape[1] - cut]  # (:95)

    out = {}
    rmses = []
    for name, pred, ch in (("left", pred_left, 0), ("right", pred_right, 1)):
        p = pred[:, trim_frames:-trim_frames] if pred.shape[1] > 2 * trim_frames \
            else pred
        g = _ln_mel(gt_wav[ch], n_fft, num_mels, sr, hop, win)
        t = min(p.shape[1], g.shape[1])
        rmse = float(np.sqrt(np.mean((p[:, :t] - g[:, :t]) ** 2)))
        out[f"rmse_{name}"] = rmse
        rmses.append(rmse)
    out["rmse_mean"] = float(np.mean(rmses))
    return out


def nan_safe_stats(values: List[float]) -> Dict[str, float]:
    """(reference :21-40)"""
    arr = np.asarray([v for v in values if np.isfinite(v)])
    if arr.size == 0:
        return {"mean": float("nan"), "std": float("nan"), "count": 0}
    return {
        "mean": float(arr.mean()),
        "std": float(arr.std()),
        "count": int(arr.size),
    }


def evaluate_mel_rmse_dirs(
    pred_left_dir: str,
    pred_right_dir: str,
    gt_audio_dir: str,
    output_csv: Optional[str] = None,
    sr: int = 22050,
) -> Dict[str, float]:
    rows = []
    for left_path in sorted(glob.glob(os.path.join(pred_left_dir, "*.npy"))):
        base = os.path.basename(left_path)
        right_path = os.path.join(pred_right_dir, base)
        if not os.path.exists(right_path):
            continue
        gt_path = os.path.join(gt_audio_dir, map_pred_to_gt_name(base))
        if not os.path.exists(gt_path):
            gt_path = os.path.join(gt_audio_dir, base[: -len(".npy")] + ".wav")
            if not os.path.exists(gt_path):
                continue
        gt, _ = load_wav(gt_path, target_sr=sr)
        if gt.ndim == 1:
            gt = np.stack([gt, gt])
        res = evaluate_mel_rmse_pair(
            np.load(left_path), np.load(right_path), gt, sr=sr
        )
        res["file"] = base
        rows.append(res)

    summary = nan_safe_stats([r["rmse_mean"] for r in rows])
    if output_csv and rows:
        os.makedirs(os.path.dirname(os.path.abspath(output_csv)), exist_ok=True)
        with open(output_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return {"files": len(rows), **summary}
