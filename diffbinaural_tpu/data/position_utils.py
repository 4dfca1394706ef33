"""Position conversion / binaural-cue utilities (numpy + flax).

Capability parity with /root/reference/DiffBinaural/position_utils.py:
3D→2D conversions (:12-68), the learned 2D position embedding (:70-118), the
Woodworth ITD / sine ILD approximations + binaural spectral weighting
(:120-170), and position normalisation (:172-195).  Library module — the
reference's shipped scripts never import it (it serves the missing dataset
package, SURVEY §2.2), but datasets here use it to build ``2d_pos_data``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

SPEED_OF_SOUND = 343.0


# ---------------------------------------------------------------------------
# converters (numpy; loaders run on host)
# ---------------------------------------------------------------------------


def angle_to_2d(angle_degrees) -> np.ndarray:
    """degrees → (sin, cos) unit position (reference :18-30)."""
    rad = np.radians(np.asarray(angle_degrees, dtype=np.float64))
    return np.stack([np.sin(rad), np.cos(rad)], axis=-1).astype(np.float32)


def cartesian_3d_to_2d(pos_3d) -> np.ndarray:
    """XZ-plane projection, unit-normalised (reference :32-44)."""
    pos_3d = np.asarray(pos_3d, dtype=np.float64)
    x, z = pos_3d[..., 0], pos_3d[..., 2]
    norm = np.sqrt(x**2 + z**2 + 1e-8)
    return np.stack([x / norm, z / norm], axis=-1).astype(np.float32)


def spherical_to_2d(azimuth, elevation=None) -> np.ndarray:
    """(azimuth, elevation) degrees → cos(el)-weighted horizontal position
    (reference :46-68)."""
    if elevation is None:
        return angle_to_2d(azimuth)
    az = np.radians(np.asarray(azimuth, dtype=np.float64))
    el = np.radians(np.asarray(elevation, dtype=np.float64))
    cos_el = np.cos(el)
    return np.stack(
        [np.sin(az) * cos_el, np.cos(az) * cos_el], axis=-1
    ).astype(np.float32)


def normalize_position_data(pos, method: str = "unit_circle") -> np.ndarray:
    """(reference :172-195)"""
    pos = np.asarray(pos, dtype=np.float32)
    if method == "unit_circle":
        norm = np.sqrt(np.sum(pos**2, axis=-1, keepdims=True))
        return pos / (norm + 1e-8)
    if method == "minmax":
        lo = pos.min(axis=-2, keepdims=True)
        hi = pos.max(axis=-2, keepdims=True)
        return 2 * (pos - lo) / (hi - lo + 1e-8) - 1
    return pos


def convert_existing_pos_to_2d(pos_3d) -> np.ndarray:
    return cartesian_3d_to_2d(pos_3d)


# ---------------------------------------------------------------------------
# binaural cue approximations
# ---------------------------------------------------------------------------


def compute_itd_factor(pos_2d, head_radius: float = 0.0875) -> np.ndarray:
    """Woodworth-approximate ITD seconds (reference :125-137)."""
    pos_2d = np.asarray(pos_2d)
    angle = np.arctan2(pos_2d[..., 0], pos_2d[..., 1])
    return (np.sin(angle) * head_radius / SPEED_OF_SOUND).astype(np.float32)


def compute_ild_factor(pos_2d) -> np.ndarray:
    """sin(azimuth)·0.5 ∈ [-0.5, 0.5] (reference :139-150)."""
    pos_2d = np.asarray(pos_2d)
    angle = np.arctan2(pos_2d[..., 0], pos_2d[..., 1])
    return (np.sin(angle) * 0.5).astype(np.float32)


def apply_binaural_weighting(
    mono_spec: np.ndarray, pos_2d: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """mono (B, F, T) × position → (left, right) specs (reference :152-170)."""
    ild = compute_ild_factor(pos_2d)[..., None, None]
    return mono_spec * (1.0 + ild), mono_spec * (1.0 - ild)


# ---------------------------------------------------------------------------
# learned embedding (flax; reference :70-118)
# ---------------------------------------------------------------------------


class Position2DEmbedding(nn.Module):
    embed_dim: int = 64
    max_freq: float = 10.0

    @nn.compact
    def __call__(self, pos_2d: jnp.ndarray) -> jnp.ndarray:
        """(..., 2) → (..., embed_dim)"""
        freqs = np.exp(
            np.linspace(0, np.log(self.max_freq), self.embed_dim // 4)
        ).astype(np.float32)
        x = pos_2d[..., 0:1] * freqs
        y = pos_2d[..., 1:2] * freqs
        emb = jnp.concatenate(
            [jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=-1
        )
        h = nn.Dense(self.embed_dim // 2, name="proj_1")(emb)
        h = nn.silu(h)
        return nn.Dense(self.embed_dim, name="proj_2")(h)
