"""Video frame preprocessing — reconstruction of the missing
``dataset/video_transforms.py`` (documented at
/root/reference/PROJECT_STRUCTURE.md:37; consumed by the stage-1 loaders).

Numpy/PIL transforms matching the CLIP preprocessing pipeline the encoders
expect (resize-shorter-side → centre crop → CLIP mean/std normalise), plus
the train-time augmentations a FairPlay-style loader uses.
"""

from __future__ import annotations

import random
from typing import Sequence

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def resize_shorter(img, size: int):
    from PIL import Image

    w, h = img.size
    scale = size / min(w, h)
    return img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)


def center_crop(img, size: int):
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def random_crop(img, size: int, rng: random.Random):
    w, h = img.size
    left = rng.randint(0, max(w - size, 0))
    top = rng.randint(0, max(h - size, 0))
    return img.crop((left, top, left + size, top + size))


def random_horizontal_flip(img, rng: random.Random, p: float = 0.5):
    from PIL import Image

    if rng.random() < p:
        return img.transpose(Image.FLIP_LEFT_RIGHT)
    return img


def to_clip_tensor(img) -> np.ndarray:
    """PIL RGB → CLIP-normalised (3, H, W) float32."""
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)


def preprocess_frame(img, size: int = 224, train: bool = False,
                     rng: random.Random | None = None) -> np.ndarray:
    """Full pipeline: resize → (random|center) crop → (flip) → normalise."""
    img = img.convert("RGB") if img.mode != "RGB" else img
    img = resize_shorter(img, size)
    if train and rng is not None:
        img = random_crop(img, size, rng)
        img = random_horizontal_flip(img, rng)
    else:
        img = center_crop(img, size)
    return to_clip_tensor(img)


def stack_clip(frames: Sequence[np.ndarray]) -> np.ndarray:
    """T × (3, H, W) → (3, T, H, W) (the encoders' frame-axis layout)."""
    return np.stack(frames, axis=1)
