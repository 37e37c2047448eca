"""Image array conversion (the VaeImageProcessor equivalent, numpy-only).

Reference counterpart: diffusers ``VaeImageProcessor`` built at
RepText/pipeline_flux_controlnet.py:222 (preprocess: resize + scale to [-1,1];
postprocess: clamp, [0,1], uint8).
"""

from __future__ import annotations

import numpy as np


def preprocess_images(images: np.ndarray) -> np.ndarray:
    """uint8 [B?, H, W, 3] (or [H, W, 3]) -> float32 NHWC in [-1, 1]."""
    arr = np.asarray(images)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32) * 2.0 - 1.0
    return arr


def postprocess_images(images) -> np.ndarray:
    """float NHWC in [-1, 1] -> uint8 [B, H, W, 3]."""
    arr = np.asarray(images, dtype=np.float32)
    arr = np.clip(arr / 2.0 + 0.5, 0.0, 1.0)
    return (arr * 255.0).round().astype(np.uint8)
