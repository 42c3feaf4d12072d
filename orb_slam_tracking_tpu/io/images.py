"""Host-side image ingest (PIL-based; replaces ``cv::imread`` +
``Utils/Converter::toGray``, reference ``Utils/Converter.cpp:5-19``).

Images are returned as float32 numpy arrays in [0, 255] — grayscale
conversion uses the same BT.601 weights OpenCV's ``cvtColor`` applies.
"""

from __future__ import annotations

import numpy as np

__all__ = ["load_gray", "to_gray"]

# BT.601 luma weights (what cv::cvtColor COLOR_RGB2GRAY uses).
_RGB_WEIGHTS = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def to_gray(img: np.ndarray, rgb: bool = True) -> np.ndarray:
    """HxWx{1,3,4} uint8/float -> HxW float32 gray in [0, 255]."""
    arr = np.asarray(img, dtype=np.float32)
    if arr.ndim == 2:
        return arr
    if arr.shape[-1] == 1:
        return arr[..., 0]
    w = _RGB_WEIGHTS if rgb else _RGB_WEIGHTS[::-1]
    return arr[..., :3] @ w


def load_gray(path: str, rgb: bool = True) -> np.ndarray:
    """Load an image file as HxW float32 grayscale in [0, 255]."""
    from PIL import Image

    with Image.open(path) as im:
        if im.mode in ("L", "I;16", "I"):
            return np.asarray(im.convert("F"), dtype=np.float32)
        return to_gray(np.asarray(im.convert("RGB")), rgb=True)
