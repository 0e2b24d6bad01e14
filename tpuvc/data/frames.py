"""Frame IO and preparation.

Parity targets in /root/reference:
  - ICIP2023/src/utils.py:223-283 (prepare_frame / normalize / pad to x64)
  - LHBDC/test/utils.py:32-35 (float_to_uint8 rounding before PSNR)

Frames are float32 NHWC in [0, 1]. Padding happens once at ingest (bottom/
right reflection to x64) so every downstream shape stays MXU-aligned.
"""

from __future__ import annotations

import numpy as np

from tpuvc.ops.pad import pad_to_multiple


def load_png(path) -> np.ndarray:
    """(H, W, 3) uint8."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"))
    return img


def save_png(path, img_uint8: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img_uint8).save(path)


def to_float(img_uint8: np.ndarray) -> np.ndarray:
    return img_uint8.astype(np.float32) / 255.0


def float_to_uint8(img: np.ndarray) -> np.ndarray:
    """Round-trip clamp+round used before PSNR (LHBDC/test/utils.py:32-35)."""
    return np.clip(np.rint(np.asarray(img) * 255.0), 0, 255).astype(np.uint8)


def prepare_frame(path, multiple: int = 64):
    """Load PNG -> padded (1, H', W', 3) float32 plus the original size."""
    img = to_float(load_png(path))[None]
    padded, size = pad_to_multiple(img, multiple)
    return np.asarray(padded), size
