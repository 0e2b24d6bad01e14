"""Generate the bundled real-photograph test frames (tests/frames/*.png).

The reference ships photographic frames for a self-contained single-B
round trip (/root/reference/LHBDC/encode_B.py:23-25 reads
LHBDC/frames/{ref_1,current,ref_2}.png). This repo derives its equivalent
fixtures from the public-domain Grace Hopper portrait bundled with
matplotlib: three frames along a smooth synthetic camera pan + zoom, so
the motion-estimation and entropy paths see natural image statistics
(textures, edges, smooth luma gradients) and coherent sub-pixel motion —
unlike iid-noise fixtures, which exercise neither.

Deterministic: re-running reproduces byte-identical PNGs.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


H, W = 192, 256  # multiple-of-64 friendly after pad; small enough to commit


def _source() -> np.ndarray:
    import matplotlib

    p = os.path.join(
        os.path.dirname(matplotlib.__file__),
        "mpl-data", "sample_data", "grace_hopper.jpg",
    )
    return np.asarray(Image.open(p).convert("RGB"), dtype=np.float64) / 255.0


def _sample(img: np.ndarray, t: float) -> np.ndarray:
    """Bilinear crop of `img` under a pan+zoom camera path at time t."""
    h, w, _ = img.shape
    zoom = 1.35 + 0.06 * t          # slow zoom-out
    cx = w * 0.52 + 14.0 * t        # pan right
    cy = h * 0.48 + 6.0 * t         # drift down
    ys = (np.arange(H) - H / 2) * zoom + cy
    xs = (np.arange(W) - W / 2) * zoom + cx
    y, x = np.meshgrid(ys, xs, indexing="ij")
    y = np.clip(y, 0, h - 1.001)
    x = np.clip(x, 0, w - 1.001)
    y0 = np.floor(y).astype(np.int64)
    x0 = np.floor(x).astype(np.int64)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    out = (
        img[y0, x0] * (1 - fy) * (1 - fx)
        + img[y0, x0 + 1] * (1 - fy) * fx
        + img[y0 + 1, x0] * fy * (1 - fx)
        + img[y0 + 1, x0 + 1] * fy * fx
    )
    # gentle exposure drift so the residual path codes more than motion
    out = np.clip(out * (1.0 + 0.02 * t), 0.0, 1.0)
    return out


def main():
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "frames",
    )
    os.makedirs(out_dir, exist_ok=True)
    img = _source()
    for name, t in [("ref_1", -1.0), ("current", 0.0), ("ref_2", 1.0)]:
        frame = (_sample(img, t) * 255.0).round().astype(np.uint8)
        Image.fromarray(frame).save(
            os.path.join(out_dir, f"{name}.png"), optimize=True
        )
        print(name, frame.shape)


if __name__ == "__main__":
    main()
