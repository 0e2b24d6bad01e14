"""Generate a small Vimeo-layout training set with PHOTOGRAPHIC statistics.

The builtin SyntheticSeptuplets fallback drifts iid-noise textures —
fine for smoke-testing the training loop, but iid noise is incompressible
(the r4 ELIC run converged to ~13 dB @ 3.8 bpp because that IS the RD
limit of noise), so it cannot produce a meaningful trained RD point. This
script renders septuplets from the public-domain Grace Hopper portrait
(the same source as tests/frames, scripts/gen_frames.py): random crop
windows swept along smooth pan + zoom trajectories, so the model sees
natural edges/textures and coherent sub-pixel motion.

    python scripts/gen_dataset.py --root /tmp/hopperset --n 240

Layout: root/sep_trainlist.txt + root/sequences/<a>/<b>/im1..im7.png
(tpuvc.data.vimeo.VimeoSeptuplets). Deterministic per --seed.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

H, W = 256, 320  # frame size (>= train crop 256)


def _source() -> Image.Image:
    import matplotlib

    p = os.path.join(
        os.path.dirname(matplotlib.__file__),
        "mpl-data", "sample_data", "grace_hopper.jpg",
    )
    img = Image.open(p).convert("RGB")
    # Upscale for sub-pixel headroom, then tile 2x2 with flips so pans can
    # travel further than the portrait's extent without leaving the canvas.
    img = img.resize((img.width * 2, img.height * 2), Image.BILINEAR)
    a = np.asarray(img)
    row = np.concatenate([a, a[:, ::-1]], axis=1)
    full = np.concatenate([row, row[::-1]], axis=0)
    return Image.fromarray(full)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hopperset")
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    src = _source()
    sw, sh = src.size
    rng = np.random.default_rng(args.seed)
    items = []
    for i in range(args.n):
        a, b = f"{i // 100:05d}", f"{i % 100:04d}"
        d = os.path.join(args.root, "sequences", a, b)
        os.makedirs(d, exist_ok=True)
        # Random window + smooth pan/zoom across the 7 frames.
        zoom0 = rng.uniform(0.8, 1.3)
        zoom1 = zoom0 * rng.uniform(0.92, 1.08)
        max_x = sw - int(W * max(zoom0, zoom1)) - 40
        max_y = sh - int(H * max(zoom0, zoom1)) - 40
        x0, y0 = rng.uniform(20, max_x), rng.uniform(20, max_y)
        dx, dy = rng.uniform(-3.5, 3.5, size=2)  # px/frame pan at source scale
        for f in range(7):
            t = f - 3
            z = zoom0 + (zoom1 - zoom0) * (f / 6.0)
            cx, cy = x0 + dx * t, y0 + dy * t
            frame = src.transform(
                (W, H), Image.AFFINE,
                (z, 0.0, cx, 0.0, z, cy),
                resample=Image.BILINEAR,
            )
            frame.save(os.path.join(d, f"im{f + 1}.png"))
        items.append(f"{a}/{b}")
    with open(os.path.join(args.root, "sep_trainlist.txt"), "w") as fh:
        fh.write("\n".join(items) + "\n")
    print(f"wrote {len(items)} septuplets under {args.root}")


if __name__ == "__main__":
    main()
