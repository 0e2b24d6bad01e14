"""Still-image (Kodak-style) RD evaluation for the intra codec.

Parity: the reference evaluates its I-frame models on Kodak via
compressai_image_compress (/root/reference/LHBDC/test/utils.py:206-247);
protocol matches the video eval — PSNR on uint8-rounded pixels over the
unpadded crop, bpp = likelihood bits / unpadded pixels.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from tpuvc.eval.infographic import TestInfographic
from tpuvc.eval.metrics import msssim, psnr_uint8


def eval_images(
    dataset,
    intra_fn: Callable,
    name: str = "kodak",
    level: int = 0,
    info: TestInfographic | None = None,
    compute_msssim: bool = False,
):
    """Evaluate every image in ``dataset`` with ``intra_fn``.

    Args:
      dataset: indexable of padded (1, H', W', 3) arrays with a
        ``size(idx) -> (H, W)`` unpadded-size accessor
        (tpuvc.data.kodak.ImageFolder / SyntheticImages).
      intra_fn(x) -> (x_hat, size_bits)

    Returns (psnr_list, bpp_list) ordered by image index.
    """
    psnr_list, bpp_list = [], []
    for idx in range(len(dataset)):
        x = dataset[idx]
        h, w = dataset.size(idx)
        dec, bits = intra_fn(x)
        dec = np.clip(np.asarray(dec), 0.0, 1.0)
        cur_psnr = float(psnr_uint8(x[:, :h, :w], dec[:, :h, :w]))
        bpp = float(bits) / (h * w)
        psnr_list.append(cur_psnr)
        bpp_list.append(bpp)
        if info is not None:
            extra = {}
            if compute_msssim:
                extra["msssim"] = float(
                    msssim(x[:, :h, :w], dec[:, :h, :w])
                )
            info.update(
                video=name, level=level, frame_num=idx, frame_type="I",
                psnr=cur_psnr, size=float(bits), pixels=h * w, **extra,
            )
    return psnr_list, bpp_list
