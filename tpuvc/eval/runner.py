"""Sequence evaluation loop: walk the coding order, code I/B frames, track
PSNR/size, maintain the decoded picture buffer.

Parity: /root/reference/ICIP2024/src/test.py:37-101 (``val_sequence_level``)
and ICIP2023/src/test.py:36-94 (O6):
  - I-frames through the intra codec, B-frames through the inter codec with
    the two nearest decoded references;
  - PSNR on uint8-rounded RGB over the unpadded (h, w) crop;
  - size in bits (from likelihoods), bpp normalized by h*w;
  - decoded frames clamped to [0,1] before entering the DPB.

TPU design: frames stay on device end to end; the per-frame host transfer is
two scalars (psnr, size) instead of the reference's full-frame
``.cpu().numpy()`` sync (SURVEY.md 3.1). Frames at the same hierarchy level
are independent — ``eval_sequence`` exposes the per-frame loop, and the
level-batched scheduler lives in tpuvc/gop (future work hooks there).
"""

from __future__ import annotations

from collections.abc import Callable

import jax.numpy as jnp
import numpy as np

from tpuvc.eval.infographic import TestInfographic
from tpuvc.eval.metrics import psnr_uint8
from tpuvc.gop.dpb import DecodedPictureBuffer


def eval_sequence(
    frames: list,
    order_list: list[int],
    typ_list: list[str],
    intra_fn: Callable,
    inter_fn: Callable,
    crop_hw: tuple[int, int],
    video: str = "",
    level: int = 0,
    info: TestInfographic | None = None,
    dpb_capacity: int = 32,
    compute_msssim: bool = False,
):
    """Evaluate one sequence at one rate level.

    Args:
      frames: indexable of (1, H, W, 3) padded device arrays (or a loader
        object with __getitem__ returning them lazily).
      intra_fn(x) -> (x_hat, size_bits)
      inter_fn(ref1, ref2, xcur, order, order1, order2) -> (x_hat, size_bits)
      crop_hw: original (h, w) for PSNR/bpp accounting.

    Returns (psnr_list, size_list) indexed by display order.
    """
    h, w = crop_hw
    n = len(order_list)
    psnr_list = [0.0] * n
    size_list = [0.0] * n
    dpb = DecodedPictureBuffer(capacity=dpb_capacity)

    for order in order_list:
        frame = frames[order]
        if typ_list[order] == "I":
            dec, size = intra_fn(frame)
        else:
            ref1, ref2, order1, order2 = dpb.select_references(order)
            dec, size = inter_fn(ref1, ref2, frame, order, order1, order2)

        p = float(psnr_uint8(frame[:, :h, :w], dec[:, :h, :w]))
        psnr_list[order] = p
        size_list[order] = float(size)
        extra = {}
        if compute_msssim:
            from tpuvc.eval.metrics import msssim

            extra["msssim"] = float(
                msssim(frame[:, :h, :w], jnp.clip(dec[:, :h, :w], 0, 1))
            )
        if info is not None:
            info.update(
                video, level, order, typ_list[order], p, float(size), h * w,
                **extra,
            )
        dpb.add(jnp.clip(dec, 0.0, 1.0), order)

    return psnr_list, size_list


def summarize(psnr_list, size_list, crop_hw):
    h, w = crop_hw
    return {
        "psnr": float(np.mean(psnr_list)),
        "bpp": float(np.mean(size_list) / (h * w)),
    }
