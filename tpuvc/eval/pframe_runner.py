"""P-frame (low-delay) sequence evaluation with content-adaptive ratios.

Parity: the OJSP2025 evaluation loop (video_model.py:505-676 call structure):
I-frame via the intra codec, then chained P-frames; each P-frame first runs
the fractional down-ratio search with hysteresis toward the previous frame's
ratio, then codes at the chosen ratio, propagating the DCVC-style DPB dict.
Per-frame diagnostics are recorded in the OJSP CSV shape
(tpuvc.eval.results_io.PerFrameDiagnostics).
"""

from __future__ import annotations

from collections.abc import Callable

import jax.numpy as jnp

from tpuvc.eval.metrics import psnr_uint8
from tpuvc.eval.results_io import PerFrameDiagnostics
from tpuvc.gop.adaptive import OJSP_RATIOS, fractional_ratio_search


def eval_pframe_sequence(
    frames,
    n_frames: int,
    intra_fn: Callable,
    pframe_fn: Callable,
    warp_pred_fn: Callable,
    crop_hw: tuple[int, int],
    intra_period: int = 32,
    ratios=OJSP_RATIOS,
    diagnostics: PerFrameDiagnostics | None = None,
):
    """Low-delay evaluation.

    intra_fn(x) -> (x_hat, bits)
    pframe_fn(x, dpb, ratio) -> dict(x_hat, bits, dpb, ...)
    warp_pred_fn(x, ref_frame, ratio) -> warp-only prediction frame.
    """
    h, w = crop_hw
    psnrs, sizes = [], []
    dpb = None
    for i in range(n_frames):
        x = frames[i]
        if i % intra_period == 0:
            dec, bits = intra_fn(x)
            dec = jnp.clip(dec, 0.0, 1.0)
            dpb = {
                "ref_frame": dec,
                "ref_feature": None,
                "ref_down_ratio": 1.0,
            }
            ratio, warp_psnr = 1.0, None
            typ = "I"
        else:
            ratio, warp_psnr, _ = fractional_ratio_search(
                lambda r: warp_pred_fn(x, dpb["ref_frame"], r),
                x,
                prev_ratio=dpb["ref_down_ratio"],
                ratios=ratios,
            )
            out = pframe_fn(x, dpb, ratio)
            dec, bits, dpb = out["x_hat"], out["bits"], out["dpb"]
            typ = "P"
        p = float(psnr_uint8(x[:, :h, :w], dec[:, :h, :w]))
        psnrs.append(p)
        sizes.append(float(bits))
        if diagnostics is not None:
            diagnostics.update(
                frame=i, type=typ, down_ratio=ratio, psnr=p,
                warp_psnr=warp_psnr, bits=float(bits),
                bpp=float(bits) / (h * w),
            )
    return psnrs, sizes
