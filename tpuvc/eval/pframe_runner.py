"""P-frame (low-delay) sequence evaluation with content-adaptive ratios.

Parity: the OJSP2025 evaluation loop (video_model.py:505-676 call structure):
I-frame via the intra codec, then chained P-frames; each P-frame first runs
the fractional down-ratio search with hysteresis toward the previous frame's
ratio, then codes at the chosen ratio, propagating the DCVC-style DPB dict.

Thin adapter over the canonical loop in tpuvc.eval.runner
(``eval_sequence_lowdelay``) — one implementation of the protocol, two
calling conventions (this one matches the DMC model's output dict and the
raw warp-prediction function).
"""

from __future__ import annotations

from collections.abc import Callable

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
    from tpuvc.eval.runner import eval_sequence_lowdelay

    last_search: dict = {}

    def ratio_for_frame(x, dpb):
        ratio, warp_psnr, _ = fractional_ratio_search(
            lambda r: warp_pred_fn(x, dpb["ref_frame"], r),
            x,
            prev_ratio=dpb["ref_down_ratio"],
            ratios=ratios,
        )
        last_search["warp_psnr"] = warp_psnr
        return ratio

    def pf(x, dpb, ratio):
        out = pframe_fn(x, dpb, ratio)
        # Device scalars only — the runner converts once at the end so the
        # loop stays sync-free.
        extras = (
            {k: out[k] for k in ("bits_mv", "bits_y") if k in out}
            if diagnostics is not None
            else {}
        )
        if "warp_psnr" in last_search:
            extras["warp_psnr"] = last_search.pop("warp_psnr")
        return out["x_hat"], out["bits"], out["dpb"], extras

    return eval_sequence_lowdelay(
        frames, n_frames, intra_period, intra_fn, pf, crop_hw,
        ratio_for_frame=ratio_for_frame, diagnostics=diagnostics,
    )
