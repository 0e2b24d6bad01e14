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

    # Per-frame metrics are dispatched immediately but fetched once at the
    # end: the decode chain threads through the DPB on device, so the only
    # host syncs in the whole sequence are the final stacked transfers
    # (each relay round trip costs ~30 ms on axon).
    pending: list = []
    for order in order_list:
        frame = frames[order]
        if typ_list[order] == "I":
            dec, size = intra_fn(frame)
        else:
            ref1, ref2, order1, order2 = dpb.select_references(order)
            dec, size = inter_fn(ref1, ref2, frame, order, order1, order2)

        p_dev = psnr_uint8(frame[:, :h, :w], dec[:, :h, :w])
        ms_dev = None
        if compute_msssim:
            from tpuvc.eval.metrics import msssim

            ms_dev = msssim(frame[:, :h, :w], jnp.clip(dec[:, :h, :w], 0, 1))
        pending.append((order, p_dev, size, ms_dev))
        dpb.add(jnp.clip(dec, 0.0, 1.0), order)

    if not pending:
        return psnr_list, size_list
    ps = np.asarray(jnp.stack([p for _, p, _, _ in pending]))
    szs = np.asarray(jnp.stack([jnp.asarray(s) for _, _, s, _ in pending]))
    mss = (
        np.asarray(jnp.stack([m for _, _, _, m in pending]))
        if compute_msssim
        else None
    )
    for k, (order, _, _, _) in enumerate(pending):
        psnr_list[order] = float(ps[k])
        size_list[order] = float(szs[k])
        extra = {"msssim": float(mss[k])} if mss is not None else {}
        if info is not None:
            info.update(
                video, level, order, typ_list[order], psnr_list[order],
                size_list[order], h * w, **extra,
            )

    return psnr_list, size_list


def eval_sequence_lowdelay(
    frames: list,
    n_frames: int,
    intra_period: int,
    intra_fn: Callable,
    pframe_fn: Callable,
    crop_hw: tuple[int, int],
    ratio_for_frame: Callable | None = None,
    video: str = "",
    level: int = 0,
    info: TestInfographic | None = None,
    diagnostics=None,
    compute_msssim: bool = False,
):
    """Low-delay P-frame evaluation (the OJSP harness's role,
    /root/reference/OJSP2025/video_model.py:505-528 + 565-609): I every
    ``intra_period`` frames, every other frame a P chained through the
    decoded-picture-buffer dict.

    Args:
      intra_fn(x) -> (x_hat, size_bits)
      pframe_fn(x, dpb, ratio) -> (x_hat, size_bits, new_dpb, extras)
        with extras optionally carrying "warp_psnr"/"bits_mv"/"bits_y"
        for the per-frame diagnostics ledger.
      ratio_for_frame(x, dpb) -> down ratio (the fractional search with
        hysteresis); None -> ratio 1.0 everywhere.
      diagnostics: optional tpuvc.eval.results_io.PerFrameDiagnostics.

    Returns (psnr_list, size_list) in display order.
    """
    h, w = crop_hw
    dpb = None
    # Dispatch per frame, fetch once at the end (see eval_sequence); the
    # adaptive ratio search is the only data-dependent host decision in
    # the loop.
    pending: list = []
    for i in range(n_frames):
        frame = frames[i]
        extras: dict = {}
        if i % intra_period == 0:
            dec, size = intra_fn(frame)
            dec = jnp.clip(dec, 0.0, 1.0)
            dpb = {"ref_frame": dec, "ref_feature": None,
                   "ref_down_ratio": 1.0}
            typ, ratio = "I", 1.0
        else:
            ratio = (
                ratio_for_frame(frame, dpb)
                if ratio_for_frame is not None
                else 1.0
            )
            dec, size, dpb, extras = pframe_fn(frame, dpb, ratio)
            typ = "P"
        p_dev = psnr_uint8(frame[:, :h, :w], dec[:, :h, :w])
        ms_dev = None
        if compute_msssim:
            from tpuvc.eval.metrics import msssim

            ms_dev = msssim(frame[:, :h, :w], jnp.clip(dec[:, :h, :w], 0, 1))
        pending.append((typ, ratio, p_dev, size, ms_dev, extras))

    if not pending:
        return [], []
    ps = np.asarray(jnp.stack([p for _, _, p, _, _, _ in pending]))
    szs = np.asarray(
        jnp.stack([jnp.asarray(s) for _, _, _, s, _, _ in pending])
    )
    mss = (
        np.asarray(jnp.stack([m for _, _, _, _, m, _ in pending]))
        if compute_msssim
        else None
    )
    psnr_list: list[float] = []
    size_list: list[float] = []
    for i, (typ, ratio, _, _, _, extras) in enumerate(pending):
        p, size = float(ps[i]), float(szs[i])
        psnr_list.append(p)
        size_list.append(size)
        extra = {"msssim": float(mss[i])} if mss is not None else {}
        if info is not None:
            info.update(video, level, i, typ, p, size, h * w, **extra)
        if diagnostics is not None:
            conv = lambda v: None if v is None else float(v)
            diagnostics.update(
                frame=i, type=typ, down_ratio=ratio, psnr=p,
                warp_psnr=conv(extras.get("warp_psnr")), bits=size,
                bpp=size / (h * w), bits_mv=conv(extras.get("bits_mv")),
                bits_y=conv(extras.get("bits_y")),
            )
    return psnr_list, size_list


def summarize(psnr_list, size_list, crop_hw):
    h, w = crop_hw
    return {
        "psnr": float(np.mean(psnr_list)),
        "bpp": float(np.mean(size_list) / (h * w)),
    }


def eval_sequence_batched(
    frames,
    n_frames: int,
    gop: int,
    intra_fn: Callable,
    inter_fn_batched: Callable,
    crop_hw: tuple[int, int],
    video: str = "",
    level: int = 0,
    info: TestInfographic | None = None,
    max_batch: int | None = None,
    compute_msssim: bool = False,
    window_gops: int = 1,
):
    """Level-batched sequence evaluation: the performance path.

    Codes the sequence GOP by GOP with tpuvc.gop.scheduler's level-batched
    forwards (independent frames within a hierarchy level share one
    batched call — the MXU-saturating schedule bench.py measures). Covers
    the largest ``k*gop + 1`` prefix of the sequence; the caller decides
    how to treat any tail (the sequential ``eval_sequence`` is the
    full-protocol parity path, ICIP2023/src/test.py:36-94).

    Args:
      inter_fn_batched(ref1 (B,H,W,3), ref2, xcur, idxs, refs) ->
        (x_hat (B,H,W,3), sizes (B,)) with idxs/refs in GOP-local orders.

    window_gops > 1 enables CROSS-GOP level batching: the same hierarchy
    level of up to that many consecutive GOPs is coded in one batched
    forward (tpuvc.gop.scheduler.code_gops_batched), so even the
    narrow levels (1-2 frames per GOP) fill the MXU. Reconstructions are
    bit-identical to the per-GOP schedule — only the batching changes.

    Returns (psnr_list, size_list) in display order over the covered
    prefix.
    """
    from tpuvc.gop.order import gop_coding_table
    from tpuvc.gop.scheduler import code_gop_batched, code_gops_batched

    h, w = crop_hw
    n_use = ((n_frames - 1) // gop) * gop + 1
    assert n_use >= gop + 1, f"need at least one full GOP, got {n_frames}"
    table = gop_coding_table(gop)

    psnr_list: list[float] = [0.0] * n_use
    size_list: list[float] = [0.0] * n_use

    # Metrics are DISPATCHED per frame but FETCHED once per sequence: a
    # host round trip costs ~30 ms on the axon relay, and two per frame
    # would eat ~10% of the 1080p budget. Only device scalars are kept
    # alive between dispatch and the final fetch.
    pending: list = []

    def record(idx, typ, dec, size, src=None):
        # src: already-uploaded device slice from the scheduler — avoids a
        # second host->device copy of the source frame just for PSNR.
        frame = src if src is not None else frames[idx]
        p_dev = psnr_uint8(frame[:, :h, :w], dec[:, :h, :w])
        ms_dev = None
        if compute_msssim:
            from tpuvc.eval.metrics import msssim

            ms_dev = msssim(frame[:, :h, :w], jnp.clip(dec[:, :h, :w], 0, 1))
        pending.append((idx, typ, p_dev, size, ms_dev))

    def materialize():
        if not pending:
            return
        ps = np.asarray(jnp.stack([p for _, _, p, _, _ in pending]))
        mss = (
            np.asarray(jnp.stack([m for _, _, _, _, m in pending]))
            if compute_msssim
            else None
        )
        for k, (idx, typ, _, size, _) in enumerate(pending):
            p = float(ps[k])
            size = float(size)  # device scalar only for I frames (few)
            psnr_list[idx] = p
            size_list[idx] = size
            extra = {"msssim": float(mss[k])} if mss is not None else {}
            if info is not None:
                info.update(video, level, idx, typ, p, size, h * w, **extra)

    class _Window:
        """GOP-local view: window[i] = frames[start + i]."""

        def __init__(self, start):
            self.start = start

        def __getitem__(self, i):
            return frames[self.start + i]

    prev_anchor = None
    window = max(1, window_gops) * gop
    for w0 in range(0, n_use - 1, window):
        starts = list(range(w0, min(w0 + window, n_use - 1), gop))
        anchors: dict[int, jnp.ndarray] = {}
        for b in [w0] + [g + gop for g in starts]:
            if b == w0 and prev_anchor is not None:
                anchors[b] = prev_anchor
                continue
            dec, s = intra_fn(frames[b])
            dec = jnp.clip(dec, 0.0, 1.0)
            anchors[b] = dec
            record(b, "I", dec, s)

        srcs: dict = {}
        if len(starts) == 1:
            g = starts[0]
            decoded, sizes = code_gop_batched(
                _Window(g), {0: anchors[g], gop: anchors[g + gop]},
                table, inter_fn_batched, max_batch=max_batch, sources=srcs,
            )
            for f, bits in sizes.items():
                record(g + f, "B", decoded[f], bits, src=srcs.get(f))
        else:
            decoded, sizes = code_gops_batched(
                frames, anchors, table, inter_fn_batched, starts,
                max_batch=max_batch, sources=srcs,
            )
            for f, bits in sizes.items():
                record(f, "B", decoded[f], bits, src=srcs.get(f))
        prev_anchor = anchors[starts[-1] + gop]

    materialize()
    return psnr_list, size_list
