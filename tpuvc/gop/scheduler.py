"""Level-batched GOP scheduling: the TPU pipeline axis.

The hierarchical B-levels of a GOP form a dependency DAG (SURVEY.md 2.5.2):
frames within one hierarchy level depend only on frames from shallower
levels, so they are mutually independent and can be coded as ONE batched
forward. For GOP-16 that turns 15 sequential B-frame evaluations into 4
batched ones (batch 1, 2, 4, 8) — the MXU sees large batches exactly where
the reference's hot loop (LHBDC/test/testing.py:167) ran frame-by-frame.

The sequential runner (tpuvc.eval.runner) remains the parity path; this
scheduler is the performance path and is tested to produce identical
reconstructions and per-frame sizes.
"""

from __future__ import annotations

from collections.abc import Callable

import jax.numpy as jnp
import numpy as np

from tpuvc.gop.order import GopTable


def code_gops_batched(
    frames,
    i_frames: dict[int, jnp.ndarray],
    table: GopTable,
    inter_fn_batched: Callable,
    gop_starts: list[int],
    max_batch: int | None = None,
    sources: dict | None = None,
):
    """Code several GOPs with CROSS-GOP level batching.

    Hierarchy levels only order frames *within* a GOP; the same level of
    different GOPs shares no dependencies, so a window of G GOPs can run
    every level at batch G * level_width instead of level_width. For
    GOP-16 with G=8 that turns the batch-1/2/4 forwards of the per-GOP
    schedule (under-filled MXU) into uniformly batch-8 forwards — the
    natural pipeline axis of long-sequence eval (SURVEY.md 2.5.2), since
    every UVG sequence is 300/600 frames = 18/37 GOPs.

    Args:
      frames: indexable by ABSOLUTE frame index.
      i_frames: {absolute index: decoded I} for every window boundary
        (g and g+gop for each g in gop_starts).
      inter_fn_batched: as in code_gop_batched — idxs/refs stay GOP-local,
        which is well-defined across GOPs because a hierarchy level has
        the same local geometry in every GOP.
      gop_starts: absolute start index of each GOP in the window.
      sources: optional dict the coder fills with {absolute frame_idx:
        device source slice} — callers computing PSNR can reuse the
        already-uploaded frames instead of a second host->device copy.

    Returns ({absolute frame_idx: decoded}, {absolute frame_idx: bits}).
    """
    decoded = dict(i_frames)
    sizes: dict[int, float] = {}
    pending: list = []
    for level_frames in table.frames_by_level():
        work = [(g0, f) for f in level_frames for g0 in gop_starts]
        chunks = (
            [work]
            if max_batch is None
            else [
                work[i : i + max_batch]
                for i in range(0, len(work), max_batch)
            ]
        )
        for chunk in chunks:
            refs = [table.refs[f] for _, f in chunk]
            ref1 = jnp.concatenate(
                [decoded[g0 + a] for (g0, _), (a, _) in zip(chunk, refs)],
                axis=0,
            )
            ref2 = jnp.concatenate(
                [decoded[g0 + b] for (g0, _), (_, b) in zip(chunk, refs)],
                axis=0,
            )
            xcur = jnp.concatenate(
                [frames[g0 + f] for g0, f in chunk], axis=0
            )
            x_hat, level_sizes = inter_fn_batched(
                ref1, ref2, xcur,
                tuple(f for _, f in chunk), tuple(refs),
            )
            x_hat = jnp.clip(x_hat, 0.0, 1.0)
            for i, (g0, f) in enumerate(chunk):
                decoded[g0 + f] = x_hat[i : i + 1]
                if sources is not None:
                    sources[g0 + f] = xcur[i : i + 1]
            pending.append((chunk, level_sizes))
    # One host fetch for the whole window: intermediate syncs would stall
    # the device between chunks (a relay round trip costs ~30 ms on axon);
    # the decoded feed-forward chain stays on device throughout.
    for chunk, level_sizes in pending:
        level_sizes = np.asarray(level_sizes)
        for i, (g0, f) in enumerate(chunk):
            sizes[g0 + f] = float(level_sizes[i])
    return decoded, sizes


def code_gop_batched(
    frames,
    i_frames: dict[int, jnp.ndarray],
    table: GopTable,
    inter_fn_batched: Callable,
    max_batch: int | None = None,
    sources: dict | None = None,
):
    """Code one GOP with level-batched B-frame forwards.

    Args:
      frames: indexable of (1, H, W, 3) source frames, indexed 0..gop.
      i_frames: {0: decoded I, gop: decoded I} anchor reconstructions.
      inter_fn_batched(ref1 (B,H,W,3), ref2, xcur, frame_indices, ref_pairs)
        -> (x_hat (B,H,W,3), sizes (B,)).
      max_batch: cap per-forward batch. 1080p handles the full GOP-16
        level schedule (batch 8 at the deepest level); batch>=4 1080p
        graphs cost ~13 min of one-time remote compile, so bound this
        when iterating uncached.

    Returns ({frame_idx: decoded (1,H,W,3)}, {frame_idx: bits}).
    """
    decoded = dict(i_frames)
    sizes: dict[int, float] = {}
    pending: list = []
    for level_frames in table.frames_by_level():
        chunks = (
            [level_frames]
            if max_batch is None
            else [
                level_frames[i : i + max_batch]
                for i in range(0, len(level_frames), max_batch)
            ]
        )
        for chunk in chunks:
            refs = [table.refs[f] for f in chunk]
            ref1 = jnp.concatenate([decoded[a] for a, _ in refs], axis=0)
            ref2 = jnp.concatenate([decoded[b] for _, b in refs], axis=0)
            xcur = jnp.concatenate([frames[f] for f in chunk], axis=0)
            x_hat, level_sizes = inter_fn_batched(
                ref1, ref2, xcur, tuple(chunk), tuple(refs)
            )
            x_hat = jnp.clip(x_hat, 0.0, 1.0)
            for i, f in enumerate(chunk):
                decoded[f] = x_hat[i : i + 1]
                if sources is not None:
                    sources[f] = xcur[i : i + 1]
            pending.append((chunk, level_sizes))
    # Deferred single-sync size fetch (see code_gops_batched).
    for chunk, level_sizes in pending:
        level_sizes = np.asarray(level_sizes)
        for i, f in enumerate(chunk):
            sizes[f] = float(level_sizes[i])
    return decoded, sizes
