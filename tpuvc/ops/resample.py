"""Resampling ops designed for the TPU MXU.

Bilinear resize is expressed as two dense matmuls (one over rows, one over
columns) instead of gathers: for static shapes the interpolation matrices are
tiny, cached on host, and the resize becomes two MXU contractions that XLA
fuses with surrounding convolutions. This is the workhorse behind:

  - flow pyramid up/downsampling (reference SPyNet, LHBDC/model/flow.py:96-99)
  - the x4 flow upsample of the LHBDC codec (LHBDC/model/m.py:29, 57-59)
  - the motion-adaptive down-ratio search which resizes frames at many ratios
    (ICIP2024/src/opt_helpers.py:41-51, OJSP2025/video_model.py:621-666)

avg_pool2d with kernel==stride is a reshape-mean (pure VPU, no windows).
pixel_shuffle/unshuffle are reshape/transpose (zero-FLOP layout ops).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def avg_pool2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping average pool over H, W (dims -3, -2). H, W must divide k.

    Parity: F.avg_pool2d(x, k) in LHBDC/model/m.py:38-47 (flow downsampling).
    """
    *lead, H, W, C = x.shape
    assert H % k == 0 and W % k == 0, (H, W, k)
    x = x.reshape(*lead, H // k, k, W // k, k, C)
    return x.mean(axis=(-4, -2))


@functools.lru_cache(maxsize=256)
def _resize_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, f32, cached per shape."""
    if n_out == n_in:
        return np.eye(n_in, dtype=np.float32)
    out = np.arange(n_out, dtype=np.float64)
    if align_corners and n_out > 1:
        src = out * (n_in - 1) / (n_out - 1)
    else:
        # Half-pixel-center convention (torch align_corners=False).
        scale = n_in / n_out
        src = np.clip((out + 0.5) * scale - 0.5, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = src - lo
    m = np.zeros((n_out, n_in), dtype=np.float64)
    m[np.arange(n_out), lo] += 1.0 - frac
    m[np.arange(n_out), hi] += frac
    return m.astype(np.float32)


def bilinear_resize(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., out_h, out_w, C) via matmuls."""
    H, W = x.shape[-3], x.shape[-2]
    if H == out_h and W == out_w:
        return x
    mh = jnp.asarray(_resize_matrix(H, out_h, align_corners))
    mw = jnp.asarray(_resize_matrix(W, out_w, align_corners))
    # Rows: (..., H, W, C) -> (..., out_h, W, C)
    y = jnp.einsum("oh,...hwc->...owc", mh.astype(x.dtype), x)
    # Cols: (..., out_h, W, C) -> (..., out_h, out_w, C)
    return jnp.einsum("pw,...hwc->...hpc", mw.astype(x.dtype), y)


def upsample2x_flow(flow: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample (align_corners=True) of a flow field with the
    magnitudes doubled — one SPyNet pyramid step.

    Parity: LHBDC/model/flow.py:96 (interpolate scale_factor=2,
    align_corners=True, then *2).
    """
    H, W = flow.shape[-3], flow.shape[-2]
    return bilinear_resize(flow, 2 * H, 2 * W, align_corners=True) * 2.0


def upsample_flow(flow: jnp.ndarray, factor: int) -> jnp.ndarray:
    """xN bilinear upsample of flow *values* without magnitude scaling.

    Parity: nn.Upsample(scale_factor=4, mode='bilinear') at
    LHBDC/model/m.py:29 (align_corners=False — flow coded at /4 resolution is
    upsampled back; magnitudes are already full-resolution there).
    """
    H, W = flow.shape[-3], flow.shape[-2]
    return bilinear_resize(flow, factor * H, factor * W, align_corners=False)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(..., H, W, C*r*r) -> (..., H*r, W*r, C). Subpixel-conv upsampling step.

    Channel order matches torch.nn.PixelShuffle on an NCHW tensor whose
    channels were produced by a conv with C*r*r outputs: index (c, ry, rx).
    """
    *lead, H, W, Crr = x.shape
    C = Crr // (r * r)
    assert C * r * r == Crr
    x = x.reshape(*lead, H, W, C, r, r)
    # (..., H, W, C, ry, rx) -> (..., H, ry, W, rx, C)
    x = jnp.moveaxis(x, (-5, -2, -4, -1, -3), (-5, -4, -3, -2, -1))
    return x.reshape(*lead, H * r, W * r, C)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(..., H*r, W*r, C) -> (..., H, W, C*r*r). Inverse of pixel_shuffle."""
    *lead, Hr, Wr, C = x.shape
    H, W = Hr // r, Wr // r
    assert H * r == Hr and W * r == Wr
    x = x.reshape(*lead, H, r, W, r, C)
    # (..., H, ry, W, rx, C) -> (..., H, W, C, ry, rx)
    x = jnp.moveaxis(x, (-5, -4, -3, -2, -1), (-5, -2, -4, -1, -3))
    return x.reshape(*lead, H, W, C * r * r)
