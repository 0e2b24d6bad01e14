"""Space-to-depth reformulation of large-kernel stride-1 convolutions.

SPyNet's Basic blocks (M1, /root/reference/LHBDC/model/flow.py:52-70) are
five 7x7 convs with 2..64 channels. At 1080p these carry ~70% of the whole
B-frame forward's FLOPs, but their narrow channel counts leave most of the
MXU's 128 lanes idle: measured on v5e, the direct stack runs at ~35% of the
chip's matmul rate.

The fix is a layout change, not an approximation: a 7x7 stride-1 conv over
(H, W, C) is *exactly* a 5x5 stride-1 conv over the space-to-depth
transformed (H/2, W/2, 4C) tensor with a phase-structured kernel. Output
pixel (2Y+py, 2X+px) reads input (2Y+py+dy-3, 2X+px+dx-3); writing the input
coordinate as 2(Y+t)+q gives dy = 2t+q-py+3, so coarse taps span
t in [-2, 2] - a 5x5 kernel whose (q-in, p-out) channel blocks hold the
original 7x7 taps (about half the 5x5x4Cx4C entries are structurally zero).
4x wider channels quadruple MXU lane utilization for a 2x FLOP overhead:
measured 2.2x end-to-end on the finest SPyNet level (78ms vs 172ms for the
B=4 1080p stack).

The kernel remap is a tiny einsum against a constant 0/1 map, applied to the
*parameters* at trace time - the stored weights stay in the canonical 7x7
HWIO layout, so checkpoints are route-independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# Minimum pixel count for routing a stride-1 conv through the s2d domain.
# Below this the layout transposes outweigh the MXU utilization gain.
S2D_MIN_PIXELS = 256 * 256


def s2d_worthwhile(h: int, w: int, kernel: int, stride: int) -> bool:
    """Route policy: stride-1, kernel >= 5 (k=3 has a 4x FLOP overhead in
    s2d, k=5 only 1.44x, k=7 2x), even dims, and a large enough frame."""
    return (
        stride == 1
        and kernel >= 5
        and kernel % 2 == 1
        and h % 2 == 0
        and w % 2 == 0
        and h * w >= S2D_MIN_PIXELS
    )


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, r*r*C); channel blocks ordered
    (phase_y, phase_x) major, original channel minor."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // (r * r)
    x = x.reshape(b, h, w, r, r, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, r * h, r * w, c)


@functools.lru_cache(maxsize=None)
def _phase_map(k: int) -> np.ndarray:
    """Constant 0/1 map (kc, kc, 4, 4, k, k): coarse tap (ty, tx) with input
    phase q and output phase p picks fine tap (dy, dx). kc = k//2 + 2 for odd
    k with SAME padding (t spans [-(k//2+1)//2-..., ...]; for k=7 this is
    [-2, 2] -> kc=5, for k=5 -> kc=4, k=3 -> kc=3)."""
    assert k % 2 == 1
    half = k // 2
    # t range: dy = 2t + q - p + half in [0, k) with q, p in {0, 1};
    # symmetric in t for odd k (|2t| <= half + 1). Scan to be exact.
    ts = [t for t in range(-k, k + 1)
          if any(0 <= 2 * t + q - p + half < k
                 for q in range(2) for p in range(2))]
    t_min, t_max = min(ts), max(ts)
    kc = t_max - t_min + 1
    m = np.zeros((kc, kc, 4, 4, k, k), np.float32)
    for py in range(2):
        for px in range(2):
            for qy in range(2):
                for qx in range(2):
                    for ty in range(t_min, t_max + 1):
                        for tx in range(t_min, t_max + 1):
                            dy = 2 * ty + qy - py + half
                            dx = 2 * tx + qx - px + half
                            if 0 <= dy < k and 0 <= dx < k:
                                m[ty - t_min, tx - t_min,
                                  qy * 2 + qx, py * 2 + px, dy, dx] = 1.0
    return m, -t_min  # (map, pad_before == pad_after by symmetry of range)


def s2d_conv_weights(w: jnp.ndarray):
    """Remap a (k, k, Cin, Cout) HWIO kernel to its s2d-domain equivalent
    (kc, kc, 4*Cin, 4*Cout). Returns (w_s2d, padding) where padding is the
    symmetric coarse pad amount."""
    k, k2, ci, co = w.shape
    assert k == k2
    m, pad = _phase_map(k)
    w5 = jnp.einsum("yxqpYX,YXio->yxqipo", jnp.asarray(m), w)
    kc = m.shape[0]
    return w5.reshape(kc, kc, 4 * ci, 4 * co), pad


def s2d_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
             dtype=None) -> jnp.ndarray:
    """Exact stride-1 SAME conv of odd-kernel ``w`` over ``x``, computed in
    the space-to-depth domain. ``x`` is (B, H, W, Cin) with even H, W;
    ``w`` is (k, k, Cin, Cout) HWIO; returns (B, H, W, Cout)."""
    y = s2d_conv_raw(space_to_depth(x), w, b, dtype=dtype)
    return depth_to_space(y)


def s2d_conv_raw(x4: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
                 dtype=None) -> jnp.ndarray:
    """The s2d-domain conv itself: ``x4`` already space-to-depth transformed.
    Lets a stack of convs share one s2d/d2s pair."""
    w4, pad = s2d_conv_weights(w)
    if dtype is not None:
        x4 = x4.astype(dtype)
        w4 = w4.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x4, w4, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if dtype is not None else None,
    )
    if y.dtype != jnp.float32:
        y = y.astype(jnp.float32)
    if b is not None:
        co = b.shape[0]
        y = y + jnp.tile(b.astype(y.dtype), 4)[None, None, None, :]
        assert y.shape[-1] == 4 * co
    return y
