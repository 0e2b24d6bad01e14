"""Pad-to-multiple / crop for NHWC frame tensors.

Behavioral parity targets (reference, /root/reference):
  - LHBDC/model/m.py:102-108  (``pad``: ReflectionPad2d to the next multiple of
    64, padding applied on the bottom/right only)
  - ICIP2023/src/utils.py:275-283 (``pad`` to x64 before coding, crop after)

All tensors here are channels-last: (..., H, W, C). Padding on the bottom and
right edges only keeps the (0, 0) pixel anchored, which is what the reference
codecs rely on when cropping decoded frames back to the true size.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_to_multiple(x: jnp.ndarray, multiple: int = 64, mode: str = "reflect"):
    """Pad H and W (dims -3, -2) up to the next multiple.

    Returns (padded, (orig_h, orig_w)). ``mode`` is any jnp.pad mode
    ('reflect' matches torch ReflectionPad2d; 'edge' matches replicate).
    """
    h, w = x.shape[-3], x.shape[-2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph == 0 and pw == 0:
        return x, (h, w)
    pad_width = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(x, pad_width, mode=mode), (h, w)


def unpad(x: jnp.ndarray, size: tuple[int, int]):
    """Crop H, W (dims -3, -2) back to ``size`` = (h, w)."""
    h, w = size
    return x[..., :h, :w, :]


def padded_size(h: int, w: int, multiple: int = 64) -> tuple[int, int]:
    """Static helper: the (H, W) after pad_to_multiple."""
    return (-(-h // multiple) * multiple, -(-w // multiple) * multiple)
