"""UNets: the LHBDC occlusion-mask net and the Flex-Rate flow predictor.

Parity targets in /root/reference:
  - Mask: LHBDC/model/layers.py:194-249 (M5) — 3-down/3-up conv UNet over the
    two warped predictions, sigmoid single-channel output, bilinear x2
    upsampling in the decoder.
  - UNet: Flex-Rate-Hier-Bidir-Video-Compression/b_model/unet.py:9-92 (M7) —
    generic depth/width-configurable UNet (depth 5, wf 5) predicting
    bidirectional flow from the concatenated reference frames.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpuvc.models.layers import Conv
from tpuvc.ops.resample import bilinear_resize


def _maxpool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def _up2(x):
    return bilinear_resize(x, 2 * x.shape[-3], 2 * x.shape[-2], align_corners=False)


class MaskUNet(nn.Module):
    """Occlusion mask over [fw, bw] warped frames -> sigmoid mask in (0,1)."""

    ch: int = 32

    @nn.compact
    def __call__(self, x):
        c1 = nn.relu(Conv(self.ch, kernel=5)(x))
        x = _maxpool2(c1)
        c2 = nn.relu(Conv(self.ch * 2, kernel=5)(x))
        x = _maxpool2(c2)
        c3 = nn.relu(Conv(self.ch * 4, kernel=3)(x))
        x = _maxpool2(c3)
        x = nn.relu(Conv(self.ch * 4, kernel=3)(x))
        x = jnp.concatenate([_up2(x), c3], axis=-1)
        x = nn.relu(Conv(self.ch * 4, kernel=3)(x))
        x = jnp.concatenate([_up2(x), c2], axis=-1)
        x = nn.relu(Conv(self.ch * 2, kernel=5)(x))
        x = jnp.concatenate([_up2(x), c1], axis=-1)
        x = nn.relu(Conv(self.ch, kernel=5)(x))
        return nn.sigmoid(Conv(1, kernel=5)(x))


def _avgpool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class UNet(nn.Module):
    """Tunable UNet with ``depth`` levels and widths 2**(wf+i).

    Structure matches Flex-Rate.../b_model/unet.py:8-95: double-conv blocks
    with leaky_relu(0.1), avg-pool downsampling, a mid conv, and up blocks of
    bilinear x2 upsample + conv3x3 + skip concat + double conv; final 3x3.
    """

    out_channels: int = 4
    depth: int = 5
    wf: int = 5

    @nn.compact
    def __call__(self, x):
        def conv_block(x, w):
            x = _lrelu(Conv(w, kernel=3)(x))
            return _lrelu(Conv(w, kernel=3)(x))

        skips = []
        for i in range(self.depth):
            w = 2 ** (self.wf + i)
            x = conv_block(x, w)
            if i < self.depth - 1:
                skips.append(x)
                x = _avgpool2(x)
        x = _lrelu(Conv(2 ** (self.wf + self.depth - 1), kernel=3)(x))
        for i in reversed(range(self.depth - 1)):
            w = 2 ** (self.wf + i)
            x = Conv(w, kernel=3)(_up2(x))
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = conv_block(x, w)
        return Conv(self.out_channels, kernel=3)(x)
