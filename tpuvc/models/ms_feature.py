"""Multi-scale feature pipeline for the v3/v4 codecs.

Parity targets in /root/reference:
  - MS_Feature: ICIP2024/src/model/helpers.py:72-107 (M12; v4 channels
    64/96/128) and ICIP2023/src/model/helpers.py:15-52 (v3 channels
    32/64/96).
  - FlowNET: ICIP2024/src/model/helpers.py:110-166 (M18) — 4-down/4-up UNet
    over the concatenated references, 4ch flow pair at input resolution.
  - OffsetTemporalEnc / ResidualTemporalEnc: helpers.py:169-222 (M14) —
    pyramid encoders of the conditioning features to a 128ch prior.
  - Reconstructor: helpers.py:226-262 (M15, v4 subpel variant) — top-down
    fusion of the three compensated scales to RGB.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpuvc.models.layers import Conv, Deconv, ResidualBottleneckBlock, SubpelConv


class _ConvRBB(nn.Module):
    """conv (k, s) followed by ``blocks`` residual bottleneck blocks."""

    features: int
    kernel: int = 3
    stride: int = 2
    blocks: int = 3

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, kernel=self.kernel, stride=self.stride)(x)
        for _ in range(self.blocks):
            x = ResidualBottleneckBlock(self.features)(x)
        return x


class MSFeature(nn.Module):
    """Three strided stages producing /2, /4, /8 feature pyramids."""

    channels: tuple[int, int, int] = (64, 96, 128)

    @nn.compact
    def __call__(self, x):
        l1 = _ConvRBB(self.channels[0])(x)
        l2 = _ConvRBB(self.channels[1])(l1)
        l3 = _ConvRBB(self.channels[2])(l2)
        return l1, l2, l3


class FlowNET(nn.Module):
    """UNet flow estimator: in [ref1|ref2] (6ch), out 4ch (two flows).

    The flow-emitting subpel conv is zero-initialized (RAFT-style flow-head
    practice): the net predicts zero motion until trained. Trained flow
    fields are spatially smooth; white-noise init flows are both a bad
    training start (they drive the downstream warps/deform sampling with
    garbage displacements) and the worst case for the spread-adaptive
    sampling kernels (tpuvc/ops/{warp,deform}_pallas), whose cost tracks
    the within-tile displacement spread.
    """

    @nn.compact
    def __call__(self, x):
        s0 = _ConvRBB(32, blocks=2)(x)
        s1 = _ConvRBB(64, blocks=2)(s0)
        s2 = _ConvRBB(128, blocks=2)(s1)
        s3 = _ConvRBB(192, blocks=2)(s2)

        def up(x, feat, out, zero_init=False):
            for _ in range(2):
                x = ResidualBottleneckBlock(feat)(x)
            return SubpelConv(out, r=2, zero_init=zero_init)(x)

        x = up(s3, 192, 128)
        x = Conv(128, kernel=1, stride=1)(jnp.concatenate([x, s2], axis=-1))
        x = up(x, 128, 64)
        x = Conv(64, kernel=1, stride=1)(jnp.concatenate([x, s1], axis=-1))
        x = up(x, 64, 32)
        x = Conv(32, kernel=1, stride=1)(jnp.concatenate([x, s0], axis=-1))
        x = up(x, 32, 4, zero_init=True)
        return x


class TemporalEnc(nn.Module):
    """Pyramid conditioning encoder -> M-channel temporal prior at /16.

    Covers both OffsetTemporalEnc (inputs 4x feature chans per level) and
    ResidualTemporalEnc (1x) — input widths are inferred from the data.
    """

    N: int = 128
    M: int = 128

    @nn.compact
    def __call__(self, c1, c2, c3):
        y = _ConvRBB(self.N, kernel=5)(c1)
        y = _ConvRBB(self.N, kernel=5)(jnp.concatenate([y, c2], axis=-1))
        y = _ConvRBB(self.M, kernel=5)(jnp.concatenate([y, c3], axis=-1))
        return y


class Reconstructor(nn.Module):
    """Top-down decoder fusing the 3 compensated scales -> RGB (v4 subpel)."""

    channels: tuple[int, int, int] = (64, 96, 128)

    @nn.compact
    def __call__(self, x1, x2, x3):
        c1, c2, c3 = self.channels
        l3 = x3
        for _ in range(3):
            l3 = ResidualBottleneckBlock(c3)(l3)
        l3 = SubpelConv(c3, r=2)(l3)

        l2 = Conv(c2, kernel=1, stride=1)(jnp.concatenate([x2, l3], axis=-1))
        for _ in range(3):
            l2 = ResidualBottleneckBlock(c2)(l2)
        l2 = SubpelConv(c2, r=2)(l2)

        l1 = Conv(c1, kernel=1, stride=1)(jnp.concatenate([x1, l2], axis=-1))
        for _ in range(3):
            l1 = ResidualBottleneckBlock(c1)(l1)
        return SubpelConv(3, r=2)(l1)


class ReconstructorDeconv(nn.Module):
    """v3 variant using transposed convs (ICIP2023/src/model/helpers.py:55-91;
    the reference's deconvs are kernel_size=3)."""

    channels: tuple[int, int, int] = (32, 64, 96)

    @nn.compact
    def __call__(self, x1, x2, x3):
        c1, c2, c3 = self.channels
        l3 = x3
        for _ in range(3):
            l3 = ResidualBottleneckBlock(c3)(l3)
        l3 = Deconv(c3, kernel=3, stride=2)(l3)

        l2 = Conv(c2, kernel=1, stride=1)(jnp.concatenate([x2, l3], axis=-1))
        for _ in range(3):
            l2 = ResidualBottleneckBlock(c2)(l2)
        l2 = Deconv(c2, kernel=3, stride=2)(l2)

        l1 = Conv(c1, kernel=1, stride=1)(jnp.concatenate([x1, l2], axis=-1))
        for _ in range(3):
            l1 = ResidualBottleneckBlock(c1)(l1)
        return Deconv(3, kernel=3, stride=2)(l1)
