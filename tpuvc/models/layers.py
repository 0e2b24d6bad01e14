"""Shared building blocks for the codec transforms.

TPU-native equivalents of the compressai layer vocabulary the reference
builds on (imported at /root/reference/LHBDC/model/layers.py:8-17): GDN/IGDN,
residual blocks with stride / upsample, 3x3 convs, and subpixel upsampling.
All modules are NHWC. GDN's channel mixing is expressed as an einsum so it
lands on the MXU and fuses with the neighboring convolutions.

Convolutions use explicit symmetric padding k//2 (the torch Conv2d
convention) so encoder/decoder spatial alignment matches the reference
codecs' /16 + /4 hyperprior geometry exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tpuvc.entropy.emath import lower_bound
from tpuvc.ops import precision
from tpuvc.ops.resample import pixel_shuffle


class Conv(nn.Module):
    """Conv2d with torch-style symmetric padding (pad = k//2).

    Large stride-1 convs (k >= 5) on big frames are routed through the
    space-to-depth domain (tpuvc.ops.s2d_conv): exact math, 4x MXU lane
    utilization for the narrow channel counts codec convs run at. Weights
    stay canonical HWIO either way.
    """

    features: int
    kernel: int = 5
    stride: int = 1
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        import jax

        from tpuvc.ops.s2d_conv import s2d_conv, s2d_worthwhile

        kinit = (
            nn.initializers.zeros
            if self.zero_init
            else nn.initializers.lecun_normal()
        )
        kernel = self.param(
            "kernel", kinit, (self.kernel, self.kernel, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = precision.compute_dtype()
        if s2d_worthwhile(x.shape[-3], x.shape[-2], self.kernel, self.stride):
            return s2d_conv(x, kernel, bias, dtype=dt)
        p = self.kernel // 2
        if dt is not None:
            x = x.astype(dt)
            kernel = kernel.astype(dt)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            (self.stride, self.stride),
            [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if dt is not None else None,
        )
        # Bias/output in float32 so flow/entropy math between convs stays
        # full precision (tpuvc.ops.precision; XLA fuses the casts).
        return y.astype(jnp.float32) + bias[None, None, None, :]


class Deconv(nn.Module):
    """ConvTranspose2d equivalent: upsamples H, W by exactly ``stride``.

    Padding matches torch's ``ConvTranspose2d(padding=k//2,
    output_padding=stride-1)`` exactly (the reference's ``deconv`` helper,
    e.g. /root/reference/ICIP2023/src/model/elic.py:59-67): the dilated
    input is padded ``(k-1-k//2, k-1-k//2+stride-1)`` per spatial dim, so
    imported reference weights (spatially flipped into HWIO by
    tpuvc.utils.torch_import) reproduce the reference operator
    sample-for-sample rather than up to a one-pixel phase shift.
    """

    features: int
    kernel: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        dt = precision.compute_dtype()
        lo = self.kernel - 1 - self.kernel // 2
        hi = lo + self.stride - 1
        y = nn.ConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((lo, hi), (lo, hi)),
            dtype=dt,
        )(x if dt is None else x.astype(dt))
        return y if dt is None else y.astype(x.dtype)


def conv3x3(features: int, stride: int = 1) -> Conv:
    return Conv(features, kernel=3, stride=stride)


def conv1x1(features: int, stride: int = 1) -> Conv:
    return Conv(features, kernel=1, stride=stride)


class SubpelConv(nn.Module):
    """conv3x3 to C*r^2 channels followed by pixel shuffle (x r upsample)."""

    features: int
    r: int = 2
    kernel: int = 3
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.features * self.r * self.r,
            kernel=self.kernel,
            zero_init=self.zero_init,
        )(x)
        return pixel_shuffle(x, self.r)


class GDN(nn.Module):
    """Generalized divisive normalization (inverse when ``inverse=True``).

    y_c = x_c / sqrt(beta_c + sum_d gamma_{cd} x_d^2)

    beta/gamma are reparametrized as sqrt-domain parameters with a lower
    bound, matching the non-negative parametrization the reference's GDN
    uses (via compressai; see SURVEY.md 2.1 M3/M4 transforms).
    """

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    offset: float = 2.0**-18

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ped = self.offset**2
        beta_raw = self.param(
            "beta",
            lambda rng, shape: jnp.full(shape, np.sqrt(1.0 + ped), jnp.float32),
            (c,),
        )
        gamma_raw = self.param(
            "gamma",
            lambda rng, shape: jnp.sqrt(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32) + ped
            ),
            (c, c),
        )
        beta = lower_bound(beta_raw, float(np.sqrt(self.beta_min + ped))) ** 2 - ped
        gamma = lower_bound(gamma_raw, self.offset) ** 2 - ped
        # Channel mixing of x^2: one MXU matmul per call (policy dtype for
        # the contraction, float32 accumulate/output).
        dt = precision.compute_dtype()
        x2 = x * x
        if dt is not None:
            x2 = x2.astype(dt)
            gamma = gamma.astype(dt)
        norm = (
            jnp.einsum(
                "...c,dc->...d", x2, gamma, preferred_element_type=jnp.float32
            )
            + beta
        )
        norm = jnp.sqrt(norm)
        return x * norm if self.inverse else x / norm


class ResidualBlock(nn.Module):
    """conv3x3 -> lrelu -> conv3x3 -> lrelu, with identity (1x1 if C changes)."""

    features: int

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv3x3(self.features)(x)
        out = nn.leaky_relu(out)
        out = conv3x3(self.features)(out)
        out = nn.leaky_relu(out)
        if x.shape[-1] != self.features:
            identity = conv1x1(self.features)(x)
        return out + identity


class ResidualBlockWithStride(nn.Module):
    """conv3x3/s -> lrelu -> conv3x3 -> GDN, with strided 1x1 skip."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        out = conv3x3(self.features, stride=self.stride)(x)
        out = nn.leaky_relu(out)
        out = conv3x3(self.features)(out)
        out = GDN()(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            skip = conv1x1(self.features, stride=self.stride)(x)
        else:
            skip = x
        return out + skip


class ResidualBlockUpsample(nn.Module):
    """subpel x2 -> lrelu -> conv3x3 -> IGDN, with subpel skip."""

    features: int
    r: int = 2

    @nn.compact
    def __call__(self, x):
        out = SubpelConv(self.features, r=self.r)(x)
        out = nn.leaky_relu(out)
        out = conv3x3(self.features)(out)
        out = GDN(inverse=True)(out)
        skip = SubpelConv(self.features, r=self.r)(x)
        return out + skip


class ResidualUnit(nn.Module):
    """1x1 C/2 -> relu -> 3x3 C/2 -> relu -> 1x1 C -> relu, + identity."""

    features: int

    @nn.compact
    def __call__(self, x):
        out = conv1x1(self.features // 2)(x)
        out = nn.relu(out)
        out = conv3x3(self.features // 2)(out)
        out = nn.relu(out)
        out = conv1x1(self.features)(out)
        return nn.relu(out + x)


class AttentionBlock(nn.Module):
    """Cheng2020 attention: x + trunk(x) * sigmoid(gate(x))."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = x
        for _ in range(3):
            a = ResidualUnit(self.features)(a)
        b = x
        for _ in range(3):
            b = ResidualUnit(self.features)(b)
        b = conv1x1(self.features)(b)
        return x + a * nn.sigmoid(b)


class ResidualBottleneckBlock(nn.Module):
    """ELIC building block: 1x1 -> relu -> 3x3 -> relu -> 1x1, + identity.

    Parity: /root/reference/ICIP2023/src/model/elic.py:69-84 (M13) — the
    reference keeps full width through the block (no C/2 squeeze).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        out = conv1x1(self.features)(x)
        out = nn.relu(out)
        out = conv3x3(self.features)(out)
        out = nn.relu(out)
        out = conv1x1(self.features)(out)
        return out + x


