"""SPyNet coarse-to-fine optical flow (the v1/LHBDC motion estimator).

TPU-native rebuild of the capability at /root/reference/LHBDC/model/flow.py
(M1 in SURVEY.md): a spatial pyramid where each level refines an upsampled
coarse flow with a 5-conv (7x7) block over [frame1, warp(frame2, flow), flow].

TPU design notes:
  - The pyramid is built with reshape-mean average pooling and the x2 flow
    upsample is two small MXU matmuls (tpuvc.ops.resample) instead of gathers.
  - Levels are unrolled at trace time (static shapes per level) so XLA can
    tile each level's convs onto the MXU independently.
  - The level count adapts to the input resolution exactly like the
    reference: downsample while a side exceeds 32 px, at most 5 times, and
    level i uses basic-block i from the coarsest. ``num_levels`` controls how
    many distinct blocks exist; finer levels past the list reuse the last
    block (weight sharing; levels beyond the trained count would otherwise be
    untrainable at crop-sized inputs — see SURVEY.md 7.3).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuvc.ops import precision
from tpuvc.ops.resample import avg_pool2d, upsample2x_flow
from tpuvc.ops.s2d_conv import depth_to_space, s2d_conv_raw, space_to_depth
from tpuvc.ops.warp import warp

# Route the 5-conv stack through the space-to-depth domain when a level is
# at least this many pixels: the layout change quadruples MXU lane
# utilization of these narrow convs (2.2x measured at 1080p on v5e) and is
# numerically a pure reassociation. Small (crop-sized / coarse-pyramid)
# levels stay on the direct conv, where s2d's 2x FLOP overhead would lose.
S2D_MIN_PIXELS = 256 * 256


class BasicBlock(nn.Module):
    """Five 7x7 convs: 8 -> 32 -> 64 -> 32 -> 16 -> 2, ReLU between.

    Parameters are canonical (7, 7, Cin, Cout) HWIO kernels regardless of
    route; the s2d route remaps them at trace time (tpuvc.ops.s2d_conv).
    """

    s2d_min_pixels: int = S2D_MIN_PIXELS

    @nn.compact
    def __call__(self, x):
        feats = (32, 64, 32, 16, 2)
        cin = x.shape[-1]
        kernels, biases = [], []
        for i, co in enumerate(feats):
            kernels.append(
                self.param(
                    f"conv{i}_kernel",
                    nn.initializers.lecun_normal(),
                    (7, 7, cin, co),
                )
            )
            biases.append(self.param(f"conv{i}_bias", nn.initializers.zeros, (co,)))
            cin = co

        h, w = x.shape[-3], x.shape[-2]
        dt = precision.compute_dtype()
        use_s2d = h * w >= self.s2d_min_pixels and h % 2 == 0 and w % 2 == 0
        if use_s2d:
            y = space_to_depth(x)
            for k, b in zip(kernels[:-1], biases[:-1]):
                y = nn.relu(s2d_conv_raw(y, k, b, dtype=dt))
            y = s2d_conv_raw(y, kernels[-1], biases[-1], dtype=dt)
            return depth_to_space(y)
        y = x
        for i, (k, b) in enumerate(zip(kernels, biases)):
            if dt is not None:
                k = k.astype(dt)
                yq = y.astype(dt)
            else:
                yq = y
            y = (
                jax.lax.conv_general_dilated(
                    yq, k, (1, 1), [(3, 3), (3, 3)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32 if dt is not None else None,
                ).astype(jnp.float32)
                + b[None, None, None, :]
            )
            if i < len(feats) - 1:
                y = nn.relu(y)
        return y


def preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-reversed ImageNet normalization (the original SPyNet expects
    BGR input; parity with LHBDC/model/flow.py:40-45)."""
    mean = jnp.asarray([0.406, 0.456, 0.485], x.dtype)
    std = jnp.asarray([0.225, 0.224, 0.229], x.dtype)
    x = (x - mean) / std
    return x[..., ::-1]


class SPyNet(nn.Module):
    """Estimates flow from ``first`` to ``second`` (sampling second at
    x + flow reconstructs first)."""

    num_levels: int = 6
    warp_compat: str = "lhbdc"

    @nn.compact
    def __call__(self, first: jnp.ndarray, second: jnp.ndarray) -> jnp.ndarray:
        assert first.shape == second.shape and first.shape[-1] == 3
        firsts = [preprocess(first)]
        seconds = [preprocess(second)]
        for _ in range(5):
            if firsts[0].shape[-3] > 32 or firsts[0].shape[-2] > 32:
                firsts.insert(0, avg_pool2d(firsts[0], 2))
                seconds.insert(0, avg_pool2d(seconds[0], 2))

        blocks = [BasicBlock(name=f"basic_{i}") for i in range(self.num_levels)]
        if self.is_initializing():
            # Materialize every level's params even when the init input is a
            # small crop that exercises fewer pyramid levels (a 256px train
            # init must still create the blocks used at 1080p eval).
            dummy = jnp.zeros((1, 8, 8, 8), first.dtype)
            for blk in blocks[len(firsts):]:
                blk(dummy)

        b, h0, w0, _ = firsts[0].shape
        flow = jnp.zeros((b, h0 // 2, w0 // 2, 2), first.dtype)
        for level in range(len(firsts)):
            up = upsample2x_flow(flow)
            # The reference replicate-pads odd-size mismatches; our pipeline
            # pads inputs to x64 so pyramid sizes stay even throughout.
            assert up.shape[-3:-1] == firsts[level].shape[-3:-1], (
                up.shape,
                firsts[level].shape,
            )
            warped = warp(seconds[level], up, compat=self.warp_compat)
            inp = jnp.concatenate([firsts[level], warped, up], axis=-1)
            block = blocks[min(level, self.num_levels - 1)]
            flow = block(inp) + up
        return flow
