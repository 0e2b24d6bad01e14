"""Modulated deformable convolution, TPU-native.

Replacement for torchvision.ops.DeformConv2d (CUDA/C++; used by the reference
at /root/reference/ICIP2023/src/model/m.py:29-34 (M16) and
ICIP2024/src/model/helpers.py:35-69 (M20, OffsetDiversity)).

TPU formulation (SURVEY.md 2.3): instead of a per-pixel gather kernel, the
K*K taps are unrolled — each tap is one batched bilinear warp (the same
gather-based warp as motion compensation, with the offset group folded into
the batch axis) followed by a mask multiply and a grouped 1x1 contraction on
the MXU. Peak memory stays at 1x the input (taps accumulate), and XLA fuses
mask/scale elementwise work into the contraction.

Semantics match torchvision: sampling at p + base_tap + offset with *zero*
padding outside the frame, modulation mask applied to sampled values, weight
groups = offset groups (the reference always uses them equal).
"""

from __future__ import annotations

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpuvc.ops import precision


def _warp_zero_pad(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zero padding outside (torchvision deform conv
    convention), batched over leading dim. img (B,H,W,C), flow (B,H,W,2)."""
    B, H, W, C = img.shape
    xs = jnp.arange(W, dtype=flow.dtype)
    ys = jnp.arange(H, dtype=flow.dtype)
    x = xs[None, None, :] + flow[..., 0]
    y = ys[None, :, None] + flow[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def corner(yi, xi, w):
        valid = (
            (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        )
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(B, H * W, 1)
        v = jnp.take_along_axis(
            img.reshape(B, H * W, C), idx, axis=1, mode="promise_in_bounds"
        ).reshape(B, H, W, C)
        return v * (w * valid)[..., None]

    return (
        corner(y0, x0, (1 - fy) * (1 - fx))
        + corner(y0, x0 + 1, (1 - fy) * fx)
        + corner(y0 + 1, x0, fy * (1 - fx))
        + corner(y0 + 1, x0 + 1, fy * fx)
    )


def _warp_zero_pallas(img, flow, interpret: bool = False):
    """Zero-padding bilinear warp via the border-clamp Pallas band kernel:
    warp a copy with a 1-px zero ring, so any out-of-frame sample clamps
    onto (or interpolates with) zeros — exactly torchvision's zero-pad
    semantics. Channels wider than the kernel's cap are chunked (each chunk
    reuses the same flow)."""
    from tpuvc.ops.warp_pallas import MAX_CHANNELS, warp_pallas

    B, H, W, C = img.shape
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flowp = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # chunks sequenced with barriers — see warp_pallas_chunked for why
    # independent back-to-back Pallas calls must not be left unordered
    outs = []
    for c0 in range(0, C, MAX_CHANNELS):
        chunk = imgp[..., c0 : c0 + MAX_CHANNELS]
        if outs:
            chunk, prev = jax.lax.optimization_barrier((chunk, outs[-1]))
            outs[-1] = prev
        outs.append(warp_pallas(chunk, flowp, 1.0, 1.0, interpret))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return out[:, 1 : H + 1, 1 : W + 1, :]


def _use_pallas_sampling(shape) -> bool:
    """Gate the Pallas tap-sampling path: TPU backend, large maps. The XLA
    gather path is index-rate-limited (~70M idx/s), which makes the 9-tap
    deformable conv the dominant cost of the v3/v4 codecs at 1080p.
    TPUVC_WARP=xla|pallas overrides."""
    mode = os.environ.get("TPUVC_WARP", "auto")
    if mode == "xla":
        return False
    B, H, W, C = shape
    eligible = H * W >= 128 * 256
    if mode == "pallas":
        return eligible
    return eligible and jax.default_backend() in ("tpu", "axon")


def _use_fused(shape, cg: int, og: int, taps: int) -> bool:
    """Gate the fused multi-tap Pallas kernel (tpuvc.ops.deform_pallas):
    one window pass computes all taps + the weight contraction, instead of
    one full sampling pass per tap. TPUVC_WARP=xla disables."""
    from tpuvc.ops.deform_pallas import MAX_OUT, MAX_TAPS

    mode = os.environ.get("TPUVC_WARP", "auto")
    if mode == "xla":
        return False
    B, H, W, C = shape
    # cg may exceed MAX_CHANNELS: the fused path chunks the group's input
    # channels (each chunk shares the per-tap flows; partial outputs sum),
    # like the DMC wide-channel warp (tpuvc.ops.deform._warp_zero_pallas).
    eligible = (
        og <= MAX_OUT
        and taps <= MAX_TAPS
        and H * W >= 128 * 240
    )
    if mode == "pallas":
        return eligible
    return eligible and jax.default_backend() in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _deform_fused(x, offsets, masks, weight, bias, groups, kernel):
    """Fused-kernel forward of :func:`deform_conv2d` (same args).

    custom_vjp: the backward pass re-derives gradients from the tap-unrolled
    XLA formulation (training runs on small crops where that path is cheap).
    """
    return _deform_taps(
        x, offsets, masks, weight, bias, groups, kernel, fused=True
    )


def _deform_fused_fwd(x, offsets, masks, weight, bias, groups, kernel):
    out = _deform_fused(x, offsets, masks, weight, bias, groups, kernel)
    return out, (x, offsets, masks, weight, bias)


def _deform_fused_bwd(groups, kernel, res, g):
    x, offsets, masks, weight, bias = res
    _, vjp = jax.vjp(
        lambda *a: _deform_taps(*a, groups, kernel, fused=False, force_xla=True),
        x, offsets, masks, weight, bias,
    )
    return vjp(g)


_deform_fused.defvjp(_deform_fused_fwd, _deform_fused_bwd)


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    masks: jnp.ndarray | None,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    groups: int,
    kernel: int = 3,
) -> jnp.ndarray:
    """Modulated deformable convolution.

    Args:
      x: (B, H, W, C_in).
      offsets: (B, H, W, G*K*K*2) — per offset-group, per tap (dy, dx) pairs
        in torchvision order: channel 2*(g*K*K + k) is dy, +1 is dx, with tap
        index k = ky*K + kx scanning the kernel row-major.
      masks: (B, H, W, G*K*K) modulation in [0,1], or None.
      weight: (K, K, C_in // G, C_out) HWIO with C_out grouped: output slice
        g takes input slice g (grouped conv).
      bias: (C_out,) or None.
      groups: number of weight==offset groups G.
    """
    C = x.shape[-1]
    C_out = weight.shape[-1]
    if _use_fused(x.shape, C // groups, C_out // groups, kernel * kernel):
        if masks is None:  # custom_vjp needs a real tensor to differentiate
            masks = jnp.ones(
                (*x.shape[:3], groups * kernel * kernel), x.dtype
            )
        if bias is None:
            bias = jnp.zeros((C_out,), x.dtype)
        return _deform_fused(x, offsets, masks, weight, bias, groups, kernel)
    return _deform_taps(
        x, offsets, masks, weight, bias, groups, kernel, fused=False
    )


def _deform_taps(
    x, offsets, masks, weight, bias, groups, kernel,
    fused: bool = False, force_xla: bool = False,
):
    B, H, W, C = x.shape
    K = kernel
    G = groups
    Cg = C // G
    C_out = weight.shape[-1]
    Og = C_out // G
    assert C % G == 0 and C_out % G == 0, (C, C_out, G)
    assert offsets.shape[-1] == G * K * K * 2, offsets.shape

    # Group-major reshape: (B, H, W, G, ...) -> fold G into batch.
    xg = jnp.moveaxis(
        x.reshape(B, H, W, G, Cg), 3, 1
    ).reshape(B * G, H, W, Cg)
    off = jnp.moveaxis(
        offsets.reshape(B, H, W, G, K * K, 2), 3, 1
    ).reshape(B * G, H, W, K * K, 2)
    if masks is not None:
        m = jnp.moveaxis(
            masks.reshape(B, H, W, G, K * K), 3, 1
        ).reshape(B * G, H, W, K * K)
    else:
        m = jnp.ones(off.shape[:-1], x.dtype)

    pad = K // 2

    if fused:
        from tpuvc.ops.deform_pallas import MAX_CHANNELS, deform_sample_accum

        # Per-tap flows: (dy, dx) torchvision order -> (dx, dy) + tap base.
        off_t = jnp.moveaxis(off, 3, 1)[..., ::-1]  # (BG, T, H, W, 2)
        bases = jnp.asarray(
            [[kx - pad, ky - pad] for ky in range(K) for kx in range(K)],
            x.dtype,
        )
        flows = off_t + bases[None, :, None, None, :]
        m_t = jnp.moveaxis(m, 3, 1)  # (BG, T, H, W)
        # weight (K,K,Cg,C_out) -> (G, T, Cg, Og)
        w_g = weight.reshape(K * K, Cg, G, Og).transpose(2, 0, 1, 3)
        # Group channel widths beyond the kernel's cap (v4 L2/L3: Cg=12/16)
        # fold chunk-minor into the kernel's batch/weight-group axis: ONE
        # pallas_call still serves the whole conv (a call per chunk blows
        # the serialized program past remote-compile limits), each chunk
        # shares the per-tap flows/masks, and the partial contractions sum
        # — exact, as the op is linear in (x, weight) at fixed sampling.
        nc = -(-Cg // MAX_CHANNELS)
        if nc > 1:
            cp = nc * MAX_CHANNELS
            xg = jnp.pad(xg, ((0, 0),) * 3 + ((0, cp - Cg),))
            xg = (
                xg.reshape(B * G, H, W, nc, MAX_CHANNELS)
                .transpose(0, 3, 1, 2, 4)
                .reshape(B * G * nc, H, W, MAX_CHANNELS)
            )
            flows = jnp.repeat(flows, nc, axis=0)
            m_t = jnp.repeat(m_t, nc, axis=0)
            # zero weights on the padded channels keep the pad exact
            w_g = jnp.pad(w_g, ((0, 0), (0, 0), (0, cp - Cg), (0, 0)))
            w_g = (
                w_g.reshape(G, K * K, nc, MAX_CHANNELS, Og)
                .transpose(0, 2, 1, 3, 4)
                .reshape(G * nc, K * K, MAX_CHANNELS, Og)
            )
        out = deform_sample_accum(xg, flows, m_t, w_g)
        if nc > 1:
            out = out.reshape(B * G, nc, H, W, Og).sum(axis=1)
        out = jnp.moveaxis(
            out.reshape(B, G, H, W, Og), 1, -2
        ).reshape(B, H, W, C_out)
        if bias is not None:
            out = out + bias
        return out

    # weight (K,K,Cg,C_out) -> per-tap grouped weights (K*K, G, Cg, Og)
    wk = weight.reshape(K * K, Cg, G, Og)

    sample_fn = (
        _warp_zero_pallas
        if (not force_xla and _use_pallas_sampling(xg.shape))
        else _warp_zero_pad
    )
    acc = jnp.zeros((B, G, H, W, Og), x.dtype)
    for k in range(K * K):
        ky, kx = divmod(k, K)
        base = jnp.asarray([kx - pad, ky - pad], x.dtype)
        # torchvision offset order is (dy, dx); our warp takes (dx, dy).
        flow = off[..., k, ::-1] + base
        sampled = sample_fn(xg, flow)  # (B*G, H, W, Cg)
        sampled = sampled * m[..., k][..., None]
        sampled = sampled.reshape(B, G, H, W, Cg)
        dt = precision.compute_dtype()
        wt = wk[k]
        if dt is not None:  # MXU contraction in policy dtype, f32 accumulate
            sampled = sampled.astype(dt)
            wt = wt.astype(dt)
        acc = acc + jnp.einsum(
            "bghwc,cgo->bghwo", sampled, wt,
            preferred_element_type=x.dtype,
        )
    out = jnp.moveaxis(acc, 1, -2).reshape(B, H, W, C_out)
    if bias is not None:
        out = out + bias
    return out


class DeformConv(nn.Module):
    """flax module wrapper: learnable weight/bias, external offsets/masks."""

    features: int
    groups: int = 8
    kernel: int = 3

    @nn.compact
    def __call__(self, x, offsets, masks=None):
        C = x.shape[-1]
        K = self.kernel
        weight = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (K, K, C // self.groups, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return deform_conv2d(
            x, offsets, masks, weight, bias, self.groups, self.kernel
        )
