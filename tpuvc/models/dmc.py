"""P-frame conditional codec with content-adaptive inference (OJSP 2025).

TPU-native rebuild of the *capability* of /root/reference/OJSP2025/
video_model.py:237-676 (M22). The reference file is a patch for Microsoft
DCVC-FM whose base modules (common_model, video_net, block_mc,
stream_helper; video_model.py:12-17) are absent from the repo, so this is a
self-contained conditional P-frame codec built from tpuvc components that
carries the OJSP novelties:

  - ``optimize_down_sampling_ratio`` (video_model.py:621-666): 32 fractional
    ratios 1..8.75 step 0.25, warp-PSNR argmax with a 0.1 dB hysteresis bias
    toward the previous frame's ratio (gop/adaptive.py);
  - MV magnitude rescaling (video_model.py:535-548): the estimated flow is
    divided by the chosen ratio before coding and multiplied back after
    decoding, keeping coded motion statistics in the trained range;
  - DCVC-style decoded picture buffer dict: {ref_frame, ref_feature,
    ref_down_ratio} propagated frame to frame;
  - conditional coding: the current frame is coded relative to a motion-
    compensated feature context, not an explicit residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from tpuvc.entropy.bottleneck import FactorizedBottleneck
from tpuvc.entropy.emath import likelihood_to_bits
from tpuvc.entropy.gaussian import GaussianConditional
from tpuvc.entropy.quant import quantize
from tpuvc.models.layers import Conv, ResidualBottleneckBlock, SubpelConv
from tpuvc.models.spynet import SPyNet
from tpuvc.ops.warp import warp


def resize_antialias(x, out_h: int, out_w: int):
    """Anti-aliased resize for the fractional downsampling path
    (the reference uses F.interpolate(..., antialias=True))."""
    return jax.image.resize(
        x, x.shape[:-3] + (out_h, out_w, x.shape[-1]), "linear"
    )


class _HyperCoder(nn.Module):
    """Small mean-scale hyperprior over an existing latent y, with per-level
    gain vectors (the q_index analog of DCVC-FM: one model, many rates;
    geometric interpolation over a traced fractional level)."""

    N: int
    levels: int = 4

    def setup(self):
        self.h_a1 = Conv(self.N, kernel=3, stride=1)
        self.h_a2 = Conv(self.N, kernel=5, stride=2)
        self.h_a3 = Conv(self.N, kernel=5, stride=2)
        self.h_s1 = SubpelConv(self.N, r=2)
        self.h_s2 = SubpelConv(self.N * 3 // 2, r=2)
        self.h_s3 = Conv(self.N * 2, kernel=3, stride=1)
        self.entropy_bottleneck = FactorizedBottleneck(channels=self.N)
        self.gaussian = GaussianConditional()
        ones = lambda rng, shape: jnp.ones(shape, jnp.float32)
        self.gain = self.param("gain", ones, (self.levels, self.N))
        self.inv_gain = self.param("inv_gain", ones, (self.levels, self.N))

    def _interp(self, g, q):
        q = jnp.clip(jnp.asarray(q, jnp.float32), 0.0, self.levels - 1.0)
        hi = jnp.clip(jnp.ceil(q), 0, self.levels - 1).astype(jnp.int32)
        lo = jnp.clip(jnp.floor(q), 0, self.levels - 1).astype(jnp.int32)
        l = hi.astype(jnp.float32) - q
        return jnp.abs(g[hi]) ** (1.0 - l) * jnp.abs(g[lo]) ** l

    def __call__(self, y, mode, rng=None, q=0.0):
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        y = y * self._interp(self.gain, q)
        z = self.h_a3(nn.relu(self.h_a2(nn.relu(self.h_a1(y)))))
        z_hat, z_lik = self.entropy_bottleneck(z, mode, rng=rngs[0])
        p = self.h_s3(nn.relu(self.h_s2(nn.relu(self.h_s1(z_hat)))))
        scales, means = jnp.split(p, 2, axis=-1)
        y_hat, y_lik = self.gaussian(
            y, scales, means=means, mode=mode, rng=rngs[1]
        )
        y_hat = y_hat * self._interp(self.inv_gain, q)
        return y_hat, {"y": y_lik, "z": z_lik}

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class PFrameDMC(nn.Module):
    feat: int = 48
    N: int = 64

    def setup(self):
        self.optic_flow = SPyNet(warp_compat="exact")
        # MV codec: analysis/synthesis over the 2ch flow at /8.
        self.mv_g_a = [
            Conv(self.N, kernel=5, stride=2),
            Conv(self.N, kernel=5, stride=2),
            Conv(self.N, kernel=5, stride=2),
        ]
        self.mv_g_s = [
            SubpelConv(self.N, r=2),
            SubpelConv(self.N, r=2),
            SubpelConv(2, r=2, zero_init=False),
        ]
        self.mv_coder = _HyperCoder(N=self.N)

        # Feature extractor over the reference frame (fused with the
        # propagated ref_feature, the DCVC feature adaptor).
        self.feat_in = Conv(self.feat, kernel=3, stride=1)
        self.feat_blocks = [ResidualBottleneckBlock(self.feat) for _ in range(2)]

        # Context refinement after warping.
        self.ctx_refine = [
            Conv(self.feat, kernel=3, stride=1),
            ResidualBottleneckBlock(self.feat),
            ResidualBottleneckBlock(self.feat),
        ]

        # Conditional contextual codec at /8 with context injection.
        self.g_a_layers = [
            Conv(self.N, kernel=5, stride=2),
            ResidualBottleneckBlock(self.N),
            Conv(self.N, kernel=5, stride=2),
            ResidualBottleneckBlock(self.N),
            Conv(self.N, kernel=5, stride=2),
        ]
        self.y_coder = _HyperCoder(N=self.N)
        self.g_s_layers = [
            SubpelConv(self.N, r=2),
            ResidualBottleneckBlock(self.N),
            SubpelConv(self.N, r=2),
            ResidualBottleneckBlock(self.N),
            SubpelConv(self.feat, r=2),
        ]
        self.recon_head = [
            Conv(self.feat, kernel=3, stride=1),
            ResidualBottleneckBlock(self.feat),
            ResidualBottleneckBlock(self.feat),
        ]
        self.to_rgb = Conv(3, kernel=3, stride=1)

    # --- motion ---

    def estimate_mv(self, x, ref_frame, ratio: float):
        """Flow at a fractional down ratio, upsampled back (x, ref at 1/r)."""
        from tpuvc.ops.pad import pad_to_multiple, unpad
        from tpuvc.ops.resample import bilinear_resize

        H, W = x.shape[-3], x.shape[-2]
        if ratio == 1.0:
            return self.optic_flow(x, ref_frame)
        h = max(int(round(H / ratio)) // 8 * 8, 64)
        w = max(int(round(W / ratio)) // 8 * 8, 64)
        xd = resize_antialias(x, h, w)
        rd = resize_antialias(ref_frame, h, w)
        # Replicate-pad to x64 so the SPyNet pyramid stays even at every
        # level, then crop the flow back (the reference zero-pads to x8;
        # its original SPyNet handles odd levels by replicate-padding).
        xd, _ = pad_to_multiple(xd, 64, mode="edge")
        rd, _ = pad_to_multiple(rd, 64, mode="edge")
        mv = unpad(self.optic_flow(xd, rd), (h, w))
        # Magnitude scale W/w is the ratio actually realized by the resize.
        return bilinear_resize(mv, H, W) * (W / w)

    def code_mv(self, mv_scaled, mode, rng, q=0.0):
        y = mv_scaled
        for i, l in enumerate(self.mv_g_a):
            y = l(y) if i == len(self.mv_g_a) - 1 else nn.leaky_relu(l(y))
        y_hat, lik = self.mv_coder(y, mode, rng, q=q)
        x = y_hat
        for i, l in enumerate(self.mv_g_s):
            x = l(x) if i == len(self.mv_g_s) - 1 else nn.leaky_relu(l(x))
        return x, lik

    def ref_features(self, ref_frame, ref_feature):
        if ref_feature is None:
            # First P-frame after an I-frame: no propagated feature yet.
            B, H, W, _ = ref_frame.shape
            ref_feature = jnp.zeros((B, H, W, self.feat), ref_frame.dtype)
        f = self.feat_in(jnp.concatenate([ref_frame, ref_feature], axis=-1))
        for b in self.feat_blocks:
            f = b(f)
        return f

    def motion_compensate(self, ref_frame, ref_feature, mv_hat):
        f = self.ref_features(ref_frame, ref_feature)
        warped_f = warp(f, mv_hat)
        warped_x = warp(ref_frame, mv_hat)
        ctx = jnp.concatenate([warped_f, warped_x, mv_hat], axis=-1)
        x = self.ctx_refine[0](ctx)
        for b in self.ctx_refine[1:]:
            x = b(x)
        return x, warped_x

    # --- conditional coding ---

    def code_frame(self, x, context, mode, rng, q=0.0):
        y = jnp.concatenate([x, context], axis=-1)
        for l in self.g_a_layers:
            y = l(y)
        y_hat, lik = self.y_coder(y, mode, rng, q=q)
        f = y_hat
        for l in self.g_s_layers:
            f = l(f)
        f = self.recon_head[0](jnp.concatenate([f, context], axis=-1))
        for b in self.recon_head[1:]:
            f = b(f)
        x_hat = self.to_rgb(f)
        return x_hat, f, lik

    def __call__(self, x, dpb: dict, ratio: float = 1.0, mode: str = "ste",
                 rng=None, q=0.0):
        """Code one P-frame against the DPB.

        dpb: {"ref_frame": (B,H,W,3), "ref_feature": (B,H,W,feat) | None,
              "ref_down_ratio": float}.
        q: rate level (fractional allowed; gain-vector interpolation — the
        q_index analog of DCVC-FM).
        Returns dict with x_hat, bits, rate, and the updated dpb.
        """
        B, H, W, _ = x.shape
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        ref_frame = dpb["ref_frame"]
        est_mv = self.estimate_mv(x, ref_frame, ratio)

        # OJSP MV scaling: code est_mv / ratio, decode mv_hat * ratio.
        mv_hat, mv_lik = self.code_mv(est_mv / ratio, mode, rngs[0], q=q)
        mv_hat = mv_hat * ratio

        context, warped_x = self.motion_compensate(
            ref_frame, dpb.get("ref_feature"), mv_hat
        )
        x_hat, feature, y_lik = self.code_frame(x, context, mode, rngs[1], q=q)

        bits = sum(likelihood_to_bits(l) for l in mv_lik.values()) + sum(
            likelihood_to_bits(l) for l in y_lik.values()
        )
        return {
            "x_hat": x_hat,
            "warped": warped_x,
            "bits": bits,
            "rate": bits / (B * H * W),
            "dpb": {
                "ref_frame": jnp.clip(x_hat, 0.0, 1.0),
                "ref_feature": feature,
                "ref_down_ratio": ratio,
            },
        }

    def warp_prediction(self, x, ref_frame, ratio: float):
        """Warp-only prediction for the fractional-ratio search."""
        mv = self.estimate_mv(x, ref_frame, ratio)
        return warp(ref_frame, mv)

    def aux_loss(self):
        return self.mv_coder.aux_loss() + self.y_coder.aux_loss()
