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
  - DCVC-style decoded picture buffer dict {ref_frame, ref_feature,
    ref_mv_feature, ref_y, ref_mv_y, ref_down_ratio} propagated frame to
    frame (video_model.py:449-456, 611-617);
  - conditional coding: the current frame is coded relative to a motion-
    compensated feature context, not an explicit residual.

and the DCVC-FM entropy path the reference calls into
(video_model.py:411-446, 468-489, 560-589):

  - **four-part spatial prior**: each latent is partitioned into four
    parts (2x2 spatial phases crossed over the two channel halves, the
    diagonal assignment of DCVC's ``forward_four_part_prior``); parts are
    coded sequentially, each later part's entropy parameters refined by a
    spatial-prior-adaptor conv over the parts already decoded;
  - **temporal latent prior**: the previous frame's decoded latent
    (ref_y / ref_mv_y) is fused with the hyper decoder output into the
    entropy parameters (DCVC's ``*_prior_param_decoder(z_hat, dpb, ...)``);
  - **content-adaptive quantization step** per element from the fused
    params (the FM part of DCVC-FM): v = round((y - mean) * q_step);
  - **Laplace bit estimators** for the latent residuals
    (``y_distribution='laplace'``, ``get_y_laplace_bits``); z stays on the
    factorized bottleneck (``bit_estimator_z``).

TPU notes: the four parts are true sequential data dependencies (as in the
reference) but each part step is dense conv + elementwise math over the
full latent — MXU work, no gathers; the real coder squeezes each part to a
compact (h/2, w/2, C) tensor so host transfers stay small.

PARITY CAVEAT (for RD validation day): the reference repo ships ONLY
OJSP2025/video_model.py — the DCVC-FM base modules it imports
(common_model.CompressionModel, video_net, block_mc, stream_helper;
video_model.py:12-17) are absent, so the four-part partition, the prior
fusion topology, and the Laplace bit estimators here are an INFORMED
RECONSTRUCTION of DCVC-FM's published design (forward_four_part_prior et
al.), not a checkable line-level parity target. The parts the reference
DOES contain — ratio search + hysteresis, MV rescale, DPB dict, the
forward_one_frame orchestration — are built to file:line parity (cited at
each method). Weights from DCVC-FM checkpoints are NOT importable here;
RD claims for this family must come from training, not import.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from tpuvc.entropy.bottleneck import FactorizedBottleneck
from tpuvc.entropy.emath import likelihood_to_bits
from tpuvc.entropy.laplace import LaplaceConditional
from tpuvc.entropy.quant import quantize
from tpuvc.models.layers import Conv, ResidualBottleneckBlock, SubpelConv
from tpuvc.models.spynet import SPyNet
from tpuvc.ops.warp import sequenced, warp


def resize_antialias(x, out_h: int, out_w: int):
    """Anti-aliased resize for the fractional downsampling path
    (the reference uses F.interpolate(..., antialias=True))."""
    return jax.image.resize(
        x, x.shape[:-3] + (out_h, out_w, x.shape[-1]), "linear"
    )


# --- four-part partition: 2x2 spatial phases x channel halves ------------
#
# Part k codes spatial phase k of the first channel half and phase 3-k of
# the second half (DCVC's diagonal mask assignment): every part sees both
# channel halves and both row parities, so each adaptor step conditions on
# spatially and channel-wise adjacent decoded values.

_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def part_mask(h: int, w: int, c: int, k: int) -> jnp.ndarray:
    """(h, w, c) float mask of part k's coded positions."""
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w, c), 0) % 2
    s = jax.lax.broadcasted_iota(jnp.int32, (h, w, c), 1) % 2
    ch = jax.lax.broadcasted_iota(jnp.int32, (h, w, c), 2)
    first = ch < c // 2
    (r0, s0), (r1, s1) = _PHASES[k], _PHASES[3 - k]
    m = jnp.where(
        first,
        (r == r0) & (s == s0),
        (r == r1) & (s == s1),
    )
    return m.astype(jnp.float32)


def part_squeeze(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, C) compact view of part k."""
    c0 = x.shape[-1] // 2
    (r0, s0), (r1, s1) = _PHASES[k], _PHASES[3 - k]
    a = x[:, r0::2, s0::2, :c0]
    b = x[:, r1::2, s1::2, c0:]
    return jnp.concatenate([a, b], axis=-1)


def part_scatter(full: jnp.ndarray, vals: jnp.ndarray, k: int) -> jnp.ndarray:
    """Write part k's compact values back into the full tensor."""
    c0 = full.shape[-1] // 2
    (r0, s0), (r1, s1) = _PHASES[k], _PHASES[3 - k]
    full = full.at[:, r0::2, s0::2, :c0].set(vals[..., :c0])
    full = full.at[:, r1::2, s1::2, c0:].set(vals[..., c0:])
    return full


def _q_step(raw: jnp.ndarray) -> jnp.ndarray:
    """Positive content-adaptive quantization step, ~1 at init."""
    return jnp.exp(jnp.clip(raw, -3.0, 3.0))


class _FourPartCoder(nn.Module):
    """Latent coder: hyper + temporal prior -> fused (q_step, scales,
    means) -> four-part sequential coding with Laplace likelihoods, plus
    per-level gain vectors (the q_index analog of DCVC-FM; geometric
    interpolation over a traced fractional level)."""

    N: int
    levels: int = 4

    def setup(self):
        N = self.N
        self.h_a1 = Conv(N, kernel=3, stride=1)
        self.h_a2 = Conv(N, kernel=5, stride=2)
        self.h_a3 = Conv(N, kernel=5, stride=2)
        self.h_s1 = SubpelConv(N, r=2)
        self.h_s2 = SubpelConv(N * 3 // 2, r=2)
        self.h_s3 = Conv(N * 2, kernel=3, stride=1)
        self.entropy_bottleneck = FactorizedBottleneck(channels=N)
        self.laplace = LaplaceConditional()
        # temporal latent prior over ref latent (DCVC prior_param_decoder)
        self.t_prior1 = Conv(N, kernel=3, stride=1)
        self.t_prior2 = Conv(N, kernel=3, stride=1)
        self.fusion1 = Conv(3 * N, kernel=1, stride=1)
        self.fusion2 = Conv(3 * N, kernel=1, stride=1)
        self.adaptors = [Conv(3 * N, kernel=3, stride=1) for _ in range(3)]
        ones = lambda rng, shape: jnp.ones(shape, jnp.float32)
        self.gain = self.param("gain", ones, (self.levels, self.N))
        self.inv_gain = self.param("inv_gain", ones, (self.levels, self.N))

    def _interp(self, g, q):
        q = jnp.clip(jnp.asarray(q, jnp.float32), 0.0, self.levels - 1.0)
        hi = jnp.clip(jnp.ceil(q), 0, self.levels - 1).astype(jnp.int32)
        lo = jnp.clip(jnp.floor(q), 0, self.levels - 1).astype(jnp.int32)
        l = hi.astype(jnp.float32) - q
        return jnp.abs(g[hi]) ** (1.0 - l) * jnp.abs(g[lo]) ** l

    # --- shared stages -------------------------------------------------

    def hyper_analysis(self, y, q=0.0):
        """(gained y, z) — encoder-side analysis."""
        y = y * self._interp(self.gain, q)
        z = self.h_a3(nn.relu(self.h_a2(nn.relu(self.h_a1(y)))))
        return y, z

    def fused_params(self, z_hat, ctx):
        """Hyper decoder + temporal latent prior -> fused 3N params.

        ctx: previous frame's decoded latent (B, h, w, N) or None (first
        P-frame after intra: zero temporal prior, DCVC does the same for
        an empty DPB).
        """
        p = self.h_s3(nn.relu(self.h_s2(nn.relu(self.h_s1(z_hat)))))
        if ctx is None:
            ctx = jnp.zeros(p.shape[:3] + (self.N,), p.dtype)
        t = self.t_prior2(nn.relu(self.t_prior1(ctx)))
        f = jnp.concatenate([p, t], axis=-1)
        return self.fusion2(nn.relu(self.fusion1(f)))

    def part_params(self, params0, y_hat, k: int):
        """Entropy parameters for part k: the fused params for part 0,
        adaptor conv over (fused params, decoded-so-far) for parts 1-3.
        Returns full-resolution (q_step, scales, means)."""
        if k == 0:
            p = params0
        else:
            p = self.adaptors[k - 1](
                jnp.concatenate([params0, y_hat], axis=-1)
            )
        qs_raw, scales, means = jnp.split(p, 3, axis=-1)
        return _q_step(qs_raw), scales, means

    def apply_inv_gain(self, y_hat, q=0.0):
        return y_hat * self._interp(self.inv_gain, q)

    # --- training / eval forward ---------------------------------------

    def __call__(self, y, ctx, mode, rng=None, q=0.0):
        rngs = jax.random.split(rng, 5) if rng is not None else (None,) * 5
        y, z = self.hyper_analysis(y, q=q)
        z_hat, z_lik = self.entropy_bottleneck(z, mode, rng=rngs[0])
        params0 = self.fused_params(z_hat, ctx)

        B, h, w, N = y.shape
        y_hat = jnp.zeros_like(y)
        y_lik = jnp.ones_like(y)
        for k in range(4):
            q_step, scales, means = self.part_params(params0, y_hat, k)
            y_res = (y - means) * q_step
            v_hat, lik = self.laplace(
                y_res, scales, mode=mode, rng=rngs[1 + k]
            )
            part = v_hat / q_step + means
            m = part_mask(h, w, N, k)
            y_hat = y_hat + m * part
            y_lik = y_lik * jnp.where(m > 0, lik, 1.0)

        y_out = y_hat * self._interp(self.inv_gain, q)
        return y_out, {"y": y_lik, "z": z_lik}

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


MV_FEAT = 8  # propagated motion feature channels (DCVC ref_mv_feature)


class PFrameDMC(nn.Module):
    feat: int = 48
    N: int = 64

    def setup(self):
        self.optic_flow = SPyNet(warp_compat="exact")
        # MV codec: analysis/synthesis over [flow, ref_mv_feature] at /8.
        self.mv_g_a = [
            Conv(self.N, kernel=5, stride=2),
            Conv(self.N, kernel=5, stride=2),
            Conv(self.N, kernel=5, stride=2),
        ]
        self.mv_g_s = [
            SubpelConv(self.N, r=2),
            SubpelConv(self.N, r=2),
            SubpelConv(MV_FEAT, r=2),
        ]
        self.mv_out = Conv(2, kernel=3, stride=1)
        self.mv_coder = _FourPartCoder(N=self.N)

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
        self.y_coder = _FourPartCoder(N=self.N)
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

    def _mv_feat(self, x, ref_mv_feature):
        """MV codec input: [scaled flow, propagated mv feature]."""
        if ref_mv_feature is None:
            B, H, W, _ = x.shape
            ref_mv_feature = jnp.zeros((B, H, W, MV_FEAT), x.dtype)
        return jnp.concatenate([x, ref_mv_feature], axis=-1)

    def code_mv(self, mv_scaled, ref_mv_feature, ref_mv_y, mode, rng, q=0.0):
        y = self._mv_feat(mv_scaled, ref_mv_feature)
        for i, l in enumerate(self.mv_g_a):
            y = l(y) if i == len(self.mv_g_a) - 1 else nn.leaky_relu(l(y))
        y_hat, lik = self.mv_coder(y, ref_mv_y, mode, rng, q=q)
        x = y_hat
        for i, l in enumerate(self.mv_g_s):
            x = nn.leaky_relu(l(x))
        mv = self.mv_out(x)
        return mv, x, y_hat, lik

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
        ref_frame, warped_f = sequenced(ref_frame, warped_f)  # order kernels
        warped_x = warp(ref_frame, mv_hat)
        ctx = jnp.concatenate([warped_f, warped_x, mv_hat], axis=-1)
        x = self.ctx_refine[0](ctx)
        for b in self.ctx_refine[1:]:
            x = b(x)
        return x, warped_x

    # --- conditional coding ---

    def code_frame(self, x, context, ref_y, mode, rng, q=0.0):
        y = jnp.concatenate([x, context], axis=-1)
        for l in self.g_a_layers:
            y = l(y)
        y_hat, lik = self.y_coder(y, ref_y, mode, rng, q=q)
        f = y_hat
        for l in self.g_s_layers:
            f = l(f)
        f = self.recon_head[0](jnp.concatenate([f, context], axis=-1))
        for b in self.recon_head[1:]:
            f = b(f)
        x_hat = self.to_rgb(f)
        return x_hat, f, y_hat, lik

    def __call__(self, x, dpb: dict, ratio: float = 1.0, mode: str = "ste",
                 rng=None, q=0.0):
        """Code one P-frame against the DPB.

        dpb: {"ref_frame": (B,H,W,3), "ref_feature": (B,H,W,feat) | None,
              "ref_mv_feature": (B,H,W,MV_FEAT) | None,
              "ref_y": latent | None, "ref_mv_y": latent | None,
              "ref_down_ratio": float} — the DCVC-FM DPB dict
        (OJSP2025/video_model.py:611-617); missing/None entries mean
        "first P-frame after intra".
        q: rate level (fractional allowed; gain-vector interpolation — the
        q_index analog of DCVC-FM).
        Returns dict with x_hat, bits, rate, and the updated dpb.
        """
        B, H, W, _ = x.shape
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        ref_frame = dpb["ref_frame"]
        est_mv = self.estimate_mv(x, ref_frame, ratio)

        # OJSP MV scaling: code est_mv / ratio, decode mv_hat * ratio.
        mv_hat, mv_feature, mv_y_hat, mv_lik = self.code_mv(
            est_mv / ratio, dpb.get("ref_mv_feature"), dpb.get("ref_mv_y"),
            mode, rngs[0], q=q,
        )
        mv_hat = mv_hat * ratio

        context, warped_x = self.motion_compensate(
            ref_frame, dpb.get("ref_feature"), mv_hat
        )
        x_hat, feature, y_hat, y_lik = self.code_frame(
            x, context, dpb.get("ref_y"), mode, rngs[1], q=q
        )

        bits_mv = sum(likelihood_to_bits(l) for l in mv_lik.values())
        bits_y = sum(likelihood_to_bits(l) for l in y_lik.values())
        bits = bits_mv + bits_y
        return {
            "x_hat": x_hat,
            "warped": warped_x,
            "bits": bits,
            "bits_mv": bits_mv,
            "bits_y": bits_y,
            "rate": bits / (B * H * W),
            "dpb": {
                "ref_frame": jnp.clip(x_hat, 0.0, 1.0),
                "ref_feature": feature,
                "ref_mv_feature": mv_feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
                "ref_down_ratio": ratio,
            },
        }

    def warp_prediction(self, x, ref_frame, ratio: float):
        """Warp-only prediction for the fractional-ratio search."""
        mv = self.estimate_mv(x, ref_frame, ratio)
        return warp(ref_frame, mv)

    def aux_loss(self):
        return self.mv_coder.aux_loss() + self.y_coder.aux_loss()

    # --- staged methods for the real-bitstream coder ---

    def mv_analysis(self, x, ref_frame, ref_mv_feature, ratio: float, q=0.0):
        """est_mv -> gained mv latent + hyper latent (encoder side)."""
        est_mv = self.estimate_mv(x, ref_frame, ratio)
        y = self._mv_feat(est_mv / ratio, ref_mv_feature)
        for i, l in enumerate(self.mv_g_a):
            y = l(y) if i == len(self.mv_g_a) - 1 else nn.leaky_relu(l(y))
        return self.mv_coder.hyper_analysis(y, q=q)

    def mv_fused_params(self, z_hat, ref_mv_y):
        return self.mv_coder.fused_params(z_hat, ref_mv_y)

    def mv_part_params(self, params0, y_hat, k: int):
        return self.mv_coder.part_params(params0, y_hat, k)

    def mv_synthesis(self, y_hat, ratio: float, q=0.0):
        """-> (mv_hat * ratio, mv_feature)."""
        x = self.mv_coder.apply_inv_gain(y_hat, q=q)
        for l in self.mv_g_s:
            x = nn.leaky_relu(l(x))
        return self.mv_out(x) * ratio, x

    def frame_analysis(self, x, context, q=0.0):
        y = jnp.concatenate([x, context], axis=-1)
        for l in self.g_a_layers:
            y = l(y)
        return self.y_coder.hyper_analysis(y, q=q)

    def frame_fused_params(self, z_hat, ref_y):
        return self.y_coder.fused_params(z_hat, ref_y)

    def frame_part_params(self, params0, y_hat, k: int):
        return self.y_coder.part_params(params0, y_hat, k)

    def frame_synthesis(self, y_hat, context, q=0.0):
        f = self.y_coder.apply_inv_gain(y_hat, q=q)
        for l in self.g_s_layers:
            f = l(f)
        f = self.recon_head[0](jnp.concatenate([f, context], axis=-1))
        for b in self.recon_head[1:]:
            f = b(f)
        return self.to_rgb(f), f


class PFrameDMCCoder:
    """Real-bitstream encode/decode for the P-frame DMC codec.

    Mirrors the reference's compress/decompress split
    (OJSP2025/video_model.py:402-528): transforms and entropy parameters on
    device, rANS symbol coding on host; the decoder reconstructs the motion-
    compensated context purely from the DPB and the coded MV, so the stream
    is self-contained given the reference frame. The fractional down-ratio
    and q level ride the PFrameBitstream header (the reference sends q_index
    and the ratio via its frame header the same way).

    Each latent's four parts decode sequentially (compress/decompress_
    four_part_prior, video_model.py:414-446, 477-489): part k's entropy
    parameters depend on parts < k, so the host coder and the device
    param graphs alternate four times per latent. Symbols ride squeezed
    (h/2, w/2, N) int16 tensors; bucket indexes uint8.
    """

    def __init__(self, model: PFrameDMC, variables):
        from tpuvc.entropy.bottleneck import FactorizedBottleneck, FactorizedTables

        self.model = model
        self.variables = variables
        self.laplace = LaplaceConditional()
        self.y_tables = self.laplace.build_tables()
        self.tables = {}
        for name in ("mv_coder", "y_coder"):
            eb = FactorizedBottleneck(channels=model.N)
            self.tables[name] = FactorizedTables.from_module(
                eb,
                {
                    "params": variables["params"][name][
                        "entropy_bottleneck"
                    ]
                },
            )
        m = model
        self._mv_analysis = {}
        from concurrent.futures import ThreadPoolExecutor

        # One worker: streams must finish in submission order anyway, and
        # the point is overlapping host rANS with the NEXT frame's device
        # work, not parallel host coding.
        self._pool = ThreadPoolExecutor(max_workers=1)
        laplace = self.laplace

        self._mv_fused = jax.jit(
            lambda v, z_hat, ctx: m.apply(
                v, z_hat, ctx, method=PFrameDMC.mv_fused_params
            )
        )
        self._frame_fused = jax.jit(
            lambda v, z_hat, ctx: m.apply(
                v, z_hat, ctx, method=PFrameDMC.frame_fused_params
            )
        )

        def _part(method, k):
            # Shared enc/dec graph per part: squeezed (q_step, means,
            # uint8 rANS bucket indexes). Encoder and decoder MUST run the
            # same compiled program here — XLA guarantees bit-identical
            # floats only per program, and the decoder re-derives these
            # exact values to stay in sync with the encoder's symbols.
            def fn(v, params0, y_hat):
                q_step, scales, means = m.apply(
                    v, params0, y_hat, k, method=method
                )
                return (
                    part_squeeze(q_step, k),
                    part_squeeze(means, k),
                    part_squeeze(
                        laplace.build_indexes(scales), k
                    ).astype(jnp.uint8),
                )

            return jax.jit(fn)

        self._mv_part = [
            _part(PFrameDMC.mv_part_params, k) for k in range(4)
        ]
        self._frame_part = [
            _part(PFrameDMC.frame_part_params, k) for k in range(4)
        ]

        self._mv_synthesis = jax.jit(
            lambda v, y_hat, ratio, q: m.apply(
                v, y_hat, ratio, q, method=PFrameDMC.mv_synthesis
            ),
            static_argnums=(2,),
        )
        self._compensate = jax.jit(
            lambda v, ref, feat, mv: m.apply(
                v, ref, feat, mv, method=PFrameDMC.motion_compensate
            )
        )
        self._frame_analysis = jax.jit(
            lambda v, x, ctx, q: m.apply(
                v, x, ctx, q, method=PFrameDMC.frame_analysis
            )
        )
        self._frame_synthesis = jax.jit(
            lambda v, y_hat, ctx, q: m.apply(
                v, y_hat, ctx, q, method=PFrameDMC.frame_synthesis
            )
        )

    # --- per-latent four-part coding -----------------------------------

    def _enc_four_part(self, y, params0, parts):
        """Encoder: sequential part coding with on-device squeezed
        symbols. Returns (y_hat, [(sym, idx)] * 4). The glue between the
        shared part graphs (rounding, scatter) is exact elementwise math,
        safe outside jit."""
        y_hat = jnp.zeros_like(y)
        out = []
        for k in range(4):
            q_step, means, idx = parts[k](self.variables, params0, y_hat)
            y_sq = part_squeeze(y, k)
            sym = quantize((y_sq - means) * q_step, "symbols16")
            vals = sym.astype(jnp.float32) / q_step + means
            y_hat = part_scatter(y_hat, vals, k)
            out.append((sym, idx))
        return y_hat, out

    def _dec_four_part(self, shape, params0, parts, streams):
        """Decoder: four sequential host rANS reads, each conditioned on
        the parts already reconstructed."""
        import numpy as np

        from tpuvc.coder import decode_with_indexes

        y_hat = jnp.zeros(shape, jnp.float32)
        for k in range(4):
            q_step, means, idx_dev = parts[k](self.variables, params0, y_hat)
            idx = np.asarray(idx_dev)
            sym = decode_with_indexes(
                streams[k], idx, self.y_tables.cdfs,
                self.y_tables.cdf_lengths, self.y_tables.offsets,
            ).reshape(idx.shape).astype(np.int16)
            vals = jnp.asarray(sym).astype(jnp.float32) / q_step + means
            y_hat = part_scatter(y_hat, vals, k)
        return y_hat

    def _decode_z(self, name, string, z_shape, batch=1):
        import numpy as np

        from tpuvc.coder import decode_with_indexes

        t = self.tables[name]
        zh, zw = z_shape
        zc = self.model.N
        z_idx = np.broadcast_to(
            np.arange(zc, dtype=np.int32), (batch, zh, zw, zc)
        )
        z_sym = decode_with_indexes(
            string, z_idx, t.cdfs, t.cdf_lengths, t.offsets
        ).reshape(batch, zh, zw, zc).astype(np.int16)
        return jnp.asarray(z_sym).astype(jnp.float32) + jnp.asarray(
            t.medians
        )

    def _enc_transforms(self, x, dpb, ratio, q):
        """Encode-side device chain with ON-DEVICE symbol quantization.

        Deliberately composed from the SAME jitted pieces the decoder runs
        (_mv_fused/_mv_part, _mv_synthesis, _compensate, _frame_fused/
        _frame_part, _frame_synthesis): entropy parameters must be
        bit-identical between encoder and decoder or the rANS bucket
        indexes desync, and XLA guarantees determinism only per compiled
        program. The glue between the shared jits (symbol rounding, mean
        addition, part scatter) is exact elementwise arithmetic, safe to
        run eagerly.

        No host fetch anywhere in the chain, so the new DPB is available
        immediately and host rANS runs entirely after the fact
        (encode_async overlaps it with the next frame's transforms).
        """
        m = self.model
        if ratio not in self._mv_analysis:
            self._mv_analysis[ratio] = jax.jit(
                lambda v, x, ref, mvf, q, r=ratio: m.apply(
                    v, x, ref, mvf, r, q, method=PFrameDMC.mv_analysis
                )
            )
        med_mv = jnp.asarray(self.tables["mv_coder"].medians)
        med_z = jnp.asarray(self.tables["y_coder"].medians)

        ref = dpb["ref_frame"]
        mv_y, mv_z = self._mv_analysis[ratio](
            self.variables, x, ref, dpb.get("ref_mv_feature"), q
        )
        mv_z_sym = quantize(mv_z, "symbols16", means=med_mv)
        mv_z_hat = mv_z_sym.astype(jnp.float32) + med_mv
        mv_params0 = self._mv_fused(
            self.variables, mv_z_hat, dpb.get("ref_mv_y")
        )
        mv_y_hat, mv_parts = self._enc_four_part(
            mv_y, mv_params0, self._mv_part
        )
        mv_hat, mv_feature = self._mv_synthesis(
            self.variables, mv_y_hat, ratio, q
        )
        context, _ = self._compensate(
            self.variables, ref, dpb.get("ref_feature"), mv_hat
        )
        y, z = self._frame_analysis(self.variables, x, context, q)
        z_sym = quantize(z, "symbols16", means=med_z)
        z_hat = z_sym.astype(jnp.float32) + med_z
        params0 = self._frame_fused(self.variables, z_hat, dpb.get("ref_y"))
        y_hat, y_parts = self._enc_four_part(y, params0, self._frame_part)
        x_hat, feature = self._frame_synthesis(
            self.variables, y_hat, context, q
        )
        return {
            "mv_z_sym": mv_z_sym,
            "mv_parts": mv_parts,
            "z_sym": z_sym,
            "y_parts": y_parts,
            "x_hat": jnp.clip(x_hat, 0.0, 1.0),
            "feature": feature,
            "mv_feature": mv_feature,
            "mv_y_hat": mv_y_hat,
            "y_hat": y_hat,
        }

    def _pack_streams(self, out, ratio, q, z_shape):
        """Host side of encode: fetch symbols/indexes, rANS to bytes.

        Stream order: mv parts 0-3, mv z, y parts 0-3, z (the reference
        writes mv before y the same way, video_model.py:432-443)."""
        import numpy as np

        from tpuvc.coder import encode_with_indexes
        from tpuvc.coder.container import PFrameBitstream

        def pack_parts(parts):
            return [
                encode_with_indexes(
                    np.asarray(sym_dev), np.asarray(idx_dev),
                    self.y_tables.cdfs, self.y_tables.cdf_lengths,
                    self.y_tables.offsets,
                )
                for sym_dev, idx_dev in parts
            ]

        def pack_z(name, key):
            sym = np.asarray(out[key])
            idx = np.broadcast_to(
                np.arange(sym.shape[-1], dtype=np.int32), sym.shape
            )
            t = self.tables[name]
            return encode_with_indexes(
                sym, idx, t.cdfs, t.cdf_lengths, t.offsets
            )

        streams = (
            pack_parts(out["mv_parts"])
            + [pack_z("mv_coder", "mv_z_sym")]
            + pack_parts(out["y_parts"])
            + [pack_z("y_coder", "z_sym")]
        )
        return PFrameBitstream(
            q_milli=int(round(q * 1000)),
            ratio_centi=int(round(ratio * 100)),
            z_shape=z_shape,
            streams=streams,
        )

    def encode_async(self, x, dpb: dict, ratio: float = 1.0, q: float = 0.0):
        """Dispatch the device chain and return (bits_future, new_dpb)
        immediately: the DPB feeds the next frame without waiting for the
        host rANS, which runs on a worker thread and overlaps the next
        frame's device transforms (SURVEY.md 7.2 step 9)."""
        out = self._enc_transforms(x, dpb, ratio, q)
        new_dpb = {
            "ref_frame": out["x_hat"],
            "ref_feature": out["feature"],
            "ref_mv_feature": out["mv_feature"],
            "ref_y": out["y_hat"],
            "ref_mv_y": out["mv_y_hat"],
            "ref_down_ratio": ratio,
        }
        z_shape = tuple(int(v) for v in out["mv_z_sym"].shape[1:3])
        fut = self._pool.submit(self._pack_streams, out, ratio, q, z_shape)
        return fut, new_dpb

    def encode(self, x, dpb: dict, ratio: float = 1.0, q: float = 0.0):
        """Code one P-frame; returns (PFrameBitstream, new_dpb)."""
        fut, new_dpb = self.encode_async(x, dpb, ratio, q)
        return fut.result(), new_dpb

    def decode(self, dpb: dict, bits):
        """Decode one P-frame from the stream; returns (x_hat, new_dpb).
        Single-frame view of ``decode_sequence`` (same compiled programs,
        same order within each chain — one definition, no drift)."""
        xs, new_dpb = self.decode_sequence(dpb, [bits])
        return xs[0], new_dpb

    def decode_sequence(self, dpb: dict, bits_list):
        """Pipelined low-delay decode of a whole P-frame chain.

        The per-frame ``decode`` serializes ~12 host<->device round trips
        (2 z reads + 2 latents x 4 sequential part decodes, each a ~30 ms
        relay ping) with the device tail, so the chain runs at relay
        latency, not compute. But the two expensive chains are DECOUPLED
        (OJSP2025/video_model.py:477-528 has the same structure): frame
        k's MV-latent decode needs only frame k-1's ``mv_y_hat`` (the
        temporal prior), and its frame-latent decode only k-1's ``y_hat``
        — neither needs k-1's reconstruction. Only the device-only join
        (compensate + synthesis, no host round trips) needs ``x_hat``
        (k-1). So the MV chain, the frame-latent chain, and the synthesis
        chain run on three workers with one-frame skew: every host fetch
        overlaps the other chains' device work, and the relay pings of
        the two entropy chains overlap each other.

        Returns (x_hat_list, final_dpb) — bit-identical to folding
        ``decode`` frame by frame (same compiled programs, same inputs,
        in the same order within each chain).
        """
        from concurrent.futures import ThreadPoolExecutor

        mv_pool = ThreadPoolExecutor(max_workers=1)
        y_pool = ThreadPoolExecutor(max_workers=1)
        try:
            batch = dpb["ref_frame"].shape[0]

            def mv_stage(bits, ref_mv_y):
                if isinstance(ref_mv_y, _FutureField):
                    ref_mv_y = ref_mv_y.resolve()
                q = bits.q_milli / 1000.0
                ratio = bits.ratio_centi / 100.0
                zh, zw = bits.z_shape
                y_shape = (batch, zh * 4, zw * 4, self.model.N)
                mv_z_hat = self._decode_z(
                    "mv_coder", bits.streams[4], bits.z_shape, batch
                )
                mv_params0 = self._mv_fused(
                    self.variables, mv_z_hat, ref_mv_y
                )
                mv_y_hat = self._dec_four_part(
                    y_shape, mv_params0, self._mv_part, bits.streams[0:4]
                )
                mv_hat, mv_feature = self._mv_synthesis(
                    self.variables, mv_y_hat, ratio, q
                )
                return mv_y_hat, mv_hat, mv_feature

            def y_stage(bits, ref_y):
                if isinstance(ref_y, _FutureField):
                    ref_y = ref_y.resolve()
                zh, zw = bits.z_shape
                y_shape = (batch, zh * 4, zw * 4, self.model.N)
                z_hat = self._decode_z(
                    "y_coder", bits.streams[9], bits.z_shape, batch
                )
                params0 = self._frame_fused(self.variables, z_hat, ref_y)
                return self._dec_four_part(
                    y_shape, params0, self._frame_part, bits.streams[5:9]
                )

            # Seed chains from the DPB, then each chain advances on its
            # OWN previous output; device values flow between threads as
            # jax arrays (dispatch is thread-safe, data deps via arrays).
            mv_futs, y_futs = [], []
            prev_mv_y = dpb.get("ref_mv_y")
            prev_y = dpb.get("ref_y")
            for bits in bits_list:
                f_mv = mv_pool.submit(mv_stage, bits, prev_mv_y)
                mv_futs.append(f_mv)
                prev_mv_y = _FutureField(f_mv, 0)
                f_y = y_pool.submit(y_stage, bits, prev_y)
                y_futs.append(f_y)
                prev_y = _FutureField(f_y, None)

            xs = []
            cur = dpb
            for bits, f_mv, f_y in zip(bits_list, mv_futs, y_futs):
                q = bits.q_milli / 1000.0
                ratio = bits.ratio_centi / 100.0
                mv_y_hat, mv_hat, mv_feature = f_mv.result()
                context, _ = self._compensate(
                    self.variables, cur["ref_frame"],
                    cur.get("ref_feature"), mv_hat,
                )
                y_hat = f_y.result()
                x_hat, feature = self._frame_synthesis(
                    self.variables, y_hat, context, q
                )
                cur = {
                    "ref_frame": jnp.clip(x_hat, 0.0, 1.0),
                    "ref_feature": feature,
                    "ref_mv_feature": mv_feature,
                    "ref_y": y_hat,
                    "ref_mv_y": mv_y_hat,
                    "ref_down_ratio": ratio,
                }
                xs.append(x_hat)
            return xs, cur
        finally:
            mv_pool.shutdown(wait=False)
            y_pool.shutdown(wait=False)


class _FutureField:
    """Lazy view of one element of a future's result, resolved inside the
    consuming chain's own worker (keeps cross-chain handoff non-blocking
    on the submitting thread)."""

    def __init__(self, fut, index):
        self._fut = fut
        self._index = index

    def resolve(self):
        r = self._fut.result()
        return r if self._index is None else r[self._index]
