"""Conditional gained ELIC bottlenecks (Offset_ELIC / Res_ELIC).

TPU-native rebuild of /root/reference/ICIP2024/src/model/
compression_bottlenecks.py:72-551 (E4; the ICIP2023 offset_res_elic.py
versions share the structure with noise-quantized training):

  - multi-scale conditional analysis: g_a1..3 fold the /2,/4,/8 conditioning
    pyramids into a latent at /16 of the frame;
  - 4 gain vectors (Gain/InverseGain/HyperGain/InverseHyperGain) with
    fractional-level geometric interpolation (``interpolate_gain``,
    compression_bottlenecks.py:290-310) — implemented as one traced formula
    (upper==lower degenerates to the pure level) so the rate level s can be
    a traced scalar: one compiled graph serves all levels;
  - hyper prior fused with a temporal condition (``prior_fusion``);
  - ELIC-style checkerboard + channel context over uneven groups
    (6, 6, 12, 24, M-48); context inputs are STE-rounded, likelihoods use
    the caller's quantization mode (noise in v3 training, STE in v4);
  - interleaved synthesis: g_s3 -> [cond3] -> g_o3 (head at /8),
    g_s2 -> [cond2] -> g_o2 (/4), g_s1 -> [cond1] -> g_o1 (/2), emitting
    per-scale offsets (Offset_ELIC) or feature residues (Res_ELIC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from tpuvc.entropy.bottleneck import FactorizedBottleneck
from tpuvc.entropy.gaussian import GaussianConditional
from tpuvc.entropy.quant import quantize, ste_round
from tpuvc.models.layers import Conv, Deconv, ResidualBottleneckBlock
from tpuvc.ops.checkerboard import CheckerboardConv, keep_anchor, keep_non_anchor


class _ConvRBB(nn.Module):
    features: int
    kernel: int = 5
    stride: int = 2
    blocks: int = 3

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, kernel=self.kernel, stride=self.stride)(x)
        for _ in range(self.blocks):
            x = ResidualBottleneckBlock(self.features)(x)
        return x


class _SynthStage(nn.Module):
    """conv1x1 -> 3 RBB -> deconv x2 (g_s2/g_s1 stages)."""

    features: int
    first_kernel: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, kernel=self.first_kernel, stride=1)(x)
        for _ in range(3):
            x = ResidualBottleneckBlock(self.features)(x)
        return Deconv(self.features, kernel=5, stride=2)(x)


class _Head(nn.Module):
    """conv3x3 -> 3 RBB -> conv3x3 to head channels (g_o stages).

    ``zero_init`` zeroes the final conv so the head starts at 0 — used for
    the offset flavor, where heads parameterize deformable sampling
    positions: zero offsets at init mean alignment starts at the flow (v4)
    or the identity (v3), the standard deformable-alignment practice
    (BasicVSR++-style; cf. the reference's own zero-init of the flexrate
    refinement synthesis, Flex-Rate…/b_model/layers.py:125-126). Trained
    offsets are small; random-init O(1) offsets are both unstable to train
    through and worst-case for the spread-adaptive TPU sampling kernel.
    """

    features: int
    out_channels: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, kernel=3, stride=1)(x)
        for _ in range(3):
            x = ResidualBottleneckBlock(self.features)(x)
        return Conv(
            self.out_channels, kernel=3, stride=1, zero_init=self.zero_init
        )(x)


class _EntropyParams(nn.Module):
    M: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = Conv(self.M * 10 // 3, kernel=1)(x)
        x = nn.leaky_relu(x)
        x = Conv(self.M * 8 // 3, kernel=1)(x)
        x = nn.leaky_relu(x)
        return Conv(self.out_channels, kernel=1)(x)


class _ChannelContext(nn.Module):
    N: int
    M: int

    @nn.compact
    def __call__(self, x):
        x = Conv(self.N, kernel=5, stride=1)(x)
        x = nn.relu(x)
        x = Conv(self.N, kernel=5, stride=1)(x)
        x = nn.relu(x)
        return Conv(self.M * 2, kernel=5, stride=1)(x)


class CondELIC(nn.Module):
    """Shared implementation; ``head_channels`` selects Offset vs Res flavor.

    head_channels: outputs of (g_o1, g_o2, g_o3) — per-scale heads at
    /2, /4, /8. Offset_ELIC: (432, 432, 432); Res_ELIC: (64, 96, 128).
    """

    head_channels: tuple[int, int, int]
    N: int = 128
    M: int = 128
    levels: int = 5
    groups: tuple[int, ...] = (6, 6, 12, 24, 80)
    #: v3 Res_ELIC only: extra pixel-level analysis stage over the raw frame
    #: (ICIP2023/src/model/offset_res_elic.py:322-328, g_a0).
    pixel_stage: bool = False
    #: context quantization: True = STE (v4, compression_bottlenecks.py:238,
    #: 257); False = same mode as the likelihoods (v3 noise-quantized
    #: training, offset_res_elic.py:346-348).
    ctx_ste: bool = True
    #: zero-init the final conv of each g_o head (offset flavor — see _Head)
    zero_head_init: bool = False

    def setup(self):
        N, M = self.N, self.M
        assert sum(self.groups) == M
        if self.pixel_stage:
            self.g_a0 = _ConvRBB(N)
        self.g_a1 = _ConvRBB(N)
        self.g_a2 = _ConvRBB(N)
        self.g_a3 = _ConvRBB(M)

        self.g_s3_blocks = [ResidualBottleneckBlock(M) for _ in range(3)]
        self.g_s3_up = Deconv(N, kernel=5, stride=2)
        zi = self.zero_head_init
        self.g_o3 = _Head(N, self.head_channels[2], zero_init=zi)
        self.g_s2 = _SynthStage(N)
        self.g_o2 = _Head(N, self.head_channels[1], zero_init=zi)
        self.g_s1 = _SynthStage(N)
        self.g_o1 = _Head(N, self.head_channels[0], zero_init=zi)

        self.h_a1 = Conv(N, kernel=3, stride=1)
        self.h_a2 = Conv(N, kernel=5, stride=2)
        self.h_a3 = Conv(N, kernel=5, stride=2)
        self.h_s1 = Deconv(M, kernel=5, stride=2)
        self.h_s2 = Deconv(M, kernel=5, stride=2)
        self.h_s3 = Conv(M, kernel=3, stride=1)
        self.prior_fusion_in = Conv(2 * M, kernel=3, stride=1)
        self.prior_fusion_blocks = [
            ResidualBottleneckBlock(2 * M) for _ in range(3)
        ]
        self.prior_fusion_out = Conv(2 * M, kernel=3, stride=1)

        self.entropy_parameters = [
            _EntropyParams(M=M, out_channels=2 * g) for g in self.groups
        ]
        self.channel_context_models = [
            _ChannelContext(N=N, M=M) for _ in self.groups[1:]
        ]
        self.context_prediction_models = [
            CheckerboardConv(M * 2, kernel=5) for _ in self.groups
        ]

        ones = lambda rng, shape: jnp.ones(shape, jnp.float32)
        self.Gain = self.param("Gain", ones, (self.levels, M))
        self.InverseGain = self.param("InverseGain", ones, (self.levels, M))
        self.HyperGain = self.param("HyperGain", ones, (self.levels, N))
        self.InverseHyperGain = self.param(
            "InverseHyperGain", ones, (self.levels, N)
        )

        self.entropy_bottleneck = FactorizedBottleneck(channels=N)
        self.gaussian = GaussianConditional()

    def interpolate_gain(self, s):
        """Fractional-level geometric interpolation of all 4 gain vectors.

        One formula handles integer and fractional s (upper == lower makes
        the exponents collapse), so s can be traced.
        """
        s = jnp.clip(jnp.asarray(s, jnp.float32), 0.0, self.levels - 1.0)
        upper = jnp.clip(jnp.ceil(s), 0, self.levels - 1).astype(jnp.int32)
        lower = jnp.clip(jnp.floor(s), 0, self.levels - 1).astype(jnp.int32)
        l = upper.astype(jnp.float32) - s

        def interp(g):
            return jnp.abs(g[upper]) ** (1.0 - l) * jnp.abs(g[lower]) ** l

        return (
            interp(self.Gain),
            interp(self.HyperGain),
            interp(self.InverseHyperGain),
            interp(self.InverseGain),
        )

    def analysis(self, c1, c2, c3, s, x_pixel=None):
        """Conditional analysis -> gained (y, z)."""
        gain, hypergain, _, _ = self.interpolate_gain(s)
        if self.pixel_stage:
            y = self.g_a0(x_pixel)
            y = self.g_a1(jnp.concatenate([y, c1], axis=-1))
        else:
            y = self.g_a1(c1)
        y = self.g_a2(jnp.concatenate([y, c2], axis=-1))
        y = self.g_a3(jnp.concatenate([y, c3], axis=-1))
        y = y * gain
        z = self.h_a3(nn.relu(self.h_a2(nn.relu(self.h_a1(y)))))
        z = z * hypergain
        return y, z

    def hyper_params(self, z_hat, temporal_cond, s):
        """h_s on inverse-gained z_hat, fused with the temporal condition."""
        _, _, invhypergain, _ = self.interpolate_gain(s)
        z_hat = z_hat * invhypergain
        h = self.h_s3(nn.relu(self.h_s2(nn.relu(self.h_s1(z_hat)))))
        x = self.prior_fusion_in(
            jnp.concatenate([h, temporal_cond], axis=-1)
        )
        for blk in self.prior_fusion_blocks:
            x = blk(x)
        return self.prior_fusion_out(x)

    def group_params(self, i: int, hyper_params, prev_groups_hat, y_anchor_hat):
        ctx = keep_non_anchor(self.context_prediction_models[i](y_anchor_hat))
        if i == 0:
            inp = jnp.concatenate([ctx, hyper_params], axis=-1)
        else:
            channel_ctx = self.channel_context_models[i - 1](prev_groups_hat)
            inp = jnp.concatenate([ctx, channel_ctx, hyper_params], axis=-1)
        params = self.entropy_parameters[i](inp)
        scales, means = jnp.split(params, 2, axis=-1)
        return scales, means

    def synthesis(self, y_hat, cond1, cond2, cond3, s):
        """Interleaved synthesis -> per-scale head outputs (out1, out2, out3)."""
        _, _, _, invgain = self.interpolate_gain(s)
        y_hat = y_hat * invgain
        x = y_hat
        for blk in self.g_s3_blocks:
            x = blk(x)
        xhat3 = self.g_s3_up(x)
        inp3 = jnp.concatenate([xhat3, cond3], axis=-1)
        out3 = self.g_o3(inp3)
        xhat2 = self.g_s2(inp3)
        inp2 = jnp.concatenate([xhat2, cond2], axis=-1)
        out2 = self.g_o2(inp2)
        xhat1 = self.g_s1(inp2)
        inp1 = jnp.concatenate([xhat1, cond1], axis=-1)
        out1 = self.g_o1(inp1)
        return out1, out2, out3

    def __call__(
        self,
        inputs: tuple,
        conds: tuple,
        temporal_cond,
        s,
        mode: str = "ste",
        rng=None,
        x_pixel=None,
    ):
        """Full pass.

        inputs: (i1, i2, i3) analysis inputs per scale (include the current
          frame's features). conds: (c1, c2, c3) decoder-side conditioning
          (reference features only). mode: 'ste' (v4), 'noise' (v3 training),
          'dequantize' (eval). x_pixel: raw frame for ``pixel_stage``.
        """
        y, z = self.analysis(*inputs, s, x_pixel=x_pixel)
        likelihoods = {}
        lik_mode = "noise" if mode == "noise" else "dequantize"
        _, z_lik = self.entropy_bottleneck(
            z, lik_mode, rng=None if rng is None else jax.random.fold_in(rng, 0)
        )
        likelihoods["z"] = z_lik
        z_hat = ste_round(z)
        hyper = self.hyper_params(z_hat, temporal_cond, s)

        groups = []
        start = 0
        for g in self.groups:
            groups.append(y[..., start : start + g])
            start += g

        def ctx_quant(v, key):
            if self.ctx_ste:
                return ste_round(v)
            r = None if rng is None else jax.random.fold_in(rng, key)
            return quantize(v, lik_mode, rng=r)

        for i, curr_y in enumerate(groups):
            y_half = keep_anchor(ctx_quant(curr_y, 100 + i))
            prev = (
                ctx_quant(jnp.concatenate(groups[:i], axis=-1), 200 + i)
                if i > 0
                else None
            )
            scales, means = self.group_params(i, hyper, prev, y_half)
            r = None if rng is None else jax.random.fold_in(rng, i + 1)
            _, y_lik = self.gaussian(
                curr_y, scales, means=means, mode=lik_mode, rng=r
            )
            likelihoods[f"y_{i}"] = y_lik

        y_hat = ste_round(y)
        out1, out2, out3 = self.synthesis(y_hat, *conds, s)
        return {
            "out1": out1,
            "out2": out2,
            "out3": out3,
            "likelihoods": likelihoods,
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class CondELICCoder:
    """Real-bitstream compress/decompress for a CondELIC bottleneck.

    Beyond the reference (which evaluates the v3/v4 inter bottlenecks from
    likelihoods only; no compress() exists in compression_bottlenecks.py):
    the same two-phase checkerboard group coding as tpuvc's ELICCoder,
    with gains and the temporal-prior fusion in the loop. z is coded in the
    gained domain around the factorized-prior medians; y groups are coded
    around their conditional means, so encoder and decoder reconstruct
    identical latents from the streams plus decoder-side conditioning.
    """

    def __init__(self, module: CondELIC, variables):
        from tpuvc.entropy.bottleneck import FactorizedTables

        self.module = module
        self.variables = variables
        # Optional mesh-sharding rule for level-batched coding (set by the
        # family coders' set_shard from parallel.level_batch_sharder):
        # applied to the inputs of every SHARED enc/dec graph (_hyper,
        # _group_params, _synthesis) so both sides compile the same
        # partitioned program — input sharding is part of program identity,
        # and the decoder's re-derived entropy parameters must be
        # bit-identical to the encoder's (cf. HyperpriorCoder.shard).
        self.shard = None
        eb = FactorizedBottleneck(channels=module.N)
        self.z_tables = FactorizedTables.from_module(
            eb, {"params": variables["params"]["entropy_bottleneck"]}
        )
        self.gaussian = GaussianConditional()
        self.y_tables = self.gaussian.build_tables()

        self._analysis = jax.jit(
            lambda v, c1, c2, c3, s, xp: module.apply(
                v, c1, c2, c3, s, xp, method=CondELIC.analysis
            ),
        )
        self._hyper = jax.jit(
            lambda v, z, t, s: module.apply(
                v, z, t, s, method=CondELIC.hyper_params
            )
        )
        self._synthesis = jax.jit(
            lambda v, y, c1, c2, c3, s: module.apply(
                v, y, c1, c2, c3, s, method=CondELIC.synthesis
            )
        )
        self._group_params = {
            i: jax.jit(
                lambda v, h, prev, ya, i=i: module.apply(
                    v, i, h, prev, ya, method=CondELIC.group_params
                )
            )
            for i in range(len(module.groups))
        }

    def _code_group(self, i, curr_y, hyper, prev, streams=None,
                    per_sample=False, submit=False):
        """Two-phase checkerboard coding of group i at batch B.

        per_sample=False: one stream per phase covering the whole batch
        (the single-frame coder's layout). per_sample=True: one stream per
        (phase, sample) — level-batched sequence coding, where each frame
        must stay independently decodable; ``streams`` is then a pair of
        per-sample string lists.
        """
        from tpuvc.coder import decode_with_indexes, encode_with_indexes
        from tpuvc.coder.parallel import parallel_map
        from tpuvc.entropy.quant import quantize
        from tpuvc.ops.checkerboard import anchor_mask

        b, h, w = hyper.shape[0], hyper.shape[1], hyper.shape[2]
        gsize = self.module.groups[i]
        if self.shard is not None:
            hyper, prev = self.shard((hyper, prev))
        amask = np.asarray(anchor_mask(h, w)).astype(bool)
        ai, aj = np.nonzero(amask)
        ni, nj = np.nonzero(~amask)

        def enc(sym, idx):
            if not per_sample:
                return encode_with_indexes(
                    sym, idx, self.y_tables.cdfs, self.y_tables.cdf_lengths,
                    self.y_tables.offsets,
                )
            return parallel_map(
                lambda j: encode_with_indexes(
                    sym[j], idx[j], self.y_tables.cdfs,
                    self.y_tables.cdf_lengths, self.y_tables.offsets,
                ),
                range(b),
            )

        def dec(strs, idx):
            if not per_sample:
                return decode_with_indexes(
                    strs, idx, self.y_tables.cdfs, self.y_tables.cdf_lengths,
                    self.y_tables.offsets,
                ).reshape(idx.shape)
            return np.stack(
                parallel_map(
                    lambda j: decode_with_indexes(
                        strs[j], idx[j], self.y_tables.cdfs,
                        self.y_tables.cdf_lengths, self.y_tables.offsets,
                    ).reshape(idx.shape[1:]),
                    range(b),
                )
            )

        # Only int16 symbols and uint8 indexes cross the host boundary;
        # the partial reconstruction assembles on device (see
        # ELICCoder._code_group — streams stay byte-identical).
        def phase(prev_hat, idxs, stream):
            pi, pj = idxs
            if self.shard is not None:
                # prev_hat mixes sharded graph outputs with host-decoded
                # symbol uploads (default placement) on BOTH sides; pin it
                # so encoder and decoder compile one partitioned program.
                prev_hat = self.shard(prev_hat)
            scales, means = self._group_params[i](
                self.variables, hyper, prev, prev_hat
            )
            idx_dev = (
                self.gaussian.build_indexes(scales)[:, pi, pj]
                .astype(jnp.uint8)
            )
            if stream is None:
                # Encode: the device chain continues from the DEVICE
                # quantized symbols (int16 -> f32 is exact, so vals is
                # bit-identical to the decoder's host-symbol upload); the
                # D2H fetches + rANS packing either run inline or are
                # deferred to a worker (submit=True), which lets the next
                # phase/group's entropy params overlap the transfers.
                sym_dev = quantize(curr_y, "symbols16", means=means)[
                    :, pi, pj
                ]

                def host_job(sym_dev=sym_dev, idx_dev=idx_dev):
                    return enc(np.asarray(sym_dev), np.asarray(idx_dev))

                if submit:
                    from tpuvc.coder.parallel import async_pool

                    out = async_pool().submit(host_job)
                else:
                    out = host_job()
                vals = sym_dev.astype(jnp.float32) + means[:, pi, pj]
            else:
                sym = dec(stream, np.asarray(idx_dev)).astype(np.int16)
                out = stream
                vals = jnp.asarray(sym).astype(jnp.float32) + means[:, pi, pj]
            return vals, out

        zeros = jnp.zeros((b, h, w, gsize), jnp.float32)
        vals_a, str_a = phase(
            zeros, (ai, aj), None if streams is None else streams[0]
        )
        anchor_hat = zeros.at[:, ai, aj].set(vals_a)
        vals_n, str_n = phase(
            anchor_hat, (ni, nj), None if streams is None else streams[1]
        )
        y_hat = anchor_hat.at[:, ni, nj].set(vals_n)
        return y_hat, [str_a, str_n]

    def _code_z(self, z, z_string=None, z_shape=None, batch=1):
        from tpuvc.coder import decode_with_indexes, encode_with_indexes
        from tpuvc.entropy.quant import quantize

        zc = self.module.N
        med = jnp.asarray(self.z_tables.medians)
        if z_string is None:
            z_sym = np.asarray(quantize(z, "symbols", means=med))
            z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32), z_sym.shape)
            z_string = encode_with_indexes(
                z_sym, z_idx, self.z_tables.cdfs, self.z_tables.cdf_lengths,
                self.z_tables.offsets,
            )
            shape = z.shape[1:3]
        else:
            zh, zw = z_shape
            z_idx = np.broadcast_to(
                np.arange(zc, dtype=np.int32), (batch, zh, zw, zc)
            )
            z_sym = decode_with_indexes(
                z_string, z_idx, self.z_tables.cdfs,
                self.z_tables.cdf_lengths, self.z_tables.offsets,
            ).reshape(batch, zh, zw, zc)
            shape = z_shape
        z_hat = jnp.asarray(z_sym, jnp.float32) + med
        if self.shard is not None:
            z_hat = self.shard(z_hat)
        return z_hat, z_string, shape

    def compress(self, inputs, conds, temporal_cond, s, x_pixel=None):
        """-> {streams: [z, a0, n0, a1, n1, ...], z_shape, outs}."""
        y, z = self._analysis(self.variables, *inputs, s, x_pixel)
        z_hat, z_string, z_shape = self._code_z(z)
        hyper = self._hyper(self.variables, z_hat, temporal_cond, s)
        streams = [z_string]
        groups_hat = []
        start = 0
        for i, g in enumerate(self.module.groups):
            curr_y = y[..., start : start + g]
            start += g
            prev = (
                jnp.concatenate(groups_hat, axis=-1)
                if i > 0
                else jnp.zeros(hyper.shape[:3] + (0,), jnp.float32)
            )
            g_hat, strs = self._code_group(i, curr_y, hyper, prev)
            groups_hat.append(g_hat)
            streams.extend(strs)
        y_hat = jnp.concatenate(groups_hat, axis=-1)
        if self.shard is not None:
            y_hat = self.shard(y_hat)
        out1, out2, out3 = self._synthesis(self.variables, y_hat, *conds, s)
        return {
            "streams": streams,
            "z_shape": tuple(z_shape),
            "outs": (out1, out2, out3),
        }

    def compress_batch_async(self, inputs, conds, temporal_cond, s,
                             x_pixel=None):
        """Batched compress with PER-SAMPLE stream lists and DEFERRED host
        phases: every device graph (analysis, hyper, the 5-group x 2-phase
        entropy params, synthesis) is dispatched without blocking on a
        single D2H fetch; symbol fetches + per-(group, phase) rANS packing
        run on worker threads. The device chain feeds on device-quantized
        symbols (bit-identical to the decoder's uploads — int16 -> f32 is
        exact), so streams are unchanged; call ``streams_resolve()`` to
        materialize the per-frame [z, a0, n0, a1, n1, ...] lists
        (VERDICT r2 task #4: encode-side transfer hiding).

        -> {"streams_resolve": callable, "z_shape", "outs"}.
        """
        from tpuvc.coder import encode_with_indexes
        from tpuvc.coder.parallel import async_pool, parallel_map
        from tpuvc.entropy.quant import quantize

        y, z = self._analysis(self.variables, *inputs, s, x_pixel)
        b = z.shape[0]
        zc = self.module.N
        med = jnp.asarray(self.z_tables.medians)
        z_sym_dev = quantize(z, "symbols16", means=med)

        def z_job():
            z_sym = np.asarray(z_sym_dev)
            z_idx = np.broadcast_to(
                np.arange(zc, dtype=np.int32), z_sym.shape[1:]
            )
            return parallel_map(
                lambda j: encode_with_indexes(
                    z_sym[j], z_idx, self.z_tables.cdfs,
                    self.z_tables.cdf_lengths, self.z_tables.offsets,
                ),
                range(b),
            )

        z_fut = async_pool().submit(z_job)
        z_hat = z_sym_dev.astype(jnp.float32) + med
        if self.shard is not None:
            z_hat = self.shard(z_hat)
        hyper = self._hyper(self.variables, z_hat, temporal_cond, s)

        group_futs = []
        groups_hat = []
        start = 0
        for i, g in enumerate(self.module.groups):
            curr_y = y[..., start : start + g]
            start += g
            prev = (
                jnp.concatenate(groups_hat, axis=-1)
                if i > 0
                else jnp.zeros(hyper.shape[:3] + (0,), jnp.float32)
            )
            g_hat, (a_fut, n_fut) = self._code_group(
                i, curr_y, hyper, prev, per_sample=True, submit=True
            )
            groups_hat.append(g_hat)
            group_futs.append((a_fut, n_fut))
        y_hat = jnp.concatenate(groups_hat, axis=-1)
        if self.shard is not None:
            y_hat = self.shard(y_hat)
        out1, out2, out3 = self._synthesis(self.variables, y_hat, *conds, s)

        def streams_resolve():
            per_frame = [[zs] for zs in z_fut.result()]
            for a_fut, n_fut in group_futs:
                a_strs, n_strs = a_fut.result(), n_fut.result()
                for j in range(b):
                    per_frame[j].extend([a_strs[j], n_strs[j]])
            return per_frame

        return {
            "streams_resolve": streams_resolve,
            "z_shape": tuple(z.shape[1:3]),
            "outs": (out1, out2, out3),
        }

    def compress_batch(self, inputs, conds, temporal_cond, s, x_pixel=None):
        """Batched compress with PER-SAMPLE stream lists: device
        transforms and group params run once at batch B (the decoder
        replays the same B-shaped graphs — VSequenceBitstream mode=1);
        each frame gets its own [z, a0, n0, a1, n1, ...] stream list in
        the single-frame layout, so VFrameBitstream works unchanged.
        Blocking variant of compress_batch_async.

        -> {"streams": [per-frame list] * B, "z_shape", "outs"}.
        """
        out = self.compress_batch_async(
            inputs, conds, temporal_cond, s, x_pixel
        )
        out["streams"] = out.pop("streams_resolve")()
        return out

    def decompress_batch(self, per_frame_streams, z_shape, conds,
                         temporal_cond, s):
        """Inverse of compress_batch: per-frame stream lists in, batched
        synthesis out (same B-shaped graphs as the encoder)."""
        from tpuvc.coder import decode_with_indexes

        b = len(per_frame_streams)
        zh, zw = z_shape
        zc = self.module.N
        z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32), (zh, zw, zc))
        from tpuvc.coder.parallel import parallel_map

        z_sym = np.stack(
            parallel_map(
                lambda frame: decode_with_indexes(
                    frame[0], z_idx, self.z_tables.cdfs,
                    self.z_tables.cdf_lengths, self.z_tables.offsets,
                ).reshape(zh, zw, zc),
                per_frame_streams,
            )
        )
        z_hat = jnp.asarray(z_sym, jnp.float32) + jnp.asarray(
            self.z_tables.medians
        )
        if self.shard is not None:
            z_hat = self.shard(z_hat)
        hyper = self._hyper(self.variables, z_hat, temporal_cond, s)
        groups_hat = []
        for i in range(len(self.module.groups)):
            prev = (
                jnp.concatenate(groups_hat, axis=-1)
                if i > 0
                else jnp.zeros(hyper.shape[:3] + (0,), jnp.float32)
            )
            a_strs = [f[1 + 2 * i] for f in per_frame_streams]
            n_strs = [f[2 + 2 * i] for f in per_frame_streams]
            g_hat, _ = self._code_group(
                i, None, hyper, prev, streams=[a_strs, n_strs],
                per_sample=True,
            )
            groups_hat.append(g_hat)
        y_hat = jnp.concatenate(groups_hat, axis=-1)
        if self.shard is not None:
            y_hat = self.shard(y_hat)
        return self._synthesis(self.variables, y_hat, *conds, s)

    def decompress(self, streams, z_shape, conds, temporal_cond, s, batch=1):
        z_hat, _, _ = self._code_z(
            None, z_string=streams[0], z_shape=z_shape, batch=batch
        )
        hyper = self._hyper(self.variables, z_hat, temporal_cond, s)
        groups_hat = []
        for i in range(len(self.module.groups)):
            prev = (
                jnp.concatenate(groups_hat, axis=-1)
                if i > 0
                else jnp.zeros(hyper.shape[:3] + (0,), jnp.float32)
            )
            g_hat, _ = self._code_group(
                i, None, hyper, prev,
                streams=[streams[1 + 2 * i], streams[2 + 2 * i]],
            )
            groups_hat.append(g_hat)
        y_hat = jnp.concatenate(groups_hat, axis=-1)
        if self.shard is not None:
            y_hat = self.shard(y_hat)
        return self._synthesis(self.variables, y_hat, *conds, s)


def OffsetELIC(N: int = 128, M: int = 128, levels: int = 5, **kw) -> CondELIC:
    """Offset bottleneck: heads emit 27*8*2 = 432 deform params per scale."""
    kw.setdefault("zero_head_init", True)
    return CondELIC(
        head_channels=(432, 432, 432), N=N, M=M, levels=levels, **kw
    )


def ResELIC(
    N: int = 128,
    M: int = 128,
    levels: int = 5,
    feature_channels: tuple[int, int, int] = (64, 96, 128),
    **kw,
) -> CondELIC:
    """Residual bottleneck: heads emit feature residues per scale."""
    return CondELIC(
        head_channels=feature_channels, N=N, M=M, levels=levels, **kw
    )
