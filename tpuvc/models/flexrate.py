"""Flex-Rate codec (ICIP'22): one model, many rates via gain units.

TPU-native rebuild of /root/reference/Flex-Rate-Hier-Bidir-Video-Compression:
  - Gain_Module (b_model/layers.py:40-73, M8): learned per-level per-channel
    latent scaling with exponential interpolation between adjacent levels
    |g_n|^l * |g_{n+1}|^(1-l); separate forward/inverse and hyper instances.
  - FlowCompressor (layers.py:76-189, M9): gained mean-scale hyperprior over
    a 19-channel motion context, emitting a 4-channel flow *refinement*
    (zero-initialized final conv).
  - ResidualCompressor (layers.py:192-305, M10): same with 3 channels.
  - BidirFlowRef (b_model/b_model.py:21-96, M7/M11): UNet flow prediction
    between the references, linear-motion projection to t=0.5, coded flow
    refinement, warping, 2-channel softmask blend, coded residual.

Deliberate behavioral fixes (documented per SURVEY.md 7.4):
  - The reference's ``FlowCompressor.compress`` feeds the *ungained* y to the
    Gaussian coder (layers.py:167) while forward codes the gained y; we code
    the gained latent in both paths so streams match the training RD.
  - The reference's stream-path ``decompress`` clamps flow refinements and
    residuals to [0, 1] (layers.py:177, 305) even though both are signed;
    we do not clamp (the forward/likelihood path that produced the published
    RD numbers never clamps either).
  - Warps use border padding at exact pixel offsets rather than the
    reference's zero-padding half-pixel-shifted grid (b_model.py:99-112);
    the learned refinement absorbs the convention change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from tpuvc.entropy.emath import likelihood_to_bits
from tpuvc.models.hyperprior import MeanScaleHyperprior
from tpuvc.models.unet import UNet
from tpuvc.ops.warp import sequenced, warp


class GainModule(nn.Module):
    """Per-level, per-channel latent gain with fractional-level interpolation."""

    n_levels: int = 6
    channels: int = 128

    @nn.compact
    def __call__(self, x, n, l=1.0):
        gain_matrix = self.param(
            "gain_matrix",
            lambda rng, shape: jnp.ones(shape, jnp.float32),
            (self.n_levels, self.channels),
        )
        n = jnp.asarray(n, jnp.int32)
        l = jnp.asarray(l, x.dtype)
        g1 = jnp.abs(gain_matrix[n])
        g2 = jnp.abs(gain_matrix[jnp.clip(n + 1, 0, self.n_levels - 1)])
        gain = g1**l * g2 ** (1.0 - l)
        # gain: (C,) for scalar n, or (B, C) for per-sample n.
        if gain.ndim == 1:
            return x * gain
        return x * gain[:, None, None, :]


class GainedHyperprior(MeanScaleHyperprior):
    """Mean-scale hyperprior with forward/inverse gain units on y and z."""

    n_levels: int = 6

    def setup(self):
        super().setup()
        mk = lambda: GainModule(n_levels=self.n_levels, channels=self.N)
        self.gain_unit = mk()
        self.inv_gain_unit = mk()
        self.hyper_gain_unit = mk()
        self.hyper_inv_gain_unit = mk()

    def gained_analysis(self, x, n, l=1.0):
        y = self.g_a(x)
        scaled_y = self.gain_unit(y, n, l)
        z = self.h_a(scaled_y)
        scaled_z = self.hyper_gain_unit(z, n, l)
        return scaled_y, scaled_z

    def gained_entropy_params(self, z_hat, n, l=1.0):
        scaled_z_hat = self.hyper_inv_gain_unit(z_hat, n, l)
        return self.entropy_params(scaled_z_hat)

    def gained_synthesis(self, y_hat, n, l=1.0):
        return self.g_s(self.inv_gain_unit(y_hat, n, l))

    def __call__(self, x, n, l=1.0, mode: str = "noise", rng=None):
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        scaled_y, scaled_z = self.gained_analysis(x, n, l)
        z_hat, z_lik = self.entropy_bottleneck(scaled_z, mode, rng=rngs[0])
        scales, means = self.gained_entropy_params(z_hat, n, l)
        y_hat, y_lik = self.gaussian(
            scaled_y, scales, means=means, mode=mode, rng=rngs[1]
        )
        x_hat = self.gained_synthesis(y_hat, n, l)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lik, "z": z_lik}}


class FlexFlowCompressor(GainedHyperprior):
    """19ch motion context in, 4ch flow refinement out, zero-init output."""

    out_channels: int = 4
    zero_init_out: bool = True


class FlexResidualCompressor(GainedHyperprior):
    out_channels: int = 3


def _per_sample_bits(likelihoods: jnp.ndarray) -> jnp.ndarray:
    from tpuvc.entropy.emath import LIKELIHOOD_BOUND, lower_bound

    p = lower_bound(likelihoods, LIKELIHOOD_BOUND)
    return jnp.sum(jnp.log(p), axis=(1, 2, 3)) / (-np.log(2.0))


class BidirFlowRef(nn.Module):
    """Flex-Rate B-frame codec with flow prediction + coded refinement."""

    n_levels: int = 6
    N: int = 128

    def setup(self):
        self.flow_predictor = UNet(out_channels=4, depth=5, wf=5)
        self.mask = UNet(out_channels=2, depth=4, wf=5)
        self.flow_compressor = FlexFlowCompressor(
            N=self.N, n_levels=self.n_levels
        )
        self.residual_compressor = FlexResidualCompressor(
            N=self.N, n_levels=self.n_levels
        )

    def process(self, x0, x1, t: float = 0.5):
        """Predict bidirectional flow and project to time t (b_model.py:35-45).

        All warps in this family use compat='flexrate': the reference's
        backwarp (b_model.py:99-112) normalizes the grid for
        align_corners=True but calls grid_sample with the DEFAULT
        align_corners=False and zeros padding, so it effectively samples at
        (x+u-0.5, y+v-0.5) with out-of-frame taps reading 0. Reference
        checkpoints are trained against that behavior; reproducing it is
        required for import parity (found by tests/test_reference_parity.py,
        round 4)."""
        x = jnp.concatenate([x0, x1], axis=-1)
        flow = self.flow_predictor(x)
        flow_0_1, flow_1_0 = flow[..., :2], flow[..., 2:4]
        flow_t_0 = -(1 - t) * t * flow_0_1 + t * t * flow_1_0
        flow_t_1 = (1 - t) * (1 - t) * flow_0_1 - t * (1 - t) * flow_1_0
        xt1 = warp(x0, flow_t_0, compat="flexrate")
        x1, xt1 = sequenced(x1, xt1)  # order the two warp kernels
        xt2 = warp(x1, flow_t_1, compat="flexrate")
        context = jnp.concatenate([flow_t_0, flow_t_1, x, xt1, xt2], axis=-1)
        return flow_t_0, flow_t_1, context

    def compensate(self, x_before, x_after, mv_before, mv_after):
        """Warp both refs and blend with the 2-channel softmask."""
        x_b = warp(x_before, mv_before, compat="flexrate")
        x_after, x_b = sequenced(x_after, x_b)  # order the two warp kernels
        x_a = warp(x_after, mv_after, compat="flexrate")
        ctx = jnp.concatenate(
            [mv_before, mv_after, x_before, x_after, x_b, x_a], axis=-1
        )
        m = nn.sigmoid(self.mask(ctx))
        w1 = 0.5 * m[..., 0:1]
        w2 = 0.5 * m[..., 1:2]
        return (w1 * x_b + w2 * x_a) / (w1 + w2 + 1e-8)

    def __call__(self, x_before, x_current, x_after, n, l=1.0,
                 mode: str = "noise", rng=None):
        num_pixels = x_current.shape[1] * x_current.shape[2]
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

        mv_before, mv_after, context = self.process(x_before, x_after)
        x_input = jnp.concatenate([context, x_current], axis=-1)
        flow_out = self.flow_compressor(x_input, n, l, mode=mode, rng=rngs[0])
        flow_hat = flow_out["x_hat"]
        mv_before_refined = mv_before + flow_hat[..., :2]
        mv_after_refined = mv_after + flow_hat[..., 2:4]

        x_comp = self.compensate(
            x_before, x_after, mv_before_refined, mv_after_refined
        )
        residual = x_current - x_comp
        res_out = self.residual_compressor(residual, n, l, mode=mode, rng=rngs[1])
        x_hat = x_comp + res_out["x_hat"]

        # Per-sample bit accounting (b_model.py:84-94: sum over CHW only).
        size = sum(
            _per_sample_bits(lk) for lk in flow_out["likelihoods"].values()
        ) + sum(_per_sample_bits(lk) for lk in res_out["likelihoods"].values())
        return {
            "x_hat": x_hat,
            "x_comp": x_comp,
            "size": size,
            "rate": size / num_pixels,
        }

    def aux_loss(self):
        return (
            self.flow_compressor.aux_loss()
            + self.residual_compressor.aux_loss()
        )


class GainedHyperpriorCoder:
    """Real-bitstream path for a GainedHyperprior at a given (n, l).

    Mirrors Flex-Rate.../b_model/layers.py:153-189 compress/decompress with
    the gain fix described in the module docstring.
    """

    def __init__(self, module: GainedHyperprior, variables):
        from tpuvc.entropy.bottleneck import FactorizedBottleneck, FactorizedTables
        from tpuvc.entropy.gaussian import GaussianConditional

        self.module = module
        self.variables = variables
        # Optional mesh-sharding rule for level-batched coding — see
        # HyperpriorCoder.shard (same contract).
        self.shard = None
        eb = FactorizedBottleneck(channels=module.N)
        self.z_tables = FactorizedTables.from_module(
            eb, {"params": variables["params"]["entropy_bottleneck"]}
        )
        self.gaussian = GaussianConditional()
        self.y_tables = self.gaussian.build_tables()
        from tpuvc.entropy.quant import quantize

        gaussian = self.gaussian

        def params_idx(v, z_hat, n, l):
            # Shared enc/dec graph: entropy params + uint8 rANS indexes
            # folded together (see HyperpriorCoder — one fewer graph load
            # and a uint8 fetch on both sides).
            scales, means = module.apply(
                v, z_hat, n, l, method=GainedHyperprior.gained_entropy_params
            )
            return means, gaussian.build_indexes(scales).astype(jnp.uint8)

        def analyze_quantized(v, x, n, l):
            # Encoder-only fused front: gained analysis + z quantization.
            y, z = module.apply(
                v, x, n, l, method=GainedHyperprior.gained_analysis
            )
            med = jnp.asarray(self.z_tables.medians)
            z_sym = quantize(z, "symbols16", means=med)
            return y, z_sym, z_sym.astype(jnp.float32) + med

        self._analysis = jax.jit(
            lambda v, x, n, l: module.apply(
                v, x, n, l, method=GainedHyperprior.gained_analysis
            )
        )
        self._analyze_quantized = jax.jit(analyze_quantized)
        self._params_idx = jax.jit(params_idx)
        self._synthesis = jax.jit(
            lambda v, y, n, l: module.apply(
                v, y, n, l, method=GainedHyperprior.gained_synthesis
            )
        )

    def compress(self, x, n: int, l: float = 1.0) -> dict:
        return self.compress_from(
            *self._analyze_quantized(self.variables, x, n, l), n, l
        )

    def compress_from(self, scaled_y, z_sym_dev, z_hat, n: int,
                      l: float = 1.0) -> dict:
        """Host half of compress from a precomputed analysis triple (lets
        callers fuse the gained analysis into a larger encoder graph)."""
        from tpuvc.coder import encode_with_indexes
        from tpuvc.entropy.quant import quantize

        z_sym = np.asarray(z_sym_dev)
        z_idx = np.broadcast_to(
            np.arange(z_sym.shape[-1], dtype=np.int32), z_sym.shape
        )
        z_string = encode_with_indexes(
            z_sym, z_idx, self.z_tables.cdfs, self.z_tables.cdf_lengths,
            self.z_tables.offsets,
        )
        means, y_idx_dev = self._params_idx(self.variables, z_hat, n, l)
        y_idx = np.asarray(y_idx_dev)
        y_sym_dev = quantize(scaled_y, "symbols16", means=means)
        y_sym = np.asarray(y_sym_dev)
        y_string = encode_with_indexes(
            y_sym, y_idx, self.y_tables.cdfs, self.y_tables.cdf_lengths,
            self.y_tables.offsets,
        )
        return {
            "strings": [y_string, z_string],
            "shape": tuple(z_sym.shape[1:3]),
            "y_hat": y_sym_dev.astype(jnp.float32) + means,
        }

    def synthesize(self, y_hat, n: int, l: float = 1.0):
        """Decoded output from the quantized gained latent."""
        if self.shard is not None:
            y_hat = self.shard(y_hat)
        return self._synthesis(self.variables, y_hat, n, l)

    def compress_batch(self, x, n: int, l: float = 1.0) -> dict:
        """Batched compress with per-sample streams (level-batched coding;
        see HyperpriorCoder.compress_batch — decoder must replay the same
        B-shaped graphs)."""
        return self.compress_batch_from(
            *self._analyze_quantized(self.variables, x, n, l), n, l
        )

    def compress_batch_async(self, scaled_y, z_sym_dev, z_hat, n: int,
                             l: float = 1.0) -> dict:
        """Device phase dispatched now; symbol fetches + per-sample rANS
        packing deferred to a worker thread (same contract as
        HyperpriorCoder.compress_batch_async)."""
        from tpuvc.entropy.quant import quantize

        if self.shard is not None:
            z_hat = self.shard(z_hat)
        means, y_idx_dev = self._params_idx(self.variables, z_hat, n, l)
        y_sym_dev = quantize(scaled_y, "symbols16", means=means)

        def host_phase():
            from tpuvc.coder import encode_with_indexes
            from tpuvc.coder.parallel import parallel_map

            z_sym = np.asarray(z_sym_dev)
            z_idx = np.broadcast_to(
                np.arange(z_sym.shape[-1], dtype=np.int32), z_sym.shape[1:]
            )
            y_idx = np.asarray(y_idx_dev)
            y_sym = np.asarray(y_sym_dev)

            def pack(b):
                z_str = encode_with_indexes(
                    z_sym[b], z_idx, self.z_tables.cdfs,
                    self.z_tables.cdf_lengths, self.z_tables.offsets,
                )
                y_str = encode_with_indexes(
                    y_sym[b], y_idx[b], self.y_tables.cdfs,
                    self.y_tables.cdf_lengths, self.y_tables.offsets,
                )
                return (y_str, z_str)

            return parallel_map(pack, range(z_sym.shape[0]))

        from tpuvc.coder.parallel import async_pool

        return {
            "strings_future": async_pool().submit(host_phase),
            "shape": tuple(z_sym_dev.shape[1:3]),
            "y_hat": y_sym_dev.astype(jnp.float32) + means,
        }

    def compress_batch_from(self, scaled_y, z_sym_dev, z_hat, n: int,
                            l: float = 1.0) -> dict:
        """Host half of compress_batch from a precomputed analysis triple;
        blocking variant of compress_batch_async."""
        out = self.compress_batch_async(scaled_y, z_sym_dev, z_hat, n, l)
        out["strings"] = out.pop("strings_future").result()
        return out

    def decompress_batch(self, strings: list, shape, n: int, l: float = 1.0):
        """Inverse of compress_batch; returns the quantized gained latent
        y_hat (B, ...) — callers run gained_synthesis at batch B."""
        from tpuvc.coder import decode_with_indexes

        from tpuvc.coder.parallel import parallel_map

        zh, zw = shape
        zc = self.module.N
        z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32), (zh, zw, zc))
        z_sym = np.stack(
            parallel_map(
                lambda s: decode_with_indexes(
                    s[1], z_idx, self.z_tables.cdfs,
                    self.z_tables.cdf_lengths, self.z_tables.offsets,
                ).reshape(zh, zw, zc).astype(np.int16),
                strings,
            )
        )
        z_hat = jnp.asarray(z_sym).astype(jnp.float32) + jnp.asarray(
            self.z_tables.medians
        )
        if self.shard is not None:
            z_hat = self.shard(z_hat)
        means, y_idx_dev = self._params_idx(self.variables, z_hat, n, l)
        y_idx = np.asarray(y_idx_dev)
        y_sym = np.stack(
            parallel_map(
                lambda bs: decode_with_indexes(
                    bs[1][0], y_idx[bs[0]], self.y_tables.cdfs,
                    self.y_tables.cdf_lengths, self.y_tables.offsets,
                ).reshape(y_idx.shape[1:]).astype(np.int16),
                enumerate(strings),
            )
        )
        return jnp.asarray(y_sym).astype(jnp.float32) + means

    def decompress_batch_async(self, strings: list, shape, n: int,
                               l: float = 1.0):
        """decompress_batch on a worker thread -> Future[y_hat]; see
        HyperpriorCoder.decompress_batch_async (the gained entropy decode
        is equally reference-independent)."""
        from tpuvc.coder.parallel import async_pool

        return async_pool().submit(self.decompress_batch, strings, shape, n, l)

    def decompress(self, strings, shape, n: int, l: float = 1.0, batch: int = 1):
        from tpuvc.coder import decode_with_indexes

        y_string, z_string = strings
        zh, zw = shape
        zc = self.module.N
        z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32), (batch, zh, zw, zc))
        z_sym = decode_with_indexes(
            z_string, z_idx, self.z_tables.cdfs, self.z_tables.cdf_lengths,
            self.z_tables.offsets,
        ).reshape(batch, zh, zw, zc)
        z_hat = jnp.asarray(z_sym, jnp.float32) + jnp.asarray(self.z_tables.medians)
        means, y_idx_dev = self._params_idx(self.variables, z_hat, n, l)
        y_idx = np.asarray(y_idx_dev)
        y_sym = decode_with_indexes(
            y_string, y_idx, self.y_tables.cdfs, self.y_tables.cdf_lengths,
            self.y_tables.offsets,
        ).reshape(y_idx.shape)
        y_hat = jnp.asarray(y_sym, jnp.float32) + means
        return self._synthesis(self.variables, y_hat, n, l)


class FlexRateCoder:
    """Real-bitstream encode/decode for the Flex-Rate B-frame codec at (n, l).

    Mirrors Flex-Rate.../test/encode_B.py / decode_B.py: the decoder re-runs
    flow prediction on the reconstructed references, decodes the refinement,
    compensates, and adds the decoded residual.
    """

    def __init__(self, model: BidirFlowRef, variables):
        self.model = model
        self.variables = variables
        self.shard = None  # see set_shard
        params = variables["params"]
        self.flow_coder = GainedHyperpriorCoder(
            FlexFlowCompressor(N=model.N, n_levels=model.n_levels),
            {"params": params["flow_compressor"]},
        )
        self.res_coder = GainedHyperpriorCoder(
            FlexResidualCompressor(N=model.N, n_levels=model.n_levels),
            {"params": params["residual_compressor"]},
        )
        self._process = jax.jit(
            lambda v, x0, x1: model.apply(v, x0, x1, method=BidirFlowRef.process)
        )
        self._compensate = jax.jit(
            lambda v, xb, xa, mvb, mva: model.apply(
                v, xb, xa, mvb, mva, method=BidirFlowRef.compensate
            )
        )

        # Encoder-only fused fronts (see LHBDCCoder): flow prediction +
        # 19ch conditioning concat + gained MV analysis in one graph;
        # residual formation + gained residual analysis in another. The
        # decoder-shared graphs (_process, _params_idx, _synthesis,
        # _compensate) stay standalone so enc/dec remain bit-identical.
        from tpuvc.entropy.quant import quantize

        def _flow_front_m(m, context, xc, n, l):
            x_input = jnp.concatenate([context, xc], axis=-1)
            return m.flow_compressor.gained_analysis(x_input, n, l)

        def flow_front(v, context, xc, n, l):
            # ``context`` comes from the standalone ``_process`` graph (the
            # decoder-shared program), computed ONCE per chunk by the
            # caller and reused for both the MV analysis here and the
            # compensation — the encoder previously ran the UNet flow
            # prediction twice per chunk (fused here + standalone in
            # _predict_batch).
            y, z = model.apply(v, context, xc, n, l, method=_flow_front_m)
            med = jnp.asarray(self.flow_coder.z_tables.medians)
            z_sym = quantize(z, "symbols16", means=med)
            return y, z_sym, z_sym.astype(jnp.float32) + med

        def _res_front_m(m, xc, x_comp, n, l):
            return m.residual_compressor.gained_analysis(xc - x_comp, n, l)

        def res_front(v, xc, x_comp, n, l):
            y, z = model.apply(v, xc, x_comp, n, l, method=_res_front_m)
            med = jnp.asarray(self.res_coder.z_tables.medians)
            z_sym = quantize(z, "symbols16", means=med)
            return y, z_sym, z_sym.astype(jnp.float32) + med

        self._flow_front = jax.jit(flow_front)
        self._res_front = jax.jit(res_front)

    def set_shard(self, shard):
        """Enable mesh-sharded level-batched coding (see
        LHBDCCoder.set_shard — same contract, recorded in the stream
        header as VSequenceBitstream.mesh)."""
        self.shard = shard
        self.flow_coder.shard = shard
        self.res_coder.shard = shard

    def _predict(self, x_before, x_after, mv_strings, mv_shape, n, l,
                 process=None):
        mv_before, mv_after, _ = (
            process if process is not None
            else self._process(self.variables, x_before, x_after)
        )
        flow_hat = self.flow_coder.decompress(mv_strings, mv_shape, n, l)
        return self._compensate(
            self.variables,
            x_before,
            x_after,
            mv_before + flow_hat[..., :2],
            mv_after + flow_hat[..., 2:4],
        )

    def encode(self, x_before, x_current, x_after, n: int, l: float = 1.0):
        # rate_id packs (n, round(l * 1000)) like the reference packs lambda.
        return self.encode_recon(x_before, x_current, x_after, n, l)[0]

    def encode_recon(self, x_before, x_current, x_after, n: int,
                     l: float = 1.0):
        """Encode + decoder-identical reconstruction in one pass (see
        LHBDCCoder.encode_recon)."""
        from tpuvc.coder.container import BFrameBitstream

        process = self._process(self.variables, x_before, x_after)
        mv = self.flow_coder.compress_from(
            *self._flow_front(
                self.variables, process[2], x_current, n, l
            ),
            n, l,
        )
        x_comp = self._predict(
            x_before, x_after, mv["strings"], mv["shape"], n, l,
            process=process,
        )
        res = self.res_coder.compress_from(
            *self._res_front(self.variables, x_current, x_comp, n, l), n, l
        )
        rate_id = n * 100000 + int(round(l * 1000))
        bits = BFrameBitstream(
            rate_id=rate_id,
            mv_shape=tuple(mv["shape"]),
            res_shape=tuple(res["shape"]),
            mv_y=mv["strings"][0],
            mv_z=mv["strings"][1],
            res_y=res["strings"][0],
            res_z=res["strings"][1],
        )
        x_hat = x_comp + self.res_coder.synthesize(res["y_hat"], n, l)
        return bits, x_hat

    def _predict_batch(self, x_before, x_after, flow_y_hat, n, l,
                       process=None):
        """Shared enc/dec batched prediction (same B-shaped graphs on both
        sides — see LHBDCCoder._predict_batch). ``process``: optional
        precomputed standalone ``_process`` output; the encoder reuses its
        own call bit-identically (same compiled program the decoder runs
        here), halving the UNet flow-prediction cost per encode chunk."""
        mv_before, mv_after, _ = (
            process if process is not None
            else self._process(self.variables, x_before, x_after)
        )
        flow_hat = self.flow_coder.synthesize(flow_y_hat, n, l)
        return self._compensate(
            self.variables, x_before, x_after,
            mv_before + flow_hat[..., :2], mv_after + flow_hat[..., 2:4],
        )

    def encode_level_batch_async(self, x_before, x_current, x_after,
                                 n: int, l: float = 1.0):
        """Batched real coding of one hierarchy level with deferred host
        phases (see LHBDCCoder.encode_level_batch_async). Returns
        (resolve -> [BFrameBitstream]*B, x_hat)."""
        from tpuvc.coder.container import BFrameBitstream

        if self.shard is not None:
            x_before, x_current, x_after = self.shard(
                (x_before, x_current, x_after)
            )
        process = self._process(self.variables, x_before, x_after)
        mv = self.flow_coder.compress_batch_async(
            *self._flow_front(
                self.variables, process[2], x_current, n, l
            ),
            n, l,
        )
        x_comp = self._predict_batch(
            x_before, x_after, mv["y_hat"], n, l, process=process
        )
        res = self.res_coder.compress_batch_async(
            *self._res_front(self.variables, x_current, x_comp, n, l), n, l
        )
        x_hat = x_comp + self.res_coder.synthesize(res["y_hat"], n, l)
        rate_id = n * 100000 + int(round(l * 1000))
        batch = x_current.shape[0]
        # capture only futures + shapes — NOT the mv/res dicts (HBM; see
        # LHBDCCoder.encode_level_batch_async)
        mv_fut, res_fut = mv["strings_future"], res["strings_future"]
        mv_shape, res_shape = tuple(mv["shape"]), tuple(res["shape"])

        def resolve():
            mv_strings = mv_fut.result()
            res_strings = res_fut.result()
            return [
                BFrameBitstream(
                    rate_id=rate_id,
                    mv_shape=mv_shape,
                    res_shape=res_shape,
                    mv_y=mv_strings[b][0],
                    mv_z=mv_strings[b][1],
                    res_y=res_strings[b][0],
                    res_z=res_strings[b][1],
                )
                for b in range(batch)
            ]

        return resolve, x_hat

    def encode_level_batch(self, x_before, x_current, x_after, n: int,
                           l: float = 1.0):
        """Batched real coding of one hierarchy level (see
        LHBDCCoder.encode_level_batch); blocking variant of
        encode_level_batch_async."""
        resolve, x_hat = self.encode_level_batch_async(
            x_before, x_current, x_after, n, l
        )
        return resolve(), x_hat

    def decode_level_batch_async(self, bitstreams):
        """One level's entropy decode submitted NOW, ref-dependent device
        tail deferred to ``resolve(x_before, x_after)`` — see
        LHBDCCoder.decode_level_batch_async."""
        n, l = self.parse_rate_id(bitstreams[0].rate_id)
        flow_f = self.flow_coder.decompress_batch_async(
            [(b.mv_y, b.mv_z) for b in bitstreams],
            bitstreams[0].mv_shape, n, l,
        )
        res_f = self.res_coder.decompress_batch_async(
            [(b.res_y, b.res_z) for b in bitstreams],
            bitstreams[0].res_shape, n, l,
        )

        def resolve(x_before, x_after):
            if self.shard is not None:
                x_before, x_after = self.shard((x_before, x_after))
            x_comp = self._predict_batch(
                x_before, x_after, flow_f.result(), n, l
            )
            return x_comp + self.res_coder.synthesize(res_f.result(), n, l)

        return resolve

    def decode_level_batch(self, x_before, x_after, bitstreams):
        return self.decode_level_batch_async(bitstreams)(x_before, x_after)

    @staticmethod
    def parse_rate_id(rate_id: int) -> tuple[int, float]:
        return rate_id // 100000, (rate_id % 100000) / 1000.0

    def decode(self, x_before, x_after, bitstream):
        n, l = self.parse_rate_id(bitstream.rate_id)
        x_comp = self._predict(
            x_before, x_after, [bitstream.mv_y, bitstream.mv_z],
            bitstream.mv_shape, n, l,
        )
        res_hat = self.res_coder.decompress(
            [bitstream.res_y, bitstream.res_z], bitstream.res_shape, n, l
        )
        return x_comp + res_hat
