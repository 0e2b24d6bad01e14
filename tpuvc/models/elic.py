"""ELIC intra (I-frame) codec: checkerboard + uneven channel-group context.

TPU-native rebuild of /root/reference/ICIP2023/src/model/elic.py:87-595 (E3;
the ICIP2024 copy is identical): N=192, M=320 transforms with attention,
uneven channel groups (16, 16, 32, 64, 192), and per-group entropy modeling
from [checkerboard spatial context | channel context from previous groups |
hyper prior].

TPU design notes:
  - The five groups are a true sequential dependency (channel context), kept
    as an unrolled loop of five phases; within each phase everything is dense
    NHWC convs on the MXU, and the checkerboard masking is elementwise (fused
    by XLA). No host sync inside the likelihood path.
  - The real coder runs the same phases but hands anchor / non-anchor symbol
    sets to the host rANS separately (two byte strings per group instead of
    the reference's single flush; self-consistent format, SURVEY.md 7.3.2).
  - z is STE-rounded in the likelihood path (reference forward) while the
    stream path rounds around the factorized-prior medians (reference
    compress); both sides of enc/dec agree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from tpuvc.entropy.bottleneck import FactorizedBottleneck
from tpuvc.entropy.emath import likelihood_to_bits
from tpuvc.entropy.gaussian import GaussianConditional
from tpuvc.entropy.quant import quantize, ste_round
from tpuvc.models.layers import (
    AttentionBlock,
    Conv,
    Deconv,
    ResidualBottleneckBlock,
)
from tpuvc.ops.checkerboard import (
    CheckerboardConv,
    anchor_mask,
    keep_anchor,
    keep_non_anchor,
)


class ELIC(nn.Module):
    N: int = 192
    M: int = 320
    groups: tuple[int, ...] = (16, 16, 32, 64, 192)

    def setup(self):
        N, M = self.N, self.M
        assert sum(self.groups) == M, (self.groups, M)

        def rbb3():
            return [ResidualBottleneckBlock(N) for _ in range(3)]

        self.g_a_layers = (
            [Conv(N, kernel=5, stride=2)] + rbb3()
            + [Conv(N, kernel=5, stride=2)] + rbb3()
            + [AttentionBlock(N), Conv(N, kernel=5, stride=2)] + rbb3()
            + [Conv(M, kernel=5, stride=2), AttentionBlock(M)]
        )
        self.g_s_layers = (
            [AttentionBlock(M), Deconv(N, kernel=5, stride=2)] + rbb3()
            + [Deconv(N, kernel=5, stride=2), AttentionBlock(N)] + rbb3()
            + [Deconv(N, kernel=5, stride=2)] + rbb3()
            + [Deconv(3, kernel=5, stride=2)]
        )
        self.h_a_layers = [
            Conv(N, kernel=3, stride=1),
            Conv(N, kernel=5, stride=2),
            Conv(N, kernel=5, stride=2),
        ]
        self.h_s_layers = [
            Deconv(M, kernel=5, stride=2),
            Deconv(M * 3 // 2, kernel=5, stride=2),
            Conv(M * 2, kernel=3, stride=1),
        ]
        self.entropy_parameters = [
            _EntropyParams(M=M, out_channels=2 * g) for g in self.groups
        ]
        self.channel_context_models = [
            _ChannelContext(N=N, M=M) for _ in self.groups[1:]
        ]
        self.context_prediction_models = [
            CheckerboardConv(M * 2, kernel=5) for _ in self.groups
        ]
        self.entropy_bottleneck = FactorizedBottleneck(channels=N)
        self.gaussian = GaussianConditional()

    # --- transforms ---

    def g_a(self, x):
        for l in self.g_a_layers:
            x = l(x)
        return x

    def g_s(self, y_hat):
        for l in self.g_s_layers:
            y_hat = l(y_hat)
        return y_hat

    def h_a(self, y):
        x = self.h_a_layers[0](y)
        x = nn.relu(x)
        x = self.h_a_layers[1](x)
        x = nn.relu(x)
        return self.h_a_layers[2](x)

    def h_s(self, z_hat):
        x = self.h_s_layers[0](z_hat)
        x = nn.relu(x)
        x = self.h_s_layers[1](x)
        x = nn.relu(x)
        return self.h_s_layers[2](x)

    def analysis(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        return y, z

    def hyper_params(self, z_hat):
        return self.h_s(z_hat)

    def _split_groups(self, y):
        out = []
        start = 0
        for g in self.groups:
            out.append(y[..., start : start + g])
            start += g
        return out

    def group_params(self, i: int, hyper_params, prev_groups_hat, y_anchor_hat):
        """Entropy params for group ``i``.

        ``y_anchor_hat``: group-i reconstruction with non-anchor cells zeroed
        (pass zeros for the anchor phase). ``prev_groups_hat``: concatenated
        reconstructions of groups < i (ignored for i == 0). Context params
        are zeroed at anchor positions so anchors see spatial context 0.
        """
        ctx = keep_non_anchor(
            self.context_prediction_models[i](y_anchor_hat)
        )
        if i == 0:
            inp = jnp.concatenate([ctx, hyper_params], axis=-1)
        else:
            channel_ctx = self.channel_context_models[i - 1](prev_groups_hat)
            inp = jnp.concatenate([ctx, channel_ctx, hyper_params], axis=-1)
        params = self.entropy_parameters[i](inp)
        scales, means = jnp.split(params, 2, axis=-1)
        return scales, means

    # --- differentiable forward ---

    def __call__(self, x, mode: str = "noise", rng=None, stage2: bool = False):
        """Single-pass forward with checkerboard approximation.

        Parity: elic.py:189-245 (forward) and elic.py:247-306
        (forward_stage2, ``stage2=True``: groups quantized around means and
        fed to g_s / channel context).
        """
        y, z = self.analysis(x)
        likelihoods = {}
        _, z_lik = self.entropy_bottleneck(
            z, mode, rng=None if rng is None else jax.random.fold_in(rng, 0)
        )
        likelihoods["z"] = z_lik
        z_hat = ste_round(z)
        hyper = self.hyper_params(z_hat)

        groups = self._split_groups(y)
        groups_hat = []  # quantized-around-0 (forward) or around-means (stage2)
        for i, curr_y in enumerate(groups):
            r_ctx = None if rng is None else jax.random.fold_in(rng, 2 * i + 1)
            r_lik = None if rng is None else jax.random.fold_in(rng, 2 * i + 2)
            curr_y_hat = quantize(curr_y, mode, rng=r_ctx)
            y_half = keep_anchor(curr_y_hat)
            prev = (
                jnp.concatenate(groups_hat, axis=-1) if i > 0 else None
            )
            scales, means = self.group_params(i, hyper, prev, y_half)
            _, y_lik = self.gaussian(
                curr_y, scales, means=means, mode=mode, rng=r_lik
            )
            likelihoods[f"y_{i}"] = y_lik
            if stage2:
                groups_hat.append(ste_round(curr_y - means) + means)
            else:
                groups_hat.append(curr_y_hat)

        y_hat = (
            jnp.concatenate(groups_hat, axis=-1) if stage2 else ste_round(y)
        )
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": likelihoods}

    def bits(self, likelihoods: dict) -> jnp.ndarray:
        return sum(likelihood_to_bits(l) for l in likelihoods.values())

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class _EntropyParams(nn.Module):
    """1x1 param head: in -> M*10/3 -> M*8/3 -> out (elic.py:146-161)."""

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
    """5x5 conv stack over previous groups -> M*2 (elic.py:163-177)."""

    N: int
    M: int

    @nn.compact
    def __call__(self, x):
        x = Conv(self.N, kernel=5, stride=1)(x)
        x = nn.relu(x)
        x = Conv(self.N, kernel=5, stride=1)(x)
        x = nn.relu(x)
        return Conv(self.M * 2, kernel=5, stride=1)(x)


class ELICCoder:
    """Real-bitstream compress/decompress for ELIC.

    Follows elic.py:308-595: z via factorized coder; per group, anchors coded
    with zero spatial context, then non-anchors with checkerboard context
    from the decoded anchors. Channel context always consumes *decoded*
    groups, so encoder and decoder see identical context.
    """

    def __init__(self, module: ELIC, variables):
        from tpuvc.entropy.bottleneck import FactorizedTables

        self.module = module
        self.variables = variables
        eb = FactorizedBottleneck(channels=module.N)
        self.z_tables = FactorizedTables.from_module(
            eb, {"params": variables["params"]["entropy_bottleneck"]}
        )
        self.gaussian = GaussianConditional()
        self.y_tables = self.gaussian.build_tables()

        self._analysis = jax.jit(
            lambda v, x: module.apply(v, x, method=ELIC.analysis)
        )
        self._hyper = jax.jit(
            lambda v, z: module.apply(v, z, method=ELIC.hyper_params)
        )
        self._synthesis = jax.jit(
            lambda v, y: module.apply(v, y, method=ELIC.g_s)
        )
        self._group_params = {}
        for i in range(len(module.groups)):
            self._group_params[i] = jax.jit(
                lambda v, h, prev, ya, i=i: module.apply(
                    v, i, h, prev, ya, method=ELIC.group_params
                )
            )

    def _code_group(self, i, curr_y, hyper, prev, mode, streams=None,
                    per_sample=False):
        """Shared enc/dec loop body. If ``streams`` is None: encode from
        curr_y, return (y_hat, [anchor_str, nonanchor_str]). Else decode.
        per_sample=True codes one stream per (phase, sample) — batched
        intra coding of independently-decodable frames.

        Float tensors never cross the host boundary: only int16 symbols
        and uint8 scale indexes move (the D2H/H2D link is the bottleneck
        of real coding); the partially-reconstructed latent is scatter-
        assembled on device. Streams are byte-identical to the previous
        host-assembled formulation (same rounding, same values).
        """
        from tpuvc.coder import decode_with_indexes, encode_with_indexes
        from tpuvc.coder.parallel import parallel_map
        from tpuvc.entropy.quant import quantize

        b, h, w = hyper.shape[0], hyper.shape[1], hyper.shape[2]
        gsize = self.module.groups[i]
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

        def phase(ys, prev_hat, idxs, stream):
            pi, pj = idxs
            scales, means = self._group_params[i](
                self.variables, hyper, prev, prev_hat
            )
            idx = np.asarray(
                self.gaussian.build_indexes(scales)[:, pi, pj]
                .astype(jnp.uint8)
            )
            if stream is None:
                sym = np.asarray(
                    quantize(ys, "symbols16", means=means)[:, pi, pj]
                )
                out = enc(sym, idx)
            else:
                sym = dec(stream, idx).astype(np.int16)
                out = stream
            vals = (
                jnp.asarray(sym).astype(jnp.float32) + means[:, pi, pj]
            )
            return vals, out

        zeros = jnp.zeros((b, h, w, gsize), jnp.float32)
        vals_a, str_a = phase(
            curr_y, zeros, (ai, aj), None if streams is None else streams[0]
        )
        anchor_hat = zeros.at[:, ai, aj].set(vals_a)
        vals_n, str_n = phase(
            curr_y, anchor_hat, (ni, nj),
            None if streams is None else streams[1],
        )
        y_hat = anchor_hat.at[:, ni, nj].set(vals_n)
        return y_hat, [str_a, str_n]

    def compress(self, x) -> dict:
        from tpuvc.coder import encode_with_indexes

        y, z = self._analysis(self.variables, x)
        zc = z.shape[-1]
        med = jnp.asarray(self.z_tables.medians)
        z_sym_dev = quantize(z, "symbols16", means=med)
        z_sym = np.asarray(z_sym_dev)
        z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32), z_sym.shape)
        z_string = encode_with_indexes(
            z_sym, z_idx, self.z_tables.cdfs, self.z_tables.cdf_lengths,
            self.z_tables.offsets,
        )
        z_hat = z_sym_dev.astype(jnp.float32) + med
        hyper = self._hyper(self.variables, z_hat)

        groups = []
        start = 0
        for g in self.module.groups:
            groups.append(y[..., start : start + g])
            start += g

        y_strings = []
        groups_hat = []
        for i, curr_y in enumerate(groups):
            prev = (
                jnp.concatenate(groups_hat, axis=-1)
                if i > 0
                else jnp.zeros(curr_y.shape[:3] + (0,), jnp.float32)
            )
            g_hat, strs = self._code_group(i, curr_y, hyper, prev, None)
            groups_hat.append(g_hat)
            y_strings.extend(strs)
        return {
            "strings": [y_strings, z_string],
            "shape": z.shape[1:3],
            "y_hat": jnp.concatenate(groups_hat, axis=-1),
        }

    def synthesize(self, y_hat):
        """Decoded image from the quantized latent (the encoder-side
        reconstruction: must equal what decompress produces)."""
        return self._synthesis(self.variables, y_hat)

    def compress_batch(self, x) -> dict:
        """Batched intra compress with per-sample streams: device
        transforms and group params at batch B, one independently-
        decodable [y_strings..., z] list per frame (decompress_batch must
        replay the same B — VSequenceBitstream mode=1 contract).

        -> {"strings": [(y_strings, z_string)] * B, "shape", "y_hat"}.
        """
        from tpuvc.coder import encode_with_indexes
        from tpuvc.coder.parallel import parallel_map

        y, z = self._analysis(self.variables, x)
        b = z.shape[0]
        med = jnp.asarray(self.z_tables.medians)
        z_sym_dev = quantize(z, "symbols16", means=med)
        z_sym = np.asarray(z_sym_dev)
        z_idx = np.broadcast_to(
            np.arange(z.shape[-1], dtype=np.int32), z_sym.shape[1:]
        )
        z_strings = parallel_map(
            lambda j: encode_with_indexes(
                z_sym[j], z_idx, self.z_tables.cdfs,
                self.z_tables.cdf_lengths, self.z_tables.offsets,
            ),
            range(b),
        )
        z_hat = z_sym_dev.astype(jnp.float32) + med
        hyper = self._hyper(self.variables, z_hat)

        per_frame_y: list[list] = [[] for _ in range(b)]
        groups_hat = []
        start = 0
        for i, g in enumerate(self.module.groups):
            curr_y = y[..., start : start + g]
            start += g
            prev = (
                jnp.concatenate(groups_hat, axis=-1)
                if i > 0
                else jnp.zeros(curr_y.shape[:3] + (0,), jnp.float32)
            )
            g_hat, (a_strs, n_strs) = self._code_group(
                i, curr_y, hyper, prev, None, per_sample=True
            )
            groups_hat.append(g_hat)
            for j in range(b):
                per_frame_y[j].extend([a_strs[j], n_strs[j]])
        return {
            "strings": [
                (per_frame_y[j], z_strings[j]) for j in range(b)
            ],
            "shape": z.shape[1:3],
            "y_hat": jnp.concatenate(groups_hat, axis=-1),
        }

    def decompress_batch(self, per_frame, shape):
        """Inverse of compress_batch: [(y_strings, z_string)] * B in,
        batched decoded images out (same B-shaped graphs)."""
        from tpuvc.coder import decode_with_indexes
        from tpuvc.coder.parallel import parallel_map

        zh, zw = shape
        zc = self.module.N
        z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32), (zh, zw, zc))
        z_sym = np.stack(
            parallel_map(
                lambda f: decode_with_indexes(
                    f[1], z_idx, self.z_tables.cdfs,
                    self.z_tables.cdf_lengths, self.z_tables.offsets,
                ).reshape(zh, zw, zc).astype(np.int16),
                per_frame,
            )
        )
        z_hat = jnp.asarray(z_sym).astype(jnp.float32) + jnp.asarray(
            self.z_tables.medians
        )
        hyper = self._hyper(self.variables, z_hat)
        groups_hat = []
        for i in range(len(self.module.groups)):
            prev = (
                jnp.concatenate(groups_hat, axis=-1)
                if i > 0
                else jnp.zeros(hyper.shape[:3] + (0,), jnp.float32)
            )
            a_strs = [f[0][2 * i] for f in per_frame]
            n_strs = [f[0][2 * i + 1] for f in per_frame]
            g_hat, _ = self._code_group(
                i, None, hyper, prev, None, streams=[a_strs, n_strs],
                per_sample=True,
            )
            groups_hat.append(g_hat)
        y_hat = jnp.concatenate(groups_hat, axis=-1)
        return self._synthesis(self.variables, y_hat)

    def decompress(self, strings, shape, batch: int = 1):
        from tpuvc.coder import decode_with_indexes

        y_strings, z_string = strings
        zh, zw = shape
        zc = self.module.N
        z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32), (batch, zh, zw, zc))
        z_sym = decode_with_indexes(
            z_string, z_idx, self.z_tables.cdfs, self.z_tables.cdf_lengths,
            self.z_tables.offsets,
        ).reshape(batch, zh, zw, zc)
        z_hat = jnp.asarray(z_sym, jnp.float32) + jnp.asarray(self.z_tables.medians)
        hyper = self._hyper(self.variables, z_hat)

        groups_hat = []
        for i in range(len(self.module.groups)):
            prev = (
                jnp.concatenate(groups_hat, axis=-1)
                if i > 0
                else jnp.zeros(hyper.shape[:3] + (0,), jnp.float32)
            )
            g_hat, _ = self._code_group(
                i, None, hyper, prev, None,
                streams=[y_strings[2 * i], y_strings[2 * i + 1]],
            )
            groups_hat.append(g_hat)
        y_hat = jnp.concatenate(groups_hat, axis=-1)
        return self._synthesis(self.variables, y_hat)
