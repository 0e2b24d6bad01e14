"""FlowGuidedB — the v4 (ICIP2024) flagship B-frame codec.

TPU-native rebuild of /root/reference/ICIP2024/src/model/m.py:31-283 (M21):
  1. FlowNET estimates a bidirectional flow pair between the references at an
     adaptive ``down_ratio`` (motion-adaptive inference, O5).
  2. Flows are scaled by temporal-distance ratios (``get_scales``/
     ``convert_scales``) to point from the current frame to each reference.
  3. A 3-scale feature pyramid of both references is warped by the flow
     pyramid (flow halved per scale).
  4. Offset_ELIC codes deformable alignment offsets conditioned on
     [warped refs | raw refs | current] features; OffsetDiversity fuses both
     references per scale.
  5. Res_ELIC codes feature-space residues; the Reconstructor decodes RGB.

TPU notes: everything is static-shaped per (resolution, down_ratio) pair.
``down_ratio`` changes pooled shapes, so each ratio is its own compiled
graph (the reference pays the same in kernel shapes); the adaptive search
batches the candidate warp evaluations instead of looping (gop/adaptive.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from tpuvc.entropy.emath import likelihood_to_bits, per_sample_bits
from tpuvc.models.cond_elic import OffsetELIC, ResELIC
from tpuvc.models.ms_feature import (
    FlowNET,
    MSFeature,
    Reconstructor,
    TemporalEnc,
)
from tpuvc.models.offset_diversity import OffsetDiversity
from tpuvc.ops.pad import pad_to_multiple, unpad
from tpuvc.ops.resample import avg_pool2d, bilinear_resize
from tpuvc.ops.warp import sequenced, warp


def convert_scales(scale1, scale2):
    """Round temporal scales to 2 decimals (m.py:71-82)."""
    scale1 = jnp.round(jnp.asarray(scale1, jnp.float32) * 100.0) / 100.0
    scale2 = jnp.round(jnp.asarray(scale2, jnp.float32) * 100.0) / 100.0
    return scale1, scale2


def get_scales(order, order1, order2):
    """Temporal-distance flow scaling factors (ICIP2024/src/utils.py:223-243).

    flow is estimated ref1->ref2; the current frame at ``order`` needs
    flow_cur->ref1 = flow21 * (order-order1)/(order2-order1) and symmetric.
    """
    if order2 == order1:
        return 0.0, 0.0
    return (
        (order - order1) / (order2 - order1),
        (order - order2) / (order1 - order2),
    )


class FlowGuidedB(nn.Module):
    feature_channels: tuple[int, int, int] = (64, 96, 128)
    N: int = 128
    M: int = 128
    levels: int = 5
    groups: tuple[int, ...] = (6, 6, 12, 24, 80)

    def setup(self):
        fc = self.feature_channels
        self.feature_extractor = MSFeature(channels=fc)
        self.flow_estimator = FlowNET()
        self.offset_temporal_conditioner = TemporalEnc(N=self.N, M=self.M)
        self.offset_compressor = OffsetELIC(
            N=self.N, M=self.M, levels=self.levels, groups=self.groups
        )
        self.offset_diversity_l3 = OffsetDiversity(
            features=fc[2], magnitude=10.0
        )
        self.offset_diversity_l2 = OffsetDiversity(
            features=fc[1], magnitude=20.0
        )
        self.offset_diversity_l1 = OffsetDiversity(
            features=fc[0], magnitude=40.0
        )
        self.residue_temporal_conditioner = TemporalEnc(N=self.N, M=self.M)
        self.residual_compressor = ResELIC(
            N=self.N, M=self.M, levels=self.levels, feature_channels=fc,
            groups=self.groups,
        )
        self.reconstructor = Reconstructor(channels=fc)

    def estimate_flow(self, xref1, xref2, down_ratio: int):
        """FlowNET at adaptive resolution -> 4ch flow pair at /2 of full res.

        Parity: m.py:84-102 — refs pooled by down_ratio*2, zero-padded to
        x16, flow cropped back and upscaled by down_ratio with magnitude
        scaling.
        """
        d1 = avg_pool2d(xref1, down_ratio * 2)
        d2 = avg_pool2d(xref2, down_ratio * 2)
        h, w = d1.shape[-3], d1.shape[-2]
        d1, _ = pad_to_multiple(d1, 16, mode="constant")
        d2, _ = pad_to_multiple(d2, 16, mode="constant")
        flow = self.flow_estimator(jnp.concatenate([d1, d2], axis=-1))
        flow = unpad(flow, (h, w))
        if down_ratio > 1:
            flow = (
                bilinear_resize(flow, h * down_ratio, w * down_ratio)
                * down_ratio
            )
        return flow

    def warped_refs_at_layer(self, fref1, fref2, flow, scale1, scale2):
        """Scale + warp one pyramid level; return halved flow for the next.

        Parity: m.py:104-117.
        """
        flow_21, flow_12 = jnp.split(flow, 2, axis=-1)
        flow_cur1 = flow_21 * scale1
        flow_cur2 = flow_12 * scale2
        wref1 = warp(fref1, flow_cur1)
        fref2, wref1 = sequenced(fref2, wref1)  # order the two warp kernels
        wref2 = warp(fref2, flow_cur2)
        h, w = flow.shape[-3] // 2, flow.shape[-2] // 2
        down_flow = bilinear_resize(flow, h, w) * 0.5
        return flow_cur1, flow_cur2, wref1, wref2, down_flow

    def __call__(
        self,
        xref1,
        xref2,
        xcur,
        s,
        scale1=0.5,
        scale2=-0.5,
        down_ratio: int = 1,
        mode: str = "ste",
        rng=None,
    ):
        B, H, W, _ = xcur.shape
        num_pixels = B * H * W
        scale1, scale2 = convert_scales(scale1, scale2)
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

        flow_l1 = self.estimate_flow(xref1, xref2, down_ratio)
        fref1 = self.feature_extractor(xref1)
        fref2 = self.feature_extractor(xref2)
        fcur = self.feature_extractor(xcur)

        f1_cur1, f1_cur2, wref1_l1, wref2_l1, flow_l2 = (
            self.warped_refs_at_layer(fref1[0], fref2[0], flow_l1, scale1, scale2)
        )
        f2_cur1, f2_cur2, wref1_l2, wref2_l2, flow_l3 = (
            self.warped_refs_at_layer(fref1[1], fref2[1], flow_l2, scale1, scale2)
        )
        f3_cur1, f3_cur2, wref1_l3, wref2_l3, _ = (
            self.warped_refs_at_layer(fref1[2], fref2[2], flow_l3, scale1, scale2)
        )

        # Conditioning pyramids: cond = [warped refs | raw refs] per scale,
        # input adds the current frame's features (m.py:119-142).
        cond = tuple(
            jnp.concatenate([w1, w2, r1, r2], axis=-1)
            for w1, w2, r1, r2 in (
                (wref1_l1, wref2_l1, fref1[0], fref2[0]),
                (wref1_l2, wref2_l2, fref1[1], fref2[1]),
                (wref1_l3, wref2_l3, fref1[2], fref2[2]),
            )
        )
        inputs = tuple(
            jnp.concatenate([c, f], axis=-1) for c, f in zip(cond, fcur)
        )
        offset_temp = self.offset_temporal_conditioner(*cond)
        offset_result = self.offset_compressor(
            inputs, cond, offset_temp, s, mode=mode, rng=rngs[0]
        )

        def fuse(off_div, head, f1, f2, fl1, fl2):
            o1, o2 = jnp.split(head, 2, axis=-1)
            return off_div(f1, o1, fl1, f2, o2, fl2)

        x_comp_l3 = fuse(
            self.offset_diversity_l3, offset_result["out3"],
            fref1[2], fref2[2], f3_cur1, f3_cur2,
        )
        x_comp_l2 = fuse(
            self.offset_diversity_l2, offset_result["out2"],
            fref1[1], fref2[1], f2_cur1, f2_cur2,
        )
        x_comp_l1 = fuse(
            self.offset_diversity_l1, offset_result["out1"],
            fref1[0], fref2[0], f1_cur1, f1_cur2,
        )

        res_temp = self.residue_temporal_conditioner(
            x_comp_l1, x_comp_l2, x_comp_l3
        )
        res_inputs = tuple(
            jnp.concatenate([f, xc], axis=-1)
            for f, xc in zip(fcur, (x_comp_l1, x_comp_l2, x_comp_l3))
        )
        res_result = self.residual_compressor(
            res_inputs,
            (x_comp_l1, x_comp_l2, x_comp_l3),
            res_temp,
            s,
            mode=mode,
            rng=rngs[1],
        )

        x_comp_l1 = x_comp_l1 + res_result["out1"]
        x_comp_l2 = x_comp_l2 + res_result["out2"]
        x_comp_l3 = x_comp_l3 + res_result["out3"]
        x_hat = self.reconstructor(x_comp_l1, x_comp_l2, x_comp_l3)

        bits = sum(
            likelihood_to_bits(l)
            for l in offset_result["likelihoods"].values()
        ) + sum(
            likelihood_to_bits(l) for l in res_result["likelihoods"].values()
        )
        sizes = sum(
            per_sample_bits(l)
            for l in offset_result["likelihoods"].values()
        ) + sum(
            per_sample_bits(l) for l in res_result["likelihoods"].values()
        )
        return {
            "x_hat": x_hat,
            "size": bits,
            "sizes": sizes,
            "rate": bits / num_pixels,
        }

    # --- staged methods for the real-bitstream coder (decoder-side state is
    # derivable from the references alone; XLA determinism makes the
    # encoder/decoder recomputation bit-identical) ---

    def decoder_context(self, xref1, xref2, scale1, scale2, down_ratio: int):
        """Everything the decoder can compute from the refs: conditioning
        pyramids, temporal prior, per-scale scaled flows, ref features."""
        scale1, scale2 = convert_scales(scale1, scale2)
        flow_l1 = self.estimate_flow(xref1, xref2, down_ratio)
        fref1 = self.feature_extractor(xref1)
        fref2 = self.feature_extractor(xref2)
        f1_cur1, f1_cur2, w1_1, w2_1, flow_l2 = self.warped_refs_at_layer(
            fref1[0], fref2[0], flow_l1, scale1, scale2
        )
        f2_cur1, f2_cur2, w1_2, w2_2, flow_l3 = self.warped_refs_at_layer(
            fref1[1], fref2[1], flow_l2, scale1, scale2
        )
        f3_cur1, f3_cur2, w1_3, w2_3, _ = self.warped_refs_at_layer(
            fref1[2], fref2[2], flow_l3, scale1, scale2
        )
        cond = tuple(
            jnp.concatenate([a, b, c, d], axis=-1)
            for a, b, c, d in (
                (w1_1, w2_1, fref1[0], fref2[0]),
                (w1_2, w2_2, fref1[1], fref2[1]),
                (w1_3, w2_3, fref1[2], fref2[2]),
            )
        )
        offset_temp = self.offset_temporal_conditioner(*cond)
        flows = ((f1_cur1, f1_cur2), (f2_cur1, f2_cur2), (f3_cur1, f3_cur2))
        return cond, offset_temp, flows, fref1, fref2

    def features(self, x):
        return self.feature_extractor(x)

    def fuse_offsets(self, heads, fref1, fref2, flows):
        """OffsetDiversity fusion of decoded offset heads -> x_comp triple.

        The three fused-deform Pallas calls are explicitly SEQUENCED with
        optimization barriers: with all three in one XLA program the
        scheduler otherwise overlaps their windows and the L3 instance's
        last grid steps intermittently read/write stale data (~10% of
        runs, a few hundred elements) — observed on jax 0.9/v5e, kernel
        deterministic in isolation (scripts/debug_fuse_flake.py /
        debug_deform_flake.py). Bit-exact decode is a hard codec
        requirement, so ordering wins over any overlap the scheduler
        could have found.
        """
        divs = (
            self.offset_diversity_l1,
            self.offset_diversity_l2,
            self.offset_diversity_l3,
        )
        out = []
        for i in range(3):
            o1, o2 = jnp.split(heads[i], 2, axis=-1)
            x1 = fref1[i]
            if out:
                x1, prev = jax.lax.optimization_barrier((x1, out[-1]))
                out[-1] = prev
            out.append(
                divs[i](x1, o1, flows[i][0], fref2[i], o2, flows[i][1])
            )
        return tuple(out)

    def residual_cond(self, x_comp):
        return self.residue_temporal_conditioner(*x_comp)

    def reconstruct(self, x1, x2, x3):
        return self.reconstructor(x1, x2, x3)

    def prediction_flowonly(
        self, xref1, xref2, scale1, scale2, down_ratio: int = 1
    ):
        """Cheap flow-only prediction used by the down-ratio search
        (ICIP2024/src/opt_helpers.py:23-38): full-res warp of both refs by
        the scaled upsampled flow, averaged."""
        scale1, scale2 = convert_scales(scale1, scale2)
        flow = self.estimate_flow(xref1, xref2, down_ratio)
        H, W = xref1.shape[-3], xref1.shape[-2]
        flow = bilinear_resize(flow, H, W) * 2.0
        flow_21, flow_12 = jnp.split(flow, 2, axis=-1)
        wref1 = warp(xref1, flow_21 * scale1)
        xref2, wref1 = sequenced(xref2, wref1)  # order the two warp kernels
        wref2 = warp(xref2, flow_12 * scale2)
        return 0.5 * wref1 + 0.5 * wref2

    def aux_loss(self):
        return (
            self.offset_compressor.aux_loss()
            + self.residual_compressor.aux_loss()
        )


class FlowGuidedBCoder:
    """Real-bitstream encode/decode for the v4 codec (beyond the reference,
    whose v3/v4 evaluation is likelihood-only). The decoder recomputes flow,
    features, warps, and temporal priors from the reconstructed references;
    both conditional bottlenecks code through CondELICCoder."""

    def __init__(self, model: FlowGuidedB, variables):
        from tpuvc.models.cond_elic import CondELICCoder

        self.model = model
        self.variables = variables
        self.shard = None  # see set_shard
        params = variables["params"]
        self.offset_coder = CondELICCoder(
            OffsetELIC(
                N=model.N, M=model.M, levels=model.levels, groups=model.groups
            ),
            {"params": params["offset_compressor"]},
        )
        self.res_coder = CondELICCoder(
            ResELIC(
                N=model.N, M=model.M, levels=model.levels,
                feature_channels=model.feature_channels, groups=model.groups,
            ),
            {"params": params["residual_compressor"]},
        )
        m = model
        self._context = jax.jit(
            lambda v, r1, r2, s1, s2, dr: m.apply(
                v, r1, r2, s1, s2, dr, method=FlowGuidedB.decoder_context
            ),
            static_argnums=(5,),
        )
        self._features = jax.jit(
            lambda v, x: m.apply(v, x, method=FlowGuidedB.features)
        )
        self._fuse = jax.jit(
            lambda v, heads, f1, f2, flows: m.apply(
                v, heads, f1, f2, flows, method=FlowGuidedB.fuse_offsets
            )
        )
        self._res_cond = jax.jit(
            lambda v, xc: m.apply(v, xc, method=FlowGuidedB.residual_cond)
        )
        self._recon = jax.jit(
            lambda v, x1, x2, x3: m.apply(
                v, x1, x2, x3, method=FlowGuidedB.reconstruct
            )
        )

    def _compensate(self, cond, offset_temp, flows, fref1, fref2,
                    offset_streams, z_shape, s):
        heads = self.offset_coder.decompress(
            offset_streams, z_shape, cond, offset_temp, s
        )
        return self._fuse(self.variables, heads, fref1, fref2, flows)

    def encode(self, xref1, xref2, xcur, s, scale1, scale2,
               down_ratio: int = 1):
        return self.encode_recon(
            xref1, xref2, xcur, s, scale1, scale2, down_ratio
        )[0]

    def encode_recon(self, xref1, xref2, xcur, s, scale1, scale2,
                     down_ratio: int = 1):
        """Encode + decoder-identical reconstruction in one pass: both
        conditional bottlenecks' compress calls already synthesize from the
        quantized latents ("outs"), so neither stream is re-decoded."""
        from tpuvc.coder.container import VFrameBitstream

        cond, offset_temp, flows, fref1, fref2 = self._context(
            self.variables, xref1, xref2, scale1, scale2, down_ratio
        )
        fcur = self._features(self.variables, xcur)
        inputs = tuple(
            jnp.concatenate([c, f], axis=-1) for c, f in zip(cond, fcur)
        )
        off = self.offset_coder.compress(inputs, cond, offset_temp, s)
        x_comp = self._fuse(self.variables, off["outs"], fref1, fref2, flows)
        res_temp = self._res_cond(self.variables, x_comp)
        res_inputs = tuple(
            jnp.concatenate([f, xc], axis=-1) for f, xc in zip(fcur, x_comp)
        )
        res = self.res_coder.compress(res_inputs, x_comp, res_temp, s)
        assert off["z_shape"] == res["z_shape"]
        bits = VFrameBitstream(
            s_milli=int(round(float(s) * 1000)),
            down_ratio=down_ratio,
            scale1_centi=int(round(float(scale1) * 100)),
            scale2_centi=int(round(float(scale2) * 100)),
            z_shape=off["z_shape"],
            streams=list(off["streams"]) + list(res["streams"]),
        )
        x_full = tuple(xc + r for xc, r in zip(x_comp, res["outs"]))
        x_hat = self._recon(self.variables, *x_full)
        return bits, x_hat

    def encode_level_batch_async(self, xref1, xref2, xcur, s, scale1,
                                 scale2, down_ratio: int = 1):
        """Batched real coding of one hierarchy level with deferred host
        phases (see DeformBCoder.encode_level_batch_async). Returns
        (resolve -> [VFrameBitstream]*B, x_hat)."""
        from tpuvc.coder.container import VFrameBitstream

        if self.shard is not None:
            xref1, xref2, xcur = self.shard((xref1, xref2, xcur))
        cond, offset_temp, flows, fref1, fref2 = self._context(
            self.variables, xref1, xref2, scale1, scale2, down_ratio
        )
        fcur = self._features(self.variables, xcur)
        inputs = tuple(
            jnp.concatenate([c, f], axis=-1) for c, f in zip(cond, fcur)
        )
        off = self.offset_coder.compress_batch_async(
            inputs, cond, offset_temp, s
        )
        x_comp = self._fuse(self.variables, off["outs"], fref1, fref2, flows)
        res_temp = self._res_cond(self.variables, x_comp)
        res_inputs = tuple(
            jnp.concatenate([f, xc], axis=-1) for f, xc in zip(fcur, x_comp)
        )
        res = self.res_coder.compress_batch_async(
            res_inputs, x_comp, res_temp, s
        )
        assert off["z_shape"] == res["z_shape"]
        x_full = tuple(xc + r for xc, r in zip(x_comp, res["outs"]))
        x_hat = self._recon(self.variables, *x_full)
        batch = xcur.shape[0]
        # capture only resolvers + metadata — NOT the off/res dicts, whose
        # device arrays would stay pinned per pending chunk (HBM; see
        # DeformBCoder.encode_level_batch_async)
        off_resolve, res_resolve = off["streams_resolve"], res["streams_resolve"]
        z_shape = off["z_shape"]

        def resolve():
            off_streams = off_resolve()
            res_streams = res_resolve()
            return [
                VFrameBitstream(
                    s_milli=int(round(float(s) * 1000)),
                    down_ratio=down_ratio,
                    scale1_centi=int(round(float(scale1) * 100)),
                    scale2_centi=int(round(float(scale2) * 100)),
                    z_shape=z_shape,
                    streams=list(off_streams[b]) + list(res_streams[b]),
                )
                for b in range(batch)
            ]

        return resolve, x_hat

    def encode_level_batch(self, xref1, xref2, xcur, s, scale1, scale2,
                           down_ratio: int = 1):
        """Batched real coding of one hierarchy level (VSequenceBitstream
        mode=1). Frames of one level share temporal geometry, so one
        (scale1, scale2, down_ratio) triple serves the whole batch.
        Blocking variant of encode_level_batch_async."""
        resolve, x_hat = self.encode_level_batch_async(
            xref1, xref2, xcur, s, scale1, scale2, down_ratio
        )
        return resolve(), x_hat

    def set_shard(self, shard):
        """Enable mesh-sharded level-batched coding: ``shard`` (from
        tpuvc.parallel.level_batch_sharder) places batch axes over the
        mesh, applied to the inputs of every device stage on BOTH the
        encode and decode paths — the mesh size rides in the stream
        header (VSequenceBitstream.mesh) so decoders shard identically,
        which keeps the re-derived entropy parameters bit-identical
        (same contract as LHBDCCoder.set_shard)."""
        self.shard = shard
        self.offset_coder.shard = shard
        self.res_coder.shard = shard

    def decode_level_batch(self, xref1, xref2, bitstreams):
        """Inverse of encode_level_batch (same B-shaped graphs)."""
        if self.shard is not None:
            xref1, xref2 = self.shard((xref1, xref2))
        b0 = bitstreams[0]
        s = b0.s_milli / 1000.0
        scale1, scale2 = b0.scale1_centi / 100.0, b0.scale2_centi / 100.0
        n = 1 + 2 * len(self.model.groups)
        off_streams = [list(b.streams[:n]) for b in bitstreams]
        res_streams = [list(b.streams[n:]) for b in bitstreams]
        cond, offset_temp, flows, fref1, fref2 = self._context(
            self.variables, xref1, xref2, scale1, scale2,
            int(b0.down_ratio),
        )
        heads = self.offset_coder.decompress_batch(
            off_streams, b0.z_shape, cond, offset_temp, s
        )
        x_comp = self._fuse(self.variables, heads, fref1, fref2, flows)
        res_temp = self._res_cond(self.variables, x_comp)
        residues = self.res_coder.decompress_batch(
            res_streams, b0.z_shape, x_comp, res_temp, s
        )
        x_full = tuple(xc + r for xc, r in zip(x_comp, residues))
        return self._recon(self.variables, *x_full)

    def decode(self, xref1, xref2, bitstream):
        s = bitstream.s_milli / 1000.0
        scale1 = bitstream.scale1_centi / 100.0
        scale2 = bitstream.scale2_centi / 100.0
        n = 1 + 2 * len(self.model.groups)
        off_streams = bitstream.streams[:n]
        res_streams = bitstream.streams[n:]

        cond, offset_temp, flows, fref1, fref2 = self._context(
            self.variables, xref1, xref2, scale1, scale2,
            int(bitstream.down_ratio),
        )
        x_comp = self._compensate(
            cond, offset_temp, flows, fref1, fref2,
            off_streams, bitstream.z_shape, s,
        )
        res_temp = self._res_cond(self.variables, x_comp)
        residues = self.res_coder.decompress(
            res_streams, bitstream.z_shape, x_comp, res_temp, s
        )
        x_full = tuple(xc + r for xc, r in zip(x_comp, residues))
        return self._recon(self.variables, *x_full)
