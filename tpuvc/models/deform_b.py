"""DeformB — the v3 (ICIP2023) B-frame codec: feature-space deformable
alignment without explicit flow.

TPU-native rebuild of /root/reference/ICIP2023/src/model/m.py:19-140 (M17):
  1. 3-scale feature pyramids (32/64/96) of both references and the current
     frame.
  2. Offset_ELIC codes deformable offsets+masks per scale, conditioned on
     both references' features only (no flow, no warping).
  3. Per scale and per reference, an 8-group modulated deformable conv
     aligns the reference features; the two aligned maps are concatenated
     (compensated channels = 2x feature channels).
  4. Res_ELIC (with an extra pixel-level analysis stage over the raw current
     frame and noise-quantized training) codes feature residues; the deconv
     reconstructor decodes RGB.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from tpuvc.entropy.emath import likelihood_to_bits, per_sample_bits
from tpuvc.models.cond_elic import CondELIC
from tpuvc.models.ms_feature import MSFeature, ReconstructorDeconv, TemporalEnc
from tpuvc.ops.deform import DeformConv


def _head_to_deform(head):
    """v3 head layout (m.py:72-86): per reference, the first 144 of the
    216 per-ref channels are passed to the deformable conv verbatim and
    interpreted pairwise as (dy, dx) per (group, tap) — torchvision's
    layout, which tpuvc.ops.deform shares — and the last 72 are sigmoid
    masks. Direct slicing keeps imported reference weights bit-faithful."""
    off, m = head[..., :144], head[..., 144:]
    return off, nn.sigmoid(m)


class DeformB(nn.Module):
    feature_channels: tuple[int, int, int] = (32, 64, 96)
    N: int = 128
    M: int = 128
    levels: int = 5
    groups: tuple[int, ...] = (6, 6, 12, 24, 80)

    def setup(self):
        fc = self.feature_channels
        self.feature_extractor = MSFeature(channels=fc)
        self.offset_temp_encoder = TemporalEnc(N=self.N, M=self.M)
        self.offset_compressor = CondELIC(
            head_channels=(432, 432, 432), N=self.N, M=self.M,
            levels=self.levels, groups=self.groups, ctx_ste=False,
            zero_head_init=True,
        )
        # Two deform convs per scale (one per reference), 8 groups each.
        self.deconv_l3_1 = DeformConv(features=fc[2], groups=8)
        self.deconv_l3_2 = DeformConv(features=fc[2], groups=8)
        self.deconv_l2_1 = DeformConv(features=fc[1], groups=8)
        self.deconv_l2_2 = DeformConv(features=fc[1], groups=8)
        self.deconv_l1_1 = DeformConv(features=fc[0], groups=8)
        self.deconv_l1_2 = DeformConv(features=fc[0], groups=8)
        self.residual_temp_encoder = TemporalEnc(N=self.N, M=self.M)
        # Residues live in the concatenated (2x) compensated space.
        self.residual_compressor = CondELIC(
            head_channels=(2 * fc[0], 2 * fc[1], 2 * fc[2]),
            N=self.N, M=self.M, levels=self.levels, groups=self.groups,
            pixel_stage=True, ctx_ste=False,
        )
        self.reconstructor = ReconstructorDeconv(
            channels=(2 * fc[0], 2 * fc[1], 2 * fc[2])
        )

    def _deform_pair(self, head, f1, f2, d1, d2):
        from tpuvc.ops.warp import sequenced

        o1, o2 = jnp.split(head, 2, axis=-1)
        off1, m1 = _head_to_deform(o1)
        off2, m2 = _head_to_deform(o2)
        s1 = d1(f1, off1, m1)
        f2, s1 = sequenced(f2, s1)  # order the two deform kernels
        return jnp.concatenate([s1, d2(f2, off2, m2)], axis=-1)

    def __call__(self, xref1, xref2, xcur, s, mode: str = "noise", rng=None):
        B, H, W, _ = xcur.shape
        num_pixels = B * H * W
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

        fref1 = self.feature_extractor(xref1)
        fref2 = self.feature_extractor(xref2)
        fcur = self.feature_extractor(xcur)

        cond = tuple(
            jnp.concatenate([r1, r2], axis=-1)
            for r1, r2 in zip(fref1, fref2)
        )
        inputs = tuple(
            jnp.concatenate([c, f], axis=-1) for c, f in zip(cond, fcur)
        )
        offset_temp = self.offset_temp_encoder(*cond)
        offset_result = self.offset_compressor(
            inputs, cond, offset_temp, s, mode=mode, rng=rngs[0]
        )

        x_comp_l3 = self._deform_pair(
            offset_result["out3"], fref1[2], fref2[2],
            self.deconv_l3_1, self.deconv_l3_2,
        )
        x_comp_l2 = self._deform_pair(
            offset_result["out2"], fref1[1], fref2[1],
            self.deconv_l2_1, self.deconv_l2_2,
        )
        x_comp_l1 = self._deform_pair(
            offset_result["out1"], fref1[0], fref2[0],
            self.deconv_l1_1, self.deconv_l1_2,
        )

        res_temp = self.residual_temp_encoder(x_comp_l1, x_comp_l2, x_comp_l3)
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
            x_pixel=xcur,
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

    # --- staged methods for the real-bitstream coder ---

    def decoder_context(self, xref1, xref2):
        fref1 = self.feature_extractor(xref1)
        fref2 = self.feature_extractor(xref2)
        cond = tuple(
            jnp.concatenate([r1, r2], axis=-1)
            for r1, r2 in zip(fref1, fref2)
        )
        offset_temp = self.offset_temp_encoder(*cond)
        return cond, offset_temp, fref1, fref2

    def features(self, x):
        return self.feature_extractor(x)

    def fuse_offsets(self, heads, fref1, fref2):
        # Sequenced with optimization barriers for the same reason as
        # FlowGuidedB.fuse_offsets: multiple fused-deform Pallas calls in
        # one XLA program intermittently corrupt the last instance's tail
        # grid steps when the scheduler overlaps them (v5e, jax 0.9 —
        # scripts/debug_fuse_flake.py); decode bit-exactness requires
        # strict determinism.
        pairs = (
            (self.deconv_l1_1, self.deconv_l1_2),
            (self.deconv_l2_1, self.deconv_l2_2),
            (self.deconv_l3_1, self.deconv_l3_2),
        )
        out = []
        for i in range(3):
            f1 = fref1[i]
            if out:
                f1, prev = jax.lax.optimization_barrier((f1, out[-1]))
                out[-1] = prev
            out.append(
                self._deform_pair(heads[i], f1, fref2[i], *pairs[i])
            )
        return tuple(out)

    def residual_cond(self, x_comp):
        return self.residual_temp_encoder(*x_comp)

    def reconstruct(self, x1, x2, x3):
        return self.reconstructor(x1, x2, x3)

    def aux_loss(self):
        return (
            self.offset_compressor.aux_loss()
            + self.residual_compressor.aux_loss()
        )


class DeformBCoder:
    """Real-bitstream encode/decode for the v3 codec (beyond the reference,
    which evaluates v3 B-frames from likelihoods only)."""

    def __init__(self, model: DeformB, variables):
        from tpuvc.models.cond_elic import CondELICCoder

        self.model = model
        self.variables = variables
        self.shard = None  # see set_shard
        params = variables["params"]
        fc = model.feature_channels
        self.offset_coder = CondELICCoder(
            CondELIC(
                head_channels=(432, 432, 432), N=model.N, M=model.M,
                levels=model.levels, groups=model.groups, ctx_ste=False,
            ),
            {"params": params["offset_compressor"]},
        )
        self.res_coder = CondELICCoder(
            CondELIC(
                head_channels=(2 * fc[0], 2 * fc[1], 2 * fc[2]),
                N=model.N, M=model.M, levels=model.levels,
                groups=model.groups, pixel_stage=True, ctx_ste=False,
            ),
            {"params": params["residual_compressor"]},
        )
        m = model
        self._context = jax.jit(
            lambda v, r1, r2: m.apply(
                v, r1, r2, method=DeformB.decoder_context
            )
        )
        self._features = jax.jit(
            lambda v, x: m.apply(v, x, method=DeformB.features)
        )
        self._fuse = jax.jit(
            lambda v, heads, f1, f2: m.apply(
                v, heads, f1, f2, method=DeformB.fuse_offsets
            )
        )
        self._res_cond = jax.jit(
            lambda v, xc: m.apply(v, xc, method=DeformB.residual_cond)
        )
        self._recon = jax.jit(
            lambda v, x1, x2, x3: m.apply(
                v, x1, x2, x3, method=DeformB.reconstruct
            )
        )

    def encode(self, xref1, xref2, xcur, s):
        return self.encode_recon(xref1, xref2, xcur, s)[0]

    def encode_recon(self, xref1, xref2, xcur, s):
        """Encode + decoder-identical reconstruction in one pass: the
        res compress already synthesizes from the quantized latents
        (CondELICCoder.compress "outs"), so the reconstruction costs one
        extra _recon call instead of a full decode."""
        from tpuvc.coder.container import VFrameBitstream

        cond, offset_temp, fref1, fref2 = self._context(
            self.variables, xref1, xref2
        )
        fcur = self._features(self.variables, xcur)
        inputs = tuple(
            jnp.concatenate([c, f], axis=-1) for c, f in zip(cond, fcur)
        )
        off = self.offset_coder.compress(inputs, cond, offset_temp, s)
        # compress "outs" are synthesized from the decoder-identical
        # quantized latents — no need to re-decode the offset streams.
        x_comp = self._fuse(self.variables, off["outs"], fref1, fref2)
        res_temp = self._res_cond(self.variables, x_comp)
        res_inputs = tuple(
            jnp.concatenate([f, xc], axis=-1) for f, xc in zip(fcur, x_comp)
        )
        res = self.res_coder.compress(
            res_inputs, x_comp, res_temp, s, x_pixel=xcur
        )
        bits = VFrameBitstream(
            s_milli=int(round(float(s) * 1000)),
            down_ratio=1,
            scale1_centi=0,
            scale2_centi=0,
            z_shape=off["z_shape"],
            streams=list(off["streams"]) + list(res["streams"]),
        )
        x_full = tuple(xc + r for xc, r in zip(x_comp, res["outs"]))
        x_hat = self._recon(self.variables, *x_full)
        return bits, x_hat

    def encode_level_batch_async(self, xref1, xref2, xcur, s):
        """Batched real coding of one hierarchy level with deferred host
        phases: both conditional bottlenecks dispatch their full device
        chains immediately (CondELICCoder.compress_batch_async) and the
        symbol fetches + rANS packing overlap them on worker threads.
        Returns (resolve -> [VFrameBitstream]*B, x_hat)."""
        from tpuvc.coder.container import VFrameBitstream

        if self.shard is not None:
            xref1, xref2, xcur = self.shard((xref1, xref2, xcur))
        cond, offset_temp, fref1, fref2 = self._context(
            self.variables, xref1, xref2
        )
        fcur = self._features(self.variables, xcur)
        inputs = tuple(
            jnp.concatenate([c, f], axis=-1) for c, f in zip(cond, fcur)
        )
        off = self.offset_coder.compress_batch_async(
            inputs, cond, offset_temp, s
        )
        x_comp = self._fuse(self.variables, off["outs"], fref1, fref2)
        res_temp = self._res_cond(self.variables, x_comp)
        res_inputs = tuple(
            jnp.concatenate([f, xc], axis=-1) for f, xc in zip(fcur, x_comp)
        )
        res = self.res_coder.compress_batch_async(
            res_inputs, x_comp, res_temp, s, x_pixel=xcur
        )
        x_full = tuple(xc + r for xc, r in zip(x_comp, res["outs"]))
        x_hat = self._recon(self.variables, *x_full)
        batch = xcur.shape[0]
        # capture ONLY the stream resolvers + metadata: closing over the
        # full off/res dicts would pin their device arrays ("outs",
        # feature-pyramid sized) for every pending chunk — at 1080p that
        # exhausts HBM within one GOP window
        off_resolve, res_resolve = off["streams_resolve"], res["streams_resolve"]
        z_shape = off["z_shape"]

        def resolve():
            off_streams = off_resolve()
            res_streams = res_resolve()
            return [
                VFrameBitstream(
                    s_milli=int(round(float(s) * 1000)),
                    down_ratio=1,
                    scale1_centi=0,
                    scale2_centi=0,
                    z_shape=z_shape,
                    streams=list(off_streams[b]) + list(res_streams[b]),
                )
                for b in range(batch)
            ]

        return resolve, x_hat

    def encode_level_batch(self, xref1, xref2, xcur, s):
        """Batched real coding of one hierarchy level (VSequenceBitstream
        mode=1): both conditional bottlenecks run at batch B with
        per-frame streams; reconstruction comes from the compress-side
        quantized latents (decoder-identical). Blocking variant of
        encode_level_batch_async."""
        resolve, x_hat = self.encode_level_batch_async(xref1, xref2, xcur, s)
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
        s = bitstreams[0].s_milli / 1000.0
        n = 1 + 2 * len(self.model.groups)
        off_streams = [list(b.streams[:n]) for b in bitstreams]
        res_streams = [list(b.streams[n:]) for b in bitstreams]
        cond, offset_temp, fref1, fref2 = self._context(
            self.variables, xref1, xref2
        )
        heads = self.offset_coder.decompress_batch(
            off_streams, bitstreams[0].z_shape, cond, offset_temp, s
        )
        x_comp = self._fuse(self.variables, heads, fref1, fref2)
        res_temp = self._res_cond(self.variables, x_comp)
        residues = self.res_coder.decompress_batch(
            res_streams, bitstreams[0].z_shape, x_comp, res_temp, s
        )
        x_full = tuple(xc + r for xc, r in zip(x_comp, residues))
        return self._recon(self.variables, *x_full)

    def decode(self, xref1, xref2, bitstream):
        s = bitstream.s_milli / 1000.0
        n = 1 + 2 * len(self.model.groups)
        off_streams = bitstream.streams[:n]
        res_streams = bitstream.streams[n:]
        cond, offset_temp, fref1, fref2 = self._context(
            self.variables, xref1, xref2
        )
        heads = self.offset_coder.decompress(
            off_streams, bitstream.z_shape, cond, offset_temp, s
        )
        x_comp = self._fuse(self.variables, heads, fref1, fref2)
        res_temp = self._res_cond(self.variables, x_comp)
        residues = self.res_coder.decompress(
            res_streams, bitstream.z_shape, x_comp, res_temp, s
        )
        x_full = tuple(xc + r for xc, r in zip(x_comp, residues))
        return self._recon(self.variables, *x_full)
