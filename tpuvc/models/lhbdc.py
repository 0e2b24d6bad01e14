"""LHBDC hierarchical bi-directional B-frame codec (TIP'21 generation).

TPU-native rebuild of /root/reference/LHBDC/model/m.py:20-108 (M6):
  1. SPyNet flows between the two reference frames (halved -> linear-motion
     priors for current<->ref flows) and from the current frame to each ref,
     all pooled to /4 resolution.
  2. The *differences* (flow_cur->ref minus prior) are coded by a mean-scale
     hyperprior MV codec (4ch).
  3. Both references are backward-warped by the reconstructed flows, blended
     by a sigmoid occlusion mask (UNet), and the pixel residual is coded by a
     second hyperprior codec.

Contract: inputs are padded to x64 (data layer). Flows at /4 resolution are
reflect-padded to x64 before the MV codec and cropped afterwards, exactly as
the reference does (m.py:102-108). Rate accounting follows m.py:73-96:
rate = (bpp_flow + bpp_residual)/2 over padded pixels, bits = total bits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from tpuvc.entropy.emath import likelihood_to_bits, per_sample_bits
from tpuvc.models.hyperprior import MVCompressor, ResidualCompressor
from tpuvc.models.spynet import SPyNet
from tpuvc.models.unet import MaskUNet
from tpuvc.ops.pad import pad_to_multiple, unpad
from tpuvc.ops.resample import avg_pool2d, upsample_flow
from tpuvc.ops.warp import sequenced, warp


class LHBDC(nn.Module):
    N: int = 128

    def setup(self):
        self.flownet = SPyNet()
        self.mv_compressor = MVCompressor(N=self.N)
        self.residual_compressor = ResidualCompressor(N=self.N)
        self.masknet = MaskUNet()

    def _batched_flows(self, firsts, seconds):
        """Run several flow estimations as ONE batched SPyNet pass (TPU: one
        deep batch keeps the MXU busier than n sequential pyramids; the
        reference runs 4 separate SPyNet calls per frame, m.py:38-47)."""
        b = firsts[0].shape[0]
        flow = self.flownet(
            jnp.concatenate(firsts, axis=0), jnp.concatenate(seconds, axis=0)
        )
        return [
            flow[i * b : (i + 1) * b] for i in range(len(firsts))
        ]

    def motion_priors(self, x_before, x_after):
        """Half the ref<->ref flows at /4 res, padded to x64: the linear-motion
        priors for the current frame's flows (m.py:38-44)."""
        f_ba, f_ab = self._batched_flows(
            [x_before, x_after], [x_after, x_before]
        )
        flow_ba = avg_pool2d(f_ba / 2.0, 4)
        flow_ab = avg_pool2d(f_ab / 2.0, 4)
        size = (flow_ba.shape[-3], flow_ba.shape[-2])
        flow_ba, _ = pad_to_multiple(flow_ba, 64)
        flow_ab, _ = pad_to_multiple(flow_ab, 64)
        return flow_ba, flow_ab, size

    def current_flows(self, x_current, x_before, x_after):
        """Current->ref flows at /4 res, padded to x64 (m.py:45-50)."""
        f_cb, f_ca = self._batched_flows(
            [x_current, x_current], [x_before, x_after]
        )
        flow_cb = avg_pool2d(f_cb, 4)
        flow_ca = avg_pool2d(f_ca, 4)
        flow_cb, _ = pad_to_multiple(flow_cb, 64)
        flow_ca, _ = pad_to_multiple(flow_ca, 64)
        return flow_cb, flow_ca

    def all_flows(self, x_before, x_current, x_after):
        """All 4 flows in one batched SPyNet pass (forward-path fast route)."""
        f_ba, f_ab, f_cb, f_ca = self._batched_flows(
            [x_before, x_after, x_current, x_current],
            [x_after, x_before, x_before, x_after],
        )
        size = None
        flows = []
        for f, halve in ((f_ba, True), (f_ab, True), (f_cb, False), (f_ca, False)):
            g = avg_pool2d(f / 2.0 if halve else f, 4)
            if size is None:
                size = (g.shape[-3], g.shape[-2])
            g, _ = pad_to_multiple(g, 64)
            flows.append(g)
        flow_ba, flow_ab, flow_cb, flow_ca = flows
        return flow_ba, flow_ab, flow_cb, flow_ca, size

    def motion_compensate(self, x_before, x_after, flow_cb_hat, flow_ca_hat, size):
        """Crop + x4 upsample decoded flows, warp both refs, mask-blend."""
        flow_cb_hat = upsample_flow(unpad(flow_cb_hat, size), 4)
        flow_ca_hat = upsample_flow(unpad(flow_ca_hat, size), 4)
        fw = warp(x_before, flow_cb_hat, compat="lhbdc")
        x_after, fw = sequenced(x_after, fw)  # order the two warp kernels
        bw = warp(x_after, flow_ca_hat, compat="lhbdc")
        mask = self.masknet(jnp.concatenate([fw, bw], axis=-1))
        return mask * fw + (1.0 - mask) * bw

    def __call__(self, x_before, x_current, x_after, mode: str = "noise", rng=None):
        B, H, W, _ = x_current.shape
        num_pixels = B * H * W
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

        flow_ba, flow_ab, flow_cb, flow_ca, size = self.all_flows(
            x_before, x_current, x_after
        )

        diff_flow = jnp.concatenate(
            [flow_cb - flow_ab, flow_ca - flow_ba], axis=-1
        )
        flow_out = self.mv_compressor(diff_flow, mode=mode, rng=rngs[0])
        flow_cb_hat, flow_ca_hat = jnp.split(flow_out["x_hat"], 2, axis=-1)
        flow_cb_hat = flow_cb_hat + flow_ab
        flow_ca_hat = flow_ca_hat + flow_ba

        x_pred = self.motion_compensate(
            x_before, x_after, flow_cb_hat, flow_ca_hat, size
        )

        residual = x_current - x_pred
        res_out = self.residual_compressor(residual, mode=mode, rng=rngs[1])
        x_hat = x_pred + res_out["x_hat"]

        bits_flow = sum(
            likelihood_to_bits(l) for l in flow_out["likelihoods"].values()
        )
        bits_res = sum(
            likelihood_to_bits(l) for l in res_out["likelihoods"].values()
        )
        rate = (bits_flow + bits_res) / (2.0 * num_pixels)
        # Per-sample bits enable level-batched GOP evaluation (independent
        # frames share one forward; each needs its own size accounting).
        sizes = sum(
            per_sample_bits(l) for l in flow_out["likelihoods"].values()
        ) + sum(per_sample_bits(l) for l in res_out["likelihoods"].values())
        return {
            "x_hat": x_hat,
            "x_pred": x_pred,
            "rate": rate,
            "bits": bits_flow + bits_res,
            "bits_flow": bits_flow,
            "bits_residual": bits_res,
            "sizes": sizes,
        }

    def aux_loss(self):
        return self.mv_compressor.aux_loss() + self.residual_compressor.aux_loss()


class LHBDCCoder:
    """Real-bitstream encode/decode for the LHBDC codec.

    Mirrors /root/reference/LHBDC/encode_B.py:71-105 and decode_B.py:65-84:
    the decoder re-estimates flow from the two *reconstructed* reference
    frames, so encoder and decoder must produce bit-identical flow — XLA's
    deterministic execution gives this for free (the reference needed
    cudnn.deterministic). Note: the reference scripts swap flow_ab/flow_ba
    through ``pad`` (encode_B.py:78-79); we use the training-time assignment
    on both sides, which preserves enc/dec agreement (SURVEY.md 7.4).

    The encoder reconstructs the prediction from *decoded* latents (running
    the same decompress path as the decoder) so drift is structurally
    impossible.
    """

    def __init__(self, model: LHBDC, variables):
        from tpuvc.models.hyperprior import HyperpriorCoder

        self.model = model
        self.variables = variables
        self.shard = None  # see set_shard
        params = variables["params"]
        self.mv_coder = HyperpriorCoder(
            MVCompressor(N=model.N), {"params": params["mv_compressor"]}
        )
        self.res_coder = HyperpriorCoder(
            ResidualCompressor(N=model.N), {"params": params["residual_compressor"]}
        )
        self._motion_priors = jax.jit(
            lambda v, xb, xa: model.apply(v, xb, xa, method=LHBDC.motion_priors)[:2]
        )

        # Encoder-only fused fronts: current-frame flows + MV analysis in
        # one graph, residual formation + residual analysis in another
        # (with the z quantization folded in). Nothing here has a decoder
        # counterpart, so fusing cannot break the enc/dec bit-identity
        # contract — the shared graphs (_motion_priors, _params_idx,
        # _synthesis, _compensate) stay standalone. Halves the encoder's
        # per-batch-shape graph loads on remote-compile deployments.
        from tpuvc.entropy.quant import quantize

        def _mv_front_m(m, xc, xb, xa, flow_ba, flow_ab):
            flow_cb, flow_ca = m.current_flows(xc, xb, xa)
            diff = jnp.concatenate(
                [flow_cb - flow_ab, flow_ca - flow_ba], axis=-1
            )
            return m.mv_compressor.analysis(diff)

        def mv_front(v, xc, xb, xa, flow_ba, flow_ab):
            y, z = model.apply(
                v, xc, xb, xa, flow_ba, flow_ab, method=_mv_front_m
            )
            med = jnp.asarray(self.mv_coder.z_tables.medians)
            z_sym = quantize(z, "symbols16", means=med)
            return y, z_sym, z_sym.astype(jnp.float32) + med

        def _res_front_m(m, xc, x_pred):
            return m.residual_compressor.analysis(xc - x_pred)

        def res_front(v, xc, x_pred):
            y, z = model.apply(v, xc, x_pred, method=_res_front_m)
            med = jnp.asarray(self.res_coder.z_tables.medians)
            z_sym = quantize(z, "symbols16", means=med)
            return y, z_sym, z_sym.astype(jnp.float32) + med

        self._mv_front = jax.jit(mv_front)
        self._res_front = jax.jit(res_front)
        self._compensate = jax.jit(
            lambda v, xb, xa, fcb, fca, size: model.apply(
                v, xb, xa, fcb, fca, size, method=LHBDC.motion_compensate
            ),
            static_argnums=(5,),
        )

    def _predict(self, x_before, x_after, mv_strings, mv_shape, flows=None):
        """Shared enc/dec prediction from refs + decoded MV stream.
        ``flows``: optional precomputed ``_motion_priors`` output (see
        ``_predict_batch`` for why reuse is bit-exact)."""
        size = (x_before.shape[1] // 4, x_before.shape[2] // 4)
        flow_ba, flow_ab = flows if flows is not None else self._motion_priors(
            self.variables, x_before, x_after
        )
        flow_hat = self.mv_coder.decompress(mv_strings, mv_shape)
        flow_cb_hat, flow_ca_hat = jnp.split(flow_hat, 2, axis=-1)
        flow_cb_hat = flow_cb_hat + flow_ab
        flow_ca_hat = flow_ca_hat + flow_ba
        return self._compensate(
            self.variables, x_before, x_after, flow_cb_hat, flow_ca_hat, size
        )

    def encode(self, x_before, x_current, x_after, rate_id: int = 0):
        return self.encode_recon(x_before, x_current, x_after, rate_id)[0]

    def encode_recon(self, x_before, x_current, x_after, rate_id: int = 0):
        """Encode + decoder-identical reconstruction in one pass.

        The sequence encoder (tpuvc.cli.encode_v) buffers reconstructions
        to code later hierarchy levels; re-running ``decode`` would repeat
        the flow estimation and compensation already done here, so the
        residual synthesis from the compress-side quantized latent (which
        is bit-identical to the decoder's) saves a full second forward.
        """
        from tpuvc.coder.container import BFrameBitstream

        flow_ba, flow_ab = self._motion_priors(
            self.variables, x_before, x_after
        )
        mv = self.mv_coder.compress_from(
            *self._mv_front(
                self.variables, x_current, x_before, x_after, flow_ba, flow_ab
            )
        )
        x_pred = self._predict(
            x_before, x_after, mv["strings"], mv["shape"],
            flows=(flow_ba, flow_ab),
        )
        res = self.res_coder.compress_from(
            *self._res_front(self.variables, x_current, x_pred)
        )
        bits = BFrameBitstream(
            rate_id=rate_id,
            mv_shape=tuple(mv["shape"]),
            res_shape=tuple(res["shape"]),
            mv_y=mv["strings"][0],
            mv_z=mv["strings"][1],
            res_y=res["strings"][0],
            res_z=res["strings"][1],
        )
        x_hat = x_pred + self.res_coder.synthesize(res["y_hat"])
        return bits, x_hat

    def decode(self, x_before, x_after, bitstream) -> jnp.ndarray:
        x_pred = self._predict(
            x_before, x_after, [bitstream.mv_y, bitstream.mv_z], bitstream.mv_shape
        )
        res_hat = self.res_coder.decompress(
            [bitstream.res_y, bitstream.res_z], bitstream.res_shape
        )
        return x_pred + res_hat

    def set_shard(self, shard):
        """Enable mesh-sharded level-batched coding: ``shard`` (from
        tpuvc.parallel.level_batch_sharder) places batch axes over the
        mesh. Applied to the inputs of every device stage on BOTH the
        encode and decode paths — the mesh size rides in the stream
        header (VSequenceBitstream.mesh) so decoders shard identically,
        which keeps the re-derived entropy parameters bit-identical."""
        self.shard = shard
        self.mv_coder.shard = shard
        self.res_coder.shard = shard

    def _predict_batch(self, x_before, x_after, mv_y_hat, flows=None):
        """Shared enc/dec batched prediction from refs + quantized MV
        latent. Every op runs at batch B — the decoder re-estimates flow
        from reconstructed references, so encoder and decoder MUST trace
        the same B-shaped graphs for the entropy decode to stay in sync
        (VSequenceBitstream mode=1).

        ``flows``: optional precomputed ``_motion_priors`` output for the
        same (x_before, x_after). The encoder already ran that exact
        jitted call for the MV front, and the decoder's recomputation here
        invokes the SAME compiled program on the same inputs — bitwise
        identical on TPU — so reusing the encoder's copy keeps enc/dec
        bit-exact while saving a full 4-flow SPyNet pass per encode chunk
        (~360 ms/chunk at 1080p B=4, PERF.md encode stage table)."""
        size = (x_before.shape[1] // 4, x_before.shape[2] // 4)
        flow_ba, flow_ab = flows if flows is not None else self._motion_priors(
            self.variables, x_before, x_after
        )
        flow_hat = self.mv_coder.synthesize(mv_y_hat)
        flow_cb_hat, flow_ca_hat = jnp.split(flow_hat, 2, axis=-1)
        return self._compensate(
            self.variables, x_before, x_after, flow_cb_hat + flow_ab,
            flow_ca_hat + flow_ba, size,
        )

    def encode_level_batch_async(self, x_before, x_current, x_after,
                                 rate_id: int = 0):
        """Batched real-bitstream coding of one hierarchy level with the
        host phases (symbol fetch + rANS packing) overlapped: every device
        graph is dispatched before any stream fetch blocks, and the
        returned ``resolve()`` callable materializes the per-frame
        BFrameBitstreams when the worker threads finish. The caller can
        dispatch the NEXT level's device work (which needs only x_hat)
        while this level's symbols stream back — encode's transfer time
        hides behind compute (VERDICT r2 task #4). Returns
        (resolve, x_hat (B, ...)) with x_hat decoder-identical."""
        from tpuvc.coder.container import BFrameBitstream

        if self.shard is not None:
            x_before, x_current, x_after = self.shard(
                (x_before, x_current, x_after)
            )
        flow_ba, flow_ab = self._motion_priors(
            self.variables, x_before, x_after
        )
        mv = self.mv_coder.compress_batch_async(
            *self._mv_front(
                self.variables, x_current, x_before, x_after, flow_ba, flow_ab
            )
        )
        x_pred = self._predict_batch(
            x_before, x_after, mv["y_hat"], flows=(flow_ba, flow_ab)
        )
        res = self.res_coder.compress_batch_async(
            *self._res_front(self.variables, x_current, x_pred)
        )
        x_hat = x_pred + self.res_coder.synthesize(res["y_hat"])
        batch = x_current.shape[0]
        # capture only futures + shapes — NOT the mv/res dicts, whose
        # y_hat device arrays would stay pinned per pending chunk
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

    def encode_level_batch(self, x_before, x_current, x_after,
                           rate_id: int = 0):
        """Batched real-bitstream coding of one hierarchy level: B
        independent frames share every device forward; host rANS packs one
        stream set per frame. Returns ([BFrameBitstream] * B, x_hat (B,...))
        with x_hat the decoder-identical reconstructions. Blocking variant
        of encode_level_batch_async."""
        resolve, x_hat = self.encode_level_batch_async(
            x_before, x_current, x_after, rate_id
        )
        return resolve(), x_hat

    def decode_level_batch_async(self, bitstreams):
        """Kick off one level's entropy decode NOW (reference-independent:
        host rANS + entropy-parameter graphs on workers) and return
        ``resolve(x_before, x_after)``, which runs the ref-dependent device
        tail (flow re-estimation, compensation, residual synthesis). A
        decode driver submits EVERY level's streams up front, then walks
        the hierarchy calling resolve as reconstructions become available
        — the host phases of later levels hide behind the device work of
        earlier ones, mirroring encode_level_batch_async (VERDICT r3 task
        #4; decode had serialized host-rANS -> upload -> synthesis)."""
        mv_f = self.mv_coder.decompress_batch_async(
            [(b.mv_y, b.mv_z) for b in bitstreams], bitstreams[0].mv_shape
        )
        res_f = self.res_coder.decompress_batch_async(
            [(b.res_y, b.res_z) for b in bitstreams], bitstreams[0].res_shape
        )

        def resolve(x_before, x_after):
            if self.shard is not None:
                x_before, x_after = self.shard((x_before, x_after))
            x_pred = self._predict_batch(x_before, x_after, mv_f.result())
            return x_pred + self.res_coder.synthesize(res_f.result())

        return resolve

    def decode_level_batch(self, x_before, x_after, bitstreams):
        """Batched decode of one hierarchy level's frames (inverse of
        encode_level_batch; same B-shaped graphs). Blocking wrapper of
        decode_level_batch_async."""
        return self.decode_level_batch_async(bitstreams)(x_before, x_after)
