"""End-to-end real-bitstream tests: the encode->decode round trip is the
codec-correctness property (the reference's only implicit test, made
explicit; SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.coder.container import BFrameBitstream
from tpuvc.models.lhbdc import LHBDC, LHBDCCoder

pytestmark = pytest.mark.slow


class TestContainer:
    def test_tpv2_backcompat(self):
        """A hand-packed pre-mesh TPV2 header + one frame record parses
        with mesh=1 and intact frames (the documented back-compat path in
        VSequenceBitstream.deserialize)."""
        import struct

        from tpuvc.coder.container import B_FAMILY_IDS, VSequenceBitstream

        blob_payload = b"frame-bytes"
        header = struct.pack(
            VSequenceBitstream.HEADER_V2, b"TPV2",
            B_FAMILY_IDS["lhbdc"], 320, 192, 16, 1, 0, 4, 0, 2,
        )
        record = struct.pack("<BHI", 0, 0, len(blob_payload)) + blob_payload
        seq = VSequenceBitstream.deserialize(header + record)
        assert seq.mesh == 1
        assert seq.family == "lhbdc"
        assert seq.window_gops == 2
        assert seq.frames == [("I", 0, blob_payload)]

    def test_mesh_header_range(self):
        from tpuvc.coder.container import VSequenceBitstream

        seq = VSequenceBitstream(
            family="lhbdc", width=64, height=64, gop=16, n_frames=0,
            mesh=256,
        )
        with pytest.raises(ValueError, match="uint8"):
            seq.serialize()

    def test_round_trip(self):
        b = BFrameBitstream(
            rate_id=1626,
            mv_shape=(5, 8),
            res_shape=(12, 20),
            mv_y=b"abc",
            mv_z=b"defg",
            res_y=b"\x00\x01",
            res_z=b"tail-bytes",
        )
        blob = b.serialize()
        assert len(blob) == b.num_bytes
        d = BFrameBitstream.deserialize(blob)
        assert d == b


@pytest.fixture(scope="module")
def coder():
    model = LHBDC(N=32)
    x = jnp.zeros((1, 192, 192, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, x, x, "dequantize")
    return model, variables, LHBDCCoder(model, variables)


class TestLHBDCBitstream:
    def test_encode_decode_round_trip(self, coder, rng):
        model, variables, c = coder
        base = rng.random((1, 192, 192, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((1, 192, 192, 3)).astype(np.float32)
        xb = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        xa = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits = c.encode(xb, xc, xa, rate_id=845)
        blob = bits.serialize()
        parsed = BFrameBitstream.deserialize(blob)
        x_hat = c.decode(xb, xa, parsed)
        assert x_hat.shape == xc.shape
        assert np.all(np.isfinite(np.asarray(x_hat)))

        # Decode must be reproducible bit-for-bit.
        x_hat2 = c.decode(xb, xa, parsed)
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat2))

    def test_stream_bits_close_to_likelihood_bits(self, coder, rng):
        model, variables, c = coder
        base = rng.random((1, 192, 192, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((1, 192, 192, 3)).astype(np.float32)
        xb = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        xa = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits = c.encode(xb, xc, xa)
        out = model.apply(variables, xb, xc, xa, "dequantize")
        est_bits = float(out["bits"])
        real_bits = bits.num_bytes * 8
        # Real streams carry rANS + container overhead; they must agree to
        # within ~10% + a fixed overhead (SURVEY.md 7.3 item 6).
        assert real_bits < est_bits * 1.10 + 1500, (real_bits, est_bits)
        assert real_bits > est_bits * 0.85 - 200, (real_bits, est_bits)


class TestEncodeRecon:
    """encode_recon must return exactly the decoder's reconstruction."""

    def test_lhbdc(self, coder, rng):
        model, variables, c = coder
        base = rng.random((1, 192, 192, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((1, 192, 192, 3)).astype(np.float32)
        xb = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        xa = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits, recon = c.encode_recon(xb, xc, xa, rate_id=845)
        parsed = BFrameBitstream.deserialize(bits.serialize())
        x_hat = c.decode(xb, xa, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))


class TestLevelBatchCoding:
    """Batched real coding: decode_level_batch must reproduce
    encode_level_batch's reconstructions bit-for-bit (same B-shaped
    graphs on both sides)."""

    def test_batch2_round_trip(self, coder, rng):
        model, variables, c = coder
        base = rng.random((2, 192, 192, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((2, 192, 192, 3)).astype(np.float32)
        xb = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        xa = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits, recon = c.encode_level_batch(xb, xc, xa, rate_id=845)
        assert len(bits) == 2
        parsed = [BFrameBitstream.deserialize(b.serialize()) for b in bits]
        x_hat = c.decode_level_batch(xb, xa, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))
        # Streams are per-frame: each must also differ (different content).
        assert bits[0].res_y != bits[1].res_y


class TestMeshShardedCoding:
    """Mesh-sharded level batches: with the same level_batch_sharder on
    both sides (the VSequenceBitstream.mesh contract), batched decode
    reproduces batched encode reconstructions bit-for-bit."""

    def test_mesh2_batch2_round_trip(self, coder, rng):
        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        from tpuvc.parallel.mesh import level_batch_sharder, make_mesh

        model, variables, _ = coder
        c = LHBDCCoder(model, variables)
        c.set_shard(level_batch_sharder(make_mesh(2)))
        base = rng.random((2, 192, 192, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((2, 192, 192, 3)).astype(np.float32)
        xb = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        xa = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits, recon = c.encode_level_batch(xb, xc, xa, rate_id=845)
        parsed = [BFrameBitstream.deserialize(b.serialize()) for b in bits]
        x_hat = c.decode_level_batch(xb, xa, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))

    def test_mesh2_flexrate_round_trip(self, rng):
        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        from tpuvc.models.flexrate import BidirFlowRef, FlexRateCoder
        from tpuvc.parallel.mesh import level_batch_sharder, make_mesh

        model = BidirFlowRef(N=32)
        x0 = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = model.init(
            jax.random.key(2), x0, x0, x0, 0, 1.0, "dequantize"
        )
        c = FlexRateCoder(model, variables)
        c.set_shard(level_batch_sharder(make_mesh(2)))
        base = rng.random((2, 128, 128, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
        xb = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        xa = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits, recon = c.encode_level_batch(xb, xc, xa, n=1, l=0.7)
        parsed = [BFrameBitstream.deserialize(b.serialize()) for b in bits]
        x_hat = c.decode_level_batch(xb, xa, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))


class TestMixedPrecisionCoding:
    """bf16 layer compute is symmetric: decode traced under the same
    policy reproduces the encoder's reconstruction bit-for-bit (the
    VSequenceBitstream dtype header contract)."""

    def test_bf16_round_trip(self, rng):
        from tpuvc.ops.precision import mixed_precision

        model = LHBDC(N=32)
        x0 = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = model.init(jax.random.key(1), x0, x0, x0, "dequantize")
        c = LHBDCCoder(model, variables)
        base = rng.random((1, 128, 128, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
        xb = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        xa = jnp.clip(jnp.asarray(base + drift), 0, 1)

        with mixed_precision():
            bits, recon = c.encode_recon(xb, xc, xa, rate_id=845)
            parsed = BFrameBitstream.deserialize(bits.serialize())
            x_hat = c.decode(xb, xa, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))
