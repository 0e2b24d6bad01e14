"""Real-bitstream round trip for the v4 codec (beyond-reference capability:
the reference evaluates v3/v4 B-frames from likelihoods only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.coder.container import VFrameBitstream
from tpuvc.models.flowguided_b import FlowGuidedB, FlowGuidedBCoder

pytestmark = pytest.mark.slow


class TestVFrameContainer:
    def test_round_trip(self):
        b = VFrameBitstream(
            s_milli=1500, down_ratio=2, scale1_centi=50, scale2_centi=-50,
            z_shape=(3, 4), streams=[b"aa", b"", b"xyz"],
        )
        blob = b.serialize()
        assert len(blob) == b.num_bytes
        d = VFrameBitstream.deserialize(blob)
        assert d == b


@pytest.fixture(scope="module")
def fgb_coder():
    model = FlowGuidedB(
        feature_channels=(16, 32, 48), N=32, M=32, levels=3,
        groups=(4, 4, 8, 16),
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        jax.random.key(0), x, x, x, 1, 0.5, -0.5, 1, "dequantize"
    )
    return model, variables, FlowGuidedBCoder(model, variables)


class TestFlowGuidedBitstream:
    def test_encode_decode(self, fgb_coder, rng):
        model, variables, coder = fgb_coder
        base = rng.random((1, 64, 64, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        x1 = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        x2 = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits = coder.encode(x1, x2, xc, s=1.0, scale1=0.5, scale2=-0.5)
        # z + 2 per group, for each of the two codecs
        assert len(bits.streams) == 2 * (1 + 2 * len(model.groups))
        blob = bits.serialize()
        parsed = VFrameBitstream.deserialize(blob)
        x_hat = coder.decode(x1, x2, parsed)
        assert x_hat.shape == xc.shape
        assert np.all(np.isfinite(np.asarray(x_hat)))
        x_hat2 = coder.decode(x1, x2, parsed)
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat2))

    def test_level_batch_round_trip(self, fgb_coder, rng):
        """Batched decode reproduces batched encode bit-for-bit."""
        model, variables, coder = fgb_coder
        base = rng.random((2, 64, 64, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        x1 = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        x2 = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits, recon = coder.encode_level_batch(
            x1, x2, xc, s=1.0, scale1=0.5, scale2=-0.5
        )
        assert len(bits) == 2
        parsed = [VFrameBitstream.deserialize(b.serialize()) for b in bits]
        x_hat = coder.decode_level_batch(x1, x2, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))

    def test_encode_recon_matches_decode(self, fgb_coder, rng):
        model, variables, coder = fgb_coder
        base = rng.random((1, 64, 64, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        x1 = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        x2 = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits, recon = coder.encode_recon(
            x1, x2, xc, s=1.0, scale1=0.5, scale2=-0.5
        )
        parsed = VFrameBitstream.deserialize(bits.serialize())
        x_hat = coder.decode(x1, x2, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))

    def test_stream_bits_close_to_likelihood_bits(self, fgb_coder, rng):
        model, variables, coder = fgb_coder
        base = rng.random((1, 64, 64, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        x1 = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        x2 = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits = coder.encode(x1, x2, xc, s=1.0, scale1=0.5, scale2=-0.5)
        out = model.apply(
            variables, x1, x2, xc, 1.0, 0.5, -0.5, 1, "dequantize"
        )
        est = float(out["size"])
        real = bits.num_bytes * 8
        # 22 separate rANS streams carry fixed state/container overhead;
        # beyond that, the mean-centered coding should track the estimate.
        overhead_bits = (len(bits.streams) * 8 + 64) * 8
        assert real < est * 1.25 + overhead_bits, (real, est)


class TestMeshShardedCoding:
    """Mesh-sharded v4 level batches: with the same level_batch_sharder on
    both sides (the VSequenceBitstream.mesh contract), batched decode
    reproduces batched encode reconstructions bit-for-bit — the CondELIC
    group loop's entropy parameters are re-derived identically under the
    partitioned programs."""

    def test_mesh2_batch2_round_trip(self, fgb_coder, rng):
        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        from tpuvc.parallel.mesh import level_batch_sharder, make_mesh

        model, variables, _ = fgb_coder
        coder = FlowGuidedBCoder(model, variables)
        coder.set_shard(level_batch_sharder(make_mesh(2)))
        base = rng.random((2, 64, 64, 3), dtype=np.float32)
        drift = 0.03 * rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        x1 = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        x2 = jnp.clip(jnp.asarray(base + drift), 0, 1)

        bits, recon = coder.encode_level_batch(
            x1, x2, xc, s=1.0, scale1=0.5, scale2=-0.5
        )
        parsed = [VFrameBitstream.deserialize(b.serialize()) for b in bits]
        x_hat = coder.decode_level_batch(x1, x2, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))
        # And the mesh-coded streams are decodable by an unsharded decoder
        # ONLY if it shards the same way — assert the sharded decode is
        # also deterministic across a second replay.
        x_hat2 = coder.decode_level_batch(x1, x2, parsed)
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat2))
