import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.models.flexrate import (
    BidirFlowRef,
    FlexRateCoder,
    GainModule,
)


class TestGainModule:
    def test_level_selection(self):
        gm = GainModule(n_levels=4, channels=8)
        v = gm.init(jax.random.key(0), jnp.ones((1, 2, 2, 8)), 0)
        v = {"params": {"gain_matrix": jnp.asarray(
            np.arange(1, 33, dtype=np.float32).reshape(4, 8)
        )}}
        x = jnp.ones((1, 2, 2, 8))
        out = gm.apply(v, x, 1)
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.arange(9, 17))

    def test_interpolation_geometric(self):
        gm = GainModule(n_levels=4, channels=2)
        v = {"params": {"gain_matrix": jnp.asarray(
            [[1.0, 1.0], [2.0, 4.0], [8.0, 16.0], [1.0, 1.0]], jnp.float32
        )}}
        x = jnp.ones((1, 1, 1, 2))
        # l=0.5 between levels 1 and 2: sqrt(2*8)=4, sqrt(4*16)=8
        out = gm.apply(v, x, 1, 0.5)
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [4.0, 8.0], rtol=1e-6)
        # l=1 -> pure level
        out = gm.apply(v, x, 1, 1.0)
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [2.0, 4.0], rtol=1e-6)

    def test_per_sample_levels(self):
        gm = GainModule(n_levels=3, channels=2)
        v = {"params": {"gain_matrix": jnp.asarray(
            [[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]], jnp.float32
        )}}
        x = jnp.ones((2, 1, 1, 2))
        out = gm.apply(v, x, jnp.asarray([0, 2]))
        np.testing.assert_allclose(np.asarray(out[:, 0, 0, 0]), [1.0, 3.0])


@pytest.fixture(scope="module")
def flex():
    model = BidirFlowRef(n_levels=4, N=32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, x, x, 0, 1.0, "dequantize")
    return model, variables


def _frames(rng, shape=(1, 128, 128, 3)):
    base = rng.random(shape, dtype=np.float32)
    drift = 0.04 * rng.standard_normal(shape).astype(np.float32)
    return (
        jnp.asarray(base),
        jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1),
        jnp.clip(jnp.asarray(base + drift), 0, 1),
    )


class TestBidirFlowRef:
    def test_forward(self, flex, rng):
        model, variables = flex
        xb, xc, xa = _frames(rng)
        out = model.apply(variables, xb, xc, xa, 1, 1.0, "dequantize")
        assert out["x_hat"].shape == xc.shape
        assert out["size"].shape == (1,)  # per-sample bits
        assert float(out["size"][0]) > 0

    def test_rate_changes_with_level(self, flex, rng):
        model, variables = flex
        xb, xc, xa = _frames(rng)
        sizes = []
        # Scale gains apart so levels actually differ even untrained.
        p = variables["params"]
        for comp in ("flow_compressor", "residual_compressor"):
            gm = np.ones((4, 32), np.float32)
            for i in range(4):
                gm[i] *= 2.0**i
            p[comp]["gain_unit"]["gain_matrix"] = jnp.asarray(gm)
        for n in (0, 2):
            out = model.apply(variables, xb, xc, xa, n, 1.0, "dequantize")
            sizes.append(float(out["size"][0]))
        # Larger gain -> wider latent -> more bits.
        assert sizes[1] > sizes[0]

    def test_bitstream_round_trip(self, flex, rng):
        model, variables = flex
        xb, xc, xa = _frames(rng)
        coder = FlexRateCoder(model, variables)
        bits = coder.encode(xb, xc, xa, n=1, l=0.7)
        blob = bits.serialize()
        from tpuvc.coder.container import BFrameBitstream

        parsed = BFrameBitstream.deserialize(blob)
        n, l = FlexRateCoder.parse_rate_id(parsed.rate_id)
        assert n == 1 and abs(l - 0.7) < 1e-9
        x_hat = coder.decode(xb, xa, parsed)
        assert x_hat.shape == xc.shape
        x_hat2 = coder.decode(xb, xa, parsed)
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat2))

    def test_level_batch_round_trip(self, flex, rng):
        """Batched decode reproduces batched encode bit-for-bit."""
        model, variables = flex
        xb1, xc1, xa1 = _frames(rng)
        xb2, xc2, xa2 = _frames(rng)
        xb = jnp.concatenate([xb1, xb2], axis=0)
        xc = jnp.concatenate([xc1, xc2], axis=0)
        xa = jnp.concatenate([xa1, xa2], axis=0)
        coder = FlexRateCoder(model, variables)
        bits, recon = coder.encode_level_batch(xb, xc, xa, n=1, l=0.7)
        assert len(bits) == 2
        from tpuvc.coder.container import BFrameBitstream

        parsed = [BFrameBitstream.deserialize(b.serialize()) for b in bits]
        x_hat = coder.decode_level_batch(xb, xa, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))

    def test_encode_recon_matches_decode(self, flex, rng):
        model, variables = flex
        xb, xc, xa = _frames(rng)
        coder = FlexRateCoder(model, variables)
        bits, recon = coder.encode_recon(xb, xc, xa, n=1, l=0.7)
        from tpuvc.coder.container import BFrameBitstream

        parsed = BFrameBitstream.deserialize(bits.serialize())
        x_hat = coder.decode(xb, xa, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))
