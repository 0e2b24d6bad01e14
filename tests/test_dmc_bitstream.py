"""Real-bitstream round trip for the P-frame DMC codec.

The reference's stream path is OJSP2025/video_model.py:402-528
(compress/decompress + write_ip); this covers tpuvc's equivalent:
PFrameBitstream container, host rANS coding of mv/frame latents, decoder
reconstruction purely from the DPB + stream, and stream-vs-likelihood bit
agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.coder.container import PFrameBitstream
from tpuvc.models.dmc import PFrameDMC, PFrameDMCCoder

pytestmark = pytest.mark.slow


class TestPFrameContainer:
    def test_round_trip(self):
        b = PFrameBitstream(
            q_milli=2500, ratio_centi=275, z_shape=(2, 2),
            streams=[b"ab", b"", b"xyz", b"q"],
        )
        blob = b.serialize()
        assert len(blob) == b.num_bytes
        assert PFrameBitstream.deserialize(blob) == b


@pytest.fixture(scope="module")
def dmc_coder():
    model = PFrameDMC(feat=16, N=32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    dpb = {"ref_frame": x, "ref_feature": None, "ref_down_ratio": 1.0}
    variables = model.init(jax.random.key(0), x, dpb, 1.0, "dequantize")
    return model, variables, PFrameDMCCoder(model, variables)


def _pair(rng, shape=(1, 128, 128, 3)):
    base = rng.random(shape, dtype=np.float32)
    drift = 0.03 * rng.standard_normal(shape).astype(np.float32)
    return jnp.asarray(base), jnp.clip(jnp.asarray(base + drift), 0, 1)


class TestPFrameDMCBitstream:
    def test_encode_decode(self, dmc_coder, rng):
        model, variables, coder = dmc_coder
        ref, x = _pair(rng)
        dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}

        bits, enc_dpb = coder.encode(x, dpb, ratio=1.0, q=1.0)
        # mv four-part streams + mv z + frame four-part streams + frame z
        assert len(bits.streams) == 10
        blob = bits.serialize()
        parsed = PFrameBitstream.deserialize(blob)
        x_hat, dec_dpb = coder.decode(dpb, parsed)
        assert x_hat.shape == x.shape
        assert np.all(np.isfinite(np.asarray(x_hat)))
        # encoder and decoder reconstructions agree exactly (the propagated
        # DPB feature must match or drift compounds across frames)
        np.testing.assert_array_equal(
            np.asarray(enc_dpb["ref_frame"]), np.asarray(dec_dpb["ref_frame"])
        )
        np.testing.assert_array_equal(
            np.asarray(enc_dpb["ref_feature"]),
            np.asarray(dec_dpb["ref_feature"]),
        )
        # deterministic decode
        x_hat2, _ = coder.decode(dpb, parsed)
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat2))

    def test_chained_frames(self, dmc_coder, rng):
        model, variables, coder = dmc_coder
        ref, x1 = _pair(rng)
        _, x2 = _pair(rng)
        enc_dpb = {"ref_frame": ref, "ref_feature": None,
                   "ref_down_ratio": 1.0}
        dec_dpb = dict(enc_dpb)
        for x in (x1, x2):
            bits, enc_dpb = coder.encode(x, enc_dpb, ratio=1.0, q=0.0)
            x_hat, dec_dpb = coder.decode(
                dec_dpb, PFrameBitstream.deserialize(bits.serialize())
            )
            np.testing.assert_array_equal(
                np.asarray(enc_dpb["ref_frame"]),
                np.asarray(dec_dpb["ref_frame"]),
            )

    def test_fractional_ratio_round_trip(self, dmc_coder, rng):
        model, variables, coder = dmc_coder
        ref, x = _pair(rng)
        dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}
        bits, _ = coder.encode(x, dpb, ratio=1.25, q=0.5)
        assert bits.ratio_centi == 125
        x_hat, _ = coder.decode(dpb, bits)
        assert np.all(np.isfinite(np.asarray(x_hat)))

    def test_stream_bits_close_to_likelihood_bits(self, dmc_coder, rng):
        model, variables, coder = dmc_coder
        ref, x = _pair(rng)
        dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}
        bits, _ = coder.encode(x, dpb, ratio=1.0, q=0.0)
        stream_bits = 8 * sum(len(s) for s in bits.streams)
        out = model.apply(variables, x, dpb, 1.0, "dequantize")
        lik_bits = float(out["bits"])
        # rANS overhead: per-stream flush + untrained-model mismatch headroom
        assert stream_bits < lik_bits * 1.15 + 8 * 64
        assert stream_bits > lik_bits * 0.7
