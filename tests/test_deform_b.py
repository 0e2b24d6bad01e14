import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.models.deform_b import DeformB

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def deformb():
    model = DeformB(
        feature_channels=(8, 16, 24), N=32, M=32, levels=3,
        groups=(4, 4, 8, 16),
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, x, x, 1, "dequantize")
    return model, variables


def _frames(rng, shape=(1, 64, 64, 3)):
    base = rng.random(shape, dtype=np.float32)
    drift = 0.04 * rng.standard_normal(shape).astype(np.float32)
    return (
        jnp.asarray(base),
        jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1),
        jnp.clip(jnp.asarray(base + drift), 0, 1),
    )


class TestDeformB:
    def test_forward(self, deformb, rng):
        model, variables = deformb
        x1, xc, x2 = _frames(rng)
        out = model.apply(variables, x1, x2, xc, 1, "dequantize")
        assert out["x_hat"].shape == xc.shape
        assert np.isfinite(float(out["size"])) and float(out["size"]) > 0

    def test_noise_training_mode(self, deformb, rng):
        model, variables = deformb
        x1, xc, x2 = _frames(rng)
        out = model.apply(
            variables, x1, x2, xc, 0, "noise", rng=jax.random.key(3)
        )
        assert np.isfinite(float(out["rate"]))

    def test_grads(self, deformb, rng):
        model, variables = deformb
        x1, xc, x2 = _frames(rng)

        def loss(p):
            out = model.apply(
                {"params": p}, x1, x2, xc, 1, "noise", rng=jax.random.key(4)
            )
            return (
                0.01 * 255**2 * jnp.mean((out["x_hat"] - xc) ** 2)
                + out["rate"]
            )

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0


class TestDeformBBitstream:
    def test_encode_decode_round_trip(self, deformb, rng):
        from tpuvc.coder.container import VFrameBitstream
        from tpuvc.models.deform_b import DeformBCoder

        model, variables = deformb
        x1, xc, x2 = _frames(rng)
        coder = DeformBCoder(model, variables)
        bits = coder.encode(x1, x2, xc, s=1.0)
        parsed = VFrameBitstream.deserialize(bits.serialize())
        x_hat = coder.decode(x1, x2, parsed)
        assert x_hat.shape == xc.shape
        x_hat2 = coder.decode(x1, x2, parsed)
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat2))

    def test_level_batch_round_trip(self, deformb, rng):
        """Batched decode reproduces batched encode bit-for-bit."""
        from tpuvc.coder.container import VFrameBitstream
        from tpuvc.models.deform_b import DeformBCoder

        model, variables = deformb
        a1, c1, b1 = _frames(rng)
        a2, c2, b2 = _frames(rng)
        import jax.numpy as jnp

        x1 = jnp.concatenate([a1, a2], axis=0)
        xc = jnp.concatenate([c1, c2], axis=0)
        x2 = jnp.concatenate([b1, b2], axis=0)
        coder = DeformBCoder(model, variables)
        bits, recon = coder.encode_level_batch(x1, x2, xc, s=1.0)
        assert len(bits) == 2
        parsed = [VFrameBitstream.deserialize(b.serialize()) for b in bits]
        x_hat = coder.decode_level_batch(x1, x2, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))

    def test_encode_recon_matches_decode(self, deformb, rng):
        from tpuvc.coder.container import VFrameBitstream
        from tpuvc.models.deform_b import DeformBCoder

        model, variables = deformb
        x1, xc, x2 = _frames(rng)
        coder = DeformBCoder(model, variables)
        bits, recon = coder.encode_recon(x1, x2, xc, s=1.0)
        parsed = VFrameBitstream.deserialize(bits.serialize())
        x_hat = coder.decode(x1, x2, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))


class TestMeshShardedCoding:
    """Mesh-sharded v3 level batches (VSequenceBitstream.mesh contract):
    sharded batched decode reproduces sharded batched encode bit-for-bit."""

    def test_mesh2_batch2_round_trip(self, deformb, rng):
        import jax
        import jax.numpy as jnp

        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        from tpuvc.coder.container import VFrameBitstream
        from tpuvc.models.deform_b import DeformBCoder
        from tpuvc.parallel.mesh import level_batch_sharder, make_mesh

        model, variables = deformb
        a1, c1, b1 = _frames(rng)
        a2, c2, b2 = _frames(rng)
        x1 = jnp.concatenate([a1, a2], axis=0)
        xc = jnp.concatenate([c1, c2], axis=0)
        x2 = jnp.concatenate([b1, b2], axis=0)
        coder = DeformBCoder(model, variables)
        coder.set_shard(level_batch_sharder(make_mesh(2)))
        bits, recon = coder.encode_level_batch(x1, x2, xc, s=1.0)
        parsed = [VFrameBitstream.deserialize(b.serialize()) for b in bits]
        x_hat = coder.decode_level_batch(x1, x2, parsed)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x_hat))
