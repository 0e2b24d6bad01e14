import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.models.elic import ELIC, ELICCoder
from tpuvc.ops.checkerboard import (
    CheckerboardConv,
    anchor_mask,
    checkerboard_kernel_mask,
    keep_anchor,
    keep_non_anchor,
)


class TestCheckerboard:
    def test_anchor_mask_pattern(self):
        m = np.asarray(anchor_mask(4, 4))
        # anchor at (h+w) odd: (0,1),(1,0),...
        assert m[0, 1] == 1 and m[1, 0] == 1
        assert m[0, 0] == 0 and m[1, 1] == 0
        assert m.sum() == 8

    def test_keep_anchor_complement(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(keep_anchor(x) + keep_non_anchor(x)), np.asarray(x)
        )

    def test_kernel_mask(self):
        m = checkerboard_kernel_mask(5)
        assert m[2, 2] == 0  # center tap excluded
        assert m[0, 1] == 1 and m[1, 0] == 1
        assert m.sum() == 12

    def test_conv_causal_at_non_anchor_outputs(self, rng):
        """The kernel's odd-parity taps flip the checkerboard parity, so the
        conv's *non-anchor* outputs (the only ones consumed — anchors get
        context zeroed) depend only on *anchor* inputs: perturbing non-anchor
        cells must not change them. This is what makes two-phase decode
        causal."""
        conv = CheckerboardConv(4)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
        v = conv.init(jax.random.key(0), x)
        base = conv.apply(v, keep_anchor(x))
        pert = keep_anchor(x) + keep_non_anchor(
            jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
        )
        out = conv.apply(v, pert)
        np.testing.assert_allclose(
            np.asarray(keep_non_anchor(base)),
            np.asarray(keep_non_anchor(out)),
            atol=1e-6,
        )


@pytest.fixture(scope="module")
def elic():
    # Tiny config for test speed: N=32, M=48, groups summing to 48.
    model = ELIC(N=32, M=48, groups=(4, 4, 8, 32))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, "dequantize")
    return model, variables


class TestELIC:
    def test_forward(self, elic, rng):
        model, variables = elic
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        out = model.apply(variables, x, "dequantize")
        assert out["x_hat"].shape == x.shape
        assert set(out["likelihoods"]) == {"z", "y_0", "y_1", "y_2", "y_3"}
        bits = model.apply(
            variables, out["likelihoods"], method=ELIC.bits
        )
        assert np.isfinite(float(bits)) and float(bits) > 0

    def test_forward_stage2(self, elic, rng):
        model, variables = elic
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        out = model.apply(variables, x, "dequantize", stage2=True)
        assert out["x_hat"].shape == x.shape

    @pytest.mark.slow
    def test_noise_mode_grads(self, elic, rng):
        model, variables = elic
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))

        def loss(p):
            out = model.apply(
                {"params": p}, x, "noise", rng=jax.random.key(1)
            )
            bits = sum(
                -jnp.sum(jnp.log2(jnp.maximum(l, 1e-9)))
                for l in out["likelihoods"].values()
            )
            return jnp.mean((out["x_hat"] - x) ** 2) * 255**2 * 0.01 + bits / (
                64 * 64
            )

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0

    def test_compress_decompress_round_trip(self, elic, rng):
        model, variables = elic
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        coder = ELICCoder(model, variables)
        out = coder.compress(x)
        assert len(out["strings"][0]) == 2 * len(model.groups)
        x_hat = coder.decompress(out["strings"], out["shape"])
        assert x_hat.shape == x.shape
        # The decoder's y_hat path must match the encoder's reconstruction.
        x_hat_enc = coder._synthesis(variables, out["y_hat"])
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat_enc))
