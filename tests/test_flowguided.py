import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.models.flowguided_b import FlowGuidedB, convert_scales, get_scales

pytestmark = pytest.mark.slow


class TestScales:
    def test_get_scales_midpoint(self):
        s1, s2 = get_scales(4, 0, 8)
        assert s1 == 0.5 and s2 == 0.5

    def test_get_scales_asymmetric(self):
        s1, s2 = get_scales(2, 0, 8)
        assert s1 == 0.25 and s2 == 0.75

    def test_get_scales_degenerate(self):
        assert get_scales(5, 3, 3) == (0.0, 0.0)

    def test_convert_scales_rounding(self):
        s1, s2 = convert_scales(0.333333, 0.666666)
        np.testing.assert_allclose(float(s1), 0.33)
        np.testing.assert_allclose(float(s2), 0.67)


@pytest.fixture(scope="module")
def fgb():
    # feature channels must divide the 2*8 deform fusion groups
    model = FlowGuidedB(
        feature_channels=(16, 32, 48), N=32, M=32, levels=3,
        groups=(4, 4, 8, 16),
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        jax.random.key(0), x, x, x, 1, 0.5, -0.5, 1, "dequantize"
    )
    return model, variables


def _frames(rng, shape=(1, 64, 64, 3)):
    base = rng.random(shape, dtype=np.float32)
    drift = 0.04 * rng.standard_normal(shape).astype(np.float32)
    return (
        jnp.asarray(base),
        jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1),
        jnp.clip(jnp.asarray(base + drift), 0, 1),
    )


class TestFlowGuidedB:
    def test_forward(self, fgb, rng):
        model, variables = fgb
        x1, xc, x2 = _frames(rng)
        out = model.apply(variables, x1, x2, xc, 1, 0.5, -0.5, 1, "dequantize")
        assert out["x_hat"].shape == xc.shape
        assert np.isfinite(float(out["size"])) and float(out["size"]) > 0

    def test_down_ratio_2(self, fgb, rng):
        model, variables = fgb
        x1, xc, x2 = _frames(rng)
        out = model.apply(variables, x1, x2, xc, 0, 0.5, -0.5, 2, "dequantize")
        assert out["x_hat"].shape == xc.shape

    def test_traced_level_single_compile(self, fgb, rng):
        """The rate level s is traced: one jitted graph serves all levels."""
        model, variables = fgb
        x1, xc, x2 = _frames(rng)

        @jax.jit
        def f(v, s):
            return model.apply(v, x1, x2, xc, s, 0.5, -0.5, 1, "dequantize")[
                "size"
            ]

        s0 = float(f(variables, jnp.float32(0.0)))
        s2 = float(f(variables, jnp.float32(2.0)))
        sfrac = float(f(variables, jnp.float32(1.5)))
        assert np.isfinite(s0) and np.isfinite(s2) and np.isfinite(sfrac)

    def test_flowonly_prediction(self, fgb, rng):
        model, variables = fgb
        x1, xc, x2 = _frames(rng)
        pred = model.apply(
            variables, x1, x2, 0.5, -0.5, 1,
            method=FlowGuidedB.prediction_flowonly,
        )
        assert pred.shape == x1.shape

    def test_grads(self, fgb, rng):
        model, variables = fgb
        x1, xc, x2 = _frames(rng)

        def loss(p):
            out = model.apply(
                {"params": p}, x1, x2, xc, 1, 0.5, -0.5, 1, "ste"
            )
            return (
                0.01 * 255**2 * jnp.mean((out["x_hat"] - xc) ** 2)
                + out["rate"]
            )

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0
        # Gain parameters receive gradient (rate control is trainable).
        gain_g = g["offset_compressor"]["Gain"]
        assert float(jnp.abs(gain_g).sum()) > 0
