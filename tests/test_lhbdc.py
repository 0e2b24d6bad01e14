import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.models.lhbdc import LHBDC


@pytest.fixture(scope="module")
def model_and_vars():
    model = LHBDC(N=32)
    rng = jax.random.key(0)
    shape = (1, 192, 192, 3)
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(rng, x, x, x, "dequantize")
    return model, variables


def _frames(rng, shape=(1, 192, 192, 3)):
    base = rng.random(shape, dtype=np.float32)
    drift = 0.05 * rng.standard_normal(shape).astype(np.float32)
    return (
        jnp.asarray(base),
        jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1),
        jnp.clip(jnp.asarray(base + drift), 0, 1),
    )


class TestLHBDC:
    def test_forward_shapes(self, model_and_vars, rng):
        model, variables = model_and_vars
        xb, xc, xa = _frames(rng)
        out = model.apply(variables, xb, xc, xa, "dequantize")
        assert out["x_hat"].shape == xc.shape
        assert np.isfinite(float(out["bits"]))
        assert float(out["bits"]) > 0
        assert float(out["rate"]) > 0

    def test_train_mode_noise(self, model_and_vars, rng):
        model, variables = model_and_vars
        xb, xc, xa = _frames(rng)
        out = model.apply(
            variables, xb, xc, xa, "noise", rng=jax.random.key(1)
        )
        assert np.isfinite(float(out["rate"]))

    def test_eval_deterministic(self, model_and_vars, rng):
        model, variables = model_and_vars
        xb, xc, xa = _frames(rng)
        f = jax.jit(lambda v, a, b, c: model.apply(v, a, b, c, "dequantize"))
        o1 = f(variables, xb, xc, xa)
        o2 = f(variables, xb, xc, xa)
        np.testing.assert_array_equal(
            np.asarray(o1["x_hat"]), np.asarray(o2["x_hat"])
        )

    @pytest.mark.slow
    def test_grad_flows(self, model_and_vars, rng):
        model, variables = model_and_vars
        xb, xc, xa = _frames(rng)

        def loss_fn(v):
            out = model.apply(
                variables | {"params": v}, xb, xc, xa, "noise",
                rng=jax.random.key(2),
            )
            mse = jnp.mean((out["x_hat"] - xc) ** 2)
            return 3141.0 * mse + out["rate"]

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree.leaves(g)
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert np.isfinite(total) and total > 0
        # SPyNet gets gradient through the coded flow differences.
        spy = jax.tree.leaves(g["flownet"])
        assert sum(float(jnp.abs(l).sum()) for l in spy) > 0

    def test_aux_loss(self, model_and_vars):
        model, variables = model_and_vars
        val = model.apply(variables, method=LHBDC.aux_loss)
        assert np.isfinite(float(val))
