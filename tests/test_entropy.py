import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.coder import decode_with_indexes, encode_with_indexes
from tpuvc.entropy import (
    FactorizedBottleneck,
    GaussianConditional,
    likelihood_to_bits,
    lower_bound,
    ste_round,
)
from tpuvc.entropy.bottleneck import FactorizedTables
from tpuvc.entropy.quant import quantize


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.5, 2.0])
        np.testing.assert_allclose(np.asarray(lower_bound(x, 1.0)), [1, 1, 2])

    def test_gradient_pass_through_above(self):
        g = jax.grad(lambda x: lower_bound(x, 1.0))(2.0)
        assert g == 1.0

    def test_gradient_blocked_below_when_pushing_down(self):
        # Below the bound, a positive incoming grad (pushing x down in
        # gradient descent) is blocked...
        g = jax.grad(lambda x: lower_bound(x, 1.0))(0.5)
        assert g == 0.0
        # ...but a negative incoming grad (pushing x up) passes.
        g = jax.grad(lambda x: -lower_bound(x, 1.0))(0.5)
        assert g == -1.0


class TestSteRound:
    def test_value_and_grad(self):
        x = jnp.array(1.3)
        assert float(ste_round(x)) == 1.0
        assert float(jax.grad(lambda v: ste_round(v))(x)) == 1.0


class TestQuantize:
    def test_noise_bounded(self, rng):
        x = jnp.zeros((1000,))
        q = quantize(x, "noise", rng=jax.random.key(0))
        assert float(jnp.abs(q).max()) <= 0.5

    def test_dequantize_with_means(self):
        x = jnp.array([1.2, -0.7])
        m = jnp.array([1.0, -1.0])
        np.testing.assert_allclose(
            np.asarray(quantize(x, "dequantize", means=m)), [1.0, -1.0]
        )

    def test_symbols(self):
        x = jnp.array([1.6, -0.7])
        s = quantize(x, "symbols", means=jnp.array([0.5, 0.0]))
        assert s.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(s), [1, -1])


class TestFactorizedBottleneck:
    @pytest.fixture
    def eb(self):
        m = FactorizedBottleneck(channels=8)
        variables = m.init(jax.random.key(0), jnp.zeros((1, 4, 4, 8)), "dequantize")
        return m, variables

    def test_likelihood_shape_and_range(self, eb, rng):
        m, variables = eb
        y = jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)
        y_hat, lik = m.apply(variables, y, "dequantize")
        assert lik.shape == y.shape
        assert float(lik.min()) > 0 and float(lik.max()) <= 1.0

    def test_pmf_sums_to_one(self, eb):
        # Integrated over a wide integer grid the likelihood is ~1 per channel.
        m, variables = eb
        grid = jnp.arange(-120, 121, dtype=jnp.float32)
        y = jnp.tile(grid[:, None], (1, 8))[None, :, None, :]  # (1,241,1,8)
        _, lik = m.apply(variables, y, "dequantize")
        total = np.asarray(lik.sum(axis=(0, 1, 2)))
        np.testing.assert_allclose(total, 1.0, atol=1e-3)

    def test_aux_loss_scalar_and_grad(self, eb):
        m, variables = eb

        def loss(v):
            return m.apply(v, method=FactorizedBottleneck.aux_loss)

        val = loss(variables)
        assert np.isfinite(float(val))
        g = jax.grad(lambda v: loss(v))(variables)
        qg = np.asarray(g["params"]["quantiles"])
        assert np.abs(qg).sum() > 0
        # Model params must receive no aux gradient.
        assert float(np.abs(np.asarray(g["params"]["matrix_0"])).sum()) == 0.0

    def test_rate_estimate_matches_real_bits(self, eb, rng):
        # bits from -log2 likelihood ~ bytes from the real rANS stream.
        m, variables = eb
        y = jnp.asarray(2.0 * rng.standard_normal((1, 16, 16, 8)), jnp.float32)
        tables = FactorizedTables.from_module(m, variables)
        med = jnp.asarray(tables.medians)
        symbols = np.asarray(quantize(y, "symbols", means=med)).ravel()
        y_hat = quantize(y, "dequantize", means=med)
        _, lik = m.apply(variables, y_hat, "dequantize")
        est_bits = float(likelihood_to_bits(lik))
        c = np.tile(np.arange(8, dtype=np.int32), 16 * 16)
        stream = encode_with_indexes(
            symbols, c, tables.cdfs, tables.cdf_lengths, tables.offsets
        )
        real_bits = len(stream) * 8
        assert abs(real_bits - est_bits) < 0.05 * est_bits + 64, (
            real_bits,
            est_bits,
        )
        dec = decode_with_indexes(
            stream, c, tables.cdfs, tables.cdf_lengths, tables.offsets
        )
        np.testing.assert_array_equal(dec, symbols)


class TestGaussianConditional:
    def test_likelihood_integrates_to_one(self):
        gc = GaussianConditional()
        grid = jnp.arange(-40.0, 41.0)
        scales = jnp.full_like(grid, 2.5)
        lik = gc.likelihood(grid, scales)
        np.testing.assert_allclose(float(lik.sum()), 1.0, atol=1e-4)

    def test_likelihood_with_means(self):
        gc = GaussianConditional()
        lik_centered = gc.likelihood(jnp.array([3.0]), jnp.array([1.0]),
                                     means=jnp.array([3.0]))
        lik_zero = gc.likelihood(jnp.array([0.0]), jnp.array([1.0]))
        np.testing.assert_allclose(
            float(lik_centered[0]), float(lik_zero[0]), rtol=1e-6
        )

    def test_build_indexes(self):
        gc = GaussianConditional()
        idx = np.asarray(gc.build_indexes(jnp.array([0.01, 0.11, 300.0])))
        assert idx[0] == 0  # below bound -> smallest scale
        assert idx[1] == 0
        assert idx[2] == 63  # above max -> largest scale

    def test_index_scale_covers(self):
        # table[idx] >= scale for every scale within range
        gc = GaussianConditional()
        scales = jnp.asarray(np.random.default_rng(1).uniform(0.11, 256, 100))
        idx = np.asarray(gc.build_indexes(scales))
        assert np.all(gc.scale_table[idx] >= np.asarray(scales) - 1e-9)
        assert np.all(
            (idx == 0) | (gc.scale_table[np.maximum(idx - 1, 0)] < np.asarray(scales))
        )

    def test_rate_estimate_matches_real_bits(self, rng):
        gc = GaussianConditional()
        tables = gc.build_tables()
        n = 4096
        scales_true = rng.uniform(0.3, 8.0, n)
        means = rng.uniform(-2, 2, n)
        y = rng.standard_normal(n) * scales_true + means
        yj = jnp.asarray(y, jnp.float32)
        sj = jnp.asarray(scales_true, jnp.float32)
        mj = jnp.asarray(means, jnp.float32)
        symbols = np.asarray(quantize(yj, "symbols", means=mj))
        y_hat = quantize(yj, "dequantize", means=mj)
        est_bits = float(likelihood_to_bits(gc.likelihood(y_hat, sj, means=mj)))
        idx = np.asarray(gc.build_indexes(sj))
        stream = encode_with_indexes(
            symbols, idx, tables.cdfs, tables.cdf_lengths, tables.offsets
        )
        real_bits = len(stream) * 8
        # Real coding uses table-quantized scales -> small overhead.
        assert abs(real_bits - est_bits) < 0.06 * est_bits + 64, (
            real_bits,
            est_bits,
        )
        dec = decode_with_indexes(
            stream, idx, tables.cdfs, tables.cdf_lengths, tables.offsets
        )
        np.testing.assert_array_equal(dec, symbols)
