"""Factorized-prior entropy bottleneck (the hyper-latent "z" coder).

TPU-native reimplementation of the capability provided to the reference by
compressai's EntropyBottleneck (imported at
/root/reference/LHBDC/model/layers.py:8; behavior per Balle et al. 2018
appendix 6.1): each channel's density is modeled by a small monotone MLP whose
sigmoid is the CDF. All channels evaluate as one batched einsum chain — a few
tiny MXU contractions per call instead of per-channel loops.

Three costs live here:
  - likelihood(y_hat) for rate estimation (device, differentiable),
  - aux loss pushing learned quantiles to the distribution tails (device),
  - quantized CDF table construction for the host rANS coder (host, once per
    trained model — the reference's ``.update(force=True)``,
    LHBDC/encode_B.py:34-35).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpuvc.entropy.emath import lower_bound, LIKELIHOOD_BOUND
from tpuvc.entropy.quant import quantize


class FactorizedBottleneck(nn.Module):
    channels: int
    filters: tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        k = len(dims) - 1  # number of layers
        scale = self.init_scale ** (1.0 / k)
        matrices, biases, factors = [], [], []
        for i in range(k):
            init = float(np.log(np.expm1(1.0 / scale / dims[i + 1])))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda rng, shape, v=init: jnp.full(shape, v, jnp.float32),
                    (self.channels, dims[i + 1], dims[i]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda rng, shape: jax.random.uniform(
                        rng, shape, jnp.float32, -0.5, 0.5
                    ),
                    (self.channels, dims[i + 1], 1),
                )
            )
            if i < k - 1:
                factors.append(
                    self.param(
                        f"factor_{i}",
                        nn.initializers.zeros,
                        (self.channels, dims[i + 1], 1),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors
        self.quantiles = self.param(
            "quantiles",
            lambda rng, shape: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale], jnp.float32),
                (self.channels, 1, 1),
            ),
            (self.channels, 1, 3),
        )

    def _logits_cumulative(self, x: jnp.ndarray, stop_params: bool) -> jnp.ndarray:
        """x: (C, 1, N) sample positions -> logits of the CDF at x."""
        logits = x
        n_layers = len(self._matrices)
        for i in range(n_layers):
            m, b = self._matrices[i], self._biases[i]
            if stop_params:
                m, b = jax.lax.stop_gradient(m), jax.lax.stop_gradient(b)
            logits = jnp.einsum("cij,cjn->cin", jax.nn.softplus(m), logits) + b
            if i < n_layers - 1:
                f = self._factors[i]
                if stop_params:
                    f = jax.lax.stop_gradient(f)
                logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def likelihood(self, y_hat: jnp.ndarray) -> jnp.ndarray:
        """P(y_hat in [y-0.5, y+0.5]) per element. y_hat: (..., C)."""
        shape = y_hat.shape
        c = shape[-1]
        assert c == self.channels, (c, self.channels)
        flat = jnp.moveaxis(y_hat.reshape(-1, c), 0, 1)[:, None, :]  # (C,1,N)
        lower = self._logits_cumulative(flat - 0.5, stop_params=False)
        upper = self._logits_cumulative(flat + 0.5, stop_params=False)
        # Numerically stable difference of sigmoids (evaluate on the side
        # where the sigmoid is small).
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        lik = jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )
        lik = lower_bound(lik, LIKELIHOOD_BOUND)
        return jnp.moveaxis(lik[:, 0, :], 1, 0).reshape(shape)

    def medians(self) -> jnp.ndarray:
        return jax.lax.stop_gradient(self.quantiles[:, 0, 1])

    def __call__(self, y, mode: str = "noise", rng=None):
        """Returns (y_hat, likelihoods). y: (..., C)."""
        med = self.medians() if mode != "noise" else None
        y_hat = quantize(y, mode, means=med, rng=rng)
        return y_hat, self.likelihood(y_hat)

    def aux_loss(self) -> jnp.ndarray:
        """Trains quantiles to hit (tail/2, 1/2, 1 - tail/2); model params are
        stopped so this gradient flows only into the quantiles."""
        logits = self._logits_cumulative(self.quantiles, stop_params=True)
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.array([-t, 0.0, t], jnp.float32)
        return jnp.sum(jnp.abs(logits[:, 0, :] - target))


class FactorizedTables:
    """Frozen coding tables for a trained FactorizedBottleneck."""

    def __init__(self, cdfs, cdf_lengths, offsets, medians):
        self.cdfs = cdfs              # (C, max_len) int32
        self.cdf_lengths = cdf_lengths  # (C,) int32
        self.offsets = offsets        # (C,) int32
        self.medians = medians        # (C,) float32

    @classmethod
    def from_module(
        cls,
        module: FactorizedBottleneck,
        variables,
        precision: int = 16,
    ) -> "FactorizedTables":
        from tpuvc.entropy.cdf import build_cdf_table

        quantiles = np.asarray(
            variables["params"]["quantiles"], dtype=np.float64
        )  # (C,1,3)
        medians = quantiles[:, 0, 1]
        minima = np.maximum(np.ceil(medians - quantiles[:, 0, 0]), 0).astype(int)
        maxima = np.maximum(np.ceil(quantiles[:, 0, 2] - medians), 0).astype(int)
        pmf_lengths = minima + maxima + 1
        max_len = int(pmf_lengths.max())

        # Integer sample grid around each channel's median.
        samples = np.arange(max_len)[None, :] - minima[:, None] + medians[:, None]

        def logits_at(x):
            # x: (C, 1, N)
            return module.apply(
                variables, x, False, method=FactorizedBottleneck._logits_cumulative
            )

        x = jnp.asarray(samples[:, None, :], jnp.float32)  # (C,1,max_len)
        lower = np.asarray(jax.nn.sigmoid(logits_at(x - 0.5))[:, 0, :])
        upper = np.asarray(jax.nn.sigmoid(logits_at(x + 0.5))[:, 0, :])
        pmf = np.clip(upper - lower, 0.0, 1.0)
        # Probability mass outside the modeled range, folded into the escape
        # slot: CDF below the first lower edge plus 1 - CDF above the last.
        tail = lower[np.arange(len(medians)), 0] + (
            1.0 - upper[np.arange(len(medians)), pmf_lengths - 1]
        )
        for i, L in enumerate(pmf_lengths):
            pmf[i, L:] = 0.0
        cdfs, cdf_lengths = build_cdf_table(pmf, pmf_lengths, tail, precision)
        return cls(
            cdfs=cdfs,
            cdf_lengths=np.asarray(cdf_lengths, np.int32),
            offsets=(-minima).astype(np.int32),
            medians=medians.astype(np.float32),
        )
