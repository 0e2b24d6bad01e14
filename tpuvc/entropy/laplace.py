"""Scale-indexed zero-mean Laplace conditional coder (DCVC-FM y path).

The reference's P-frame codec estimates latent bits under a Laplace
distribution (OJSP2025/video_model.py:239 ``y_distribution='laplace'``,
``get_y_laplace_bits`` at :587-589) and codes the quantized residual
v = round(y - mean) against scale-indexed Laplace CDFs. This mirrors
tpuvc.entropy.gaussian.GaussianConditional exactly in structure (same
64-level exponential scale table for the rANS bucket index, same quantized
CDF build) with the Laplace CDF in place of the normal CDF.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpuvc.entropy.emath import lower_bound, LIKELIHOOD_BOUND
from tpuvc.entropy.gaussian import (
    GaussianTables,
    SCALE_MIN,
    default_scale_table,
)
from tpuvc.entropy.quant import quantize


def _lap_cdf(t: jnp.ndarray) -> jnp.ndarray:
    """Standard Laplace CDF at t = x / scale."""
    return jnp.where(
        t < 0, 0.5 * jnp.exp(t), 1.0 - 0.5 * jnp.exp(-t)
    )


class LaplaceConditional:
    """Same interface as GaussianConditional (likelihood, __call__,
    build_indexes, build_tables); distribution is zero-mean Laplace."""

    def __init__(self, scale_table=None, scale_bound: float = SCALE_MIN,
                 tail_mass: float = 1e-9):
        self.scale_table = np.asarray(
            default_scale_table() if scale_table is None else scale_table,
            dtype=np.float64,
        )
        self.scale_bound = float(scale_bound)
        self.tail_mass = float(tail_mass)

    def likelihood(self, y_hat, scales, means=None) -> jnp.ndarray:
        v = y_hat if means is None else y_hat - means
        v = jnp.abs(v)
        s = lower_bound(scales, self.scale_bound)
        upper = _lap_cdf((0.5 - v) / s)
        lower = _lap_cdf((-0.5 - v) / s)
        return lower_bound(upper - lower, LIKELIHOOD_BOUND)

    def __call__(self, y, scales, means=None, mode: str = "noise", rng=None):
        y_hat = quantize(y, mode, means=means, rng=rng)
        return y_hat, self.likelihood(y_hat, scales, means=means)

    def build_indexes(self, scales: jnp.ndarray) -> jnp.ndarray:
        s = lower_bound(scales, self.scale_bound)
        table = jnp.asarray(self.scale_table[:-1], s.dtype)
        return jnp.sum(s[..., None] > table, axis=-1).astype(jnp.int32)

    def build_tables(self, precision: int = 16) -> GaussianTables:
        """Quantized Laplace CDFs over [-m, m] per table scale."""
        from tpuvc.entropy.cdf import build_cdf_table

        # Laplace quantile: P(|X| > m) = exp(-m/b) -> m = -b*ln(tail).
        multiplier = -np.log(self.tail_mass)
        centers = np.ceil(self.scale_table * multiplier).astype(np.int64)
        lengths = 2 * centers + 1
        max_len = int(lengths.max())
        n = len(self.scale_table)
        pmf = np.zeros((n, max_len), dtype=np.float64)
        tails = np.zeros(n, dtype=np.float64)

        def cdf(x, b):
            return np.where(
                x < 0, 0.5 * np.exp(x / b), 1.0 - 0.5 * np.exp(-x / b)
            )

        for i, (scale, c) in enumerate(zip(self.scale_table, centers)):
            x = np.arange(-c, c + 1, dtype=np.float64)
            pmf[i, : lengths[i]] = cdf(x + 0.5, scale) - cdf(x - 0.5, scale)
            tails[i] = 2.0 * cdf(-(c + 0.5), scale)
        cdfs, cdf_lengths = build_cdf_table(pmf, lengths, tails, precision)
        return GaussianTables(
            cdfs=cdfs,
            cdf_lengths=np.asarray(cdf_lengths, np.int32),
            offsets=(-centers).astype(np.int32),
        )
