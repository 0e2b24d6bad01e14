"""Scale-indexed Gaussian conditional coder (the main latent "y" coder).

TPU-native reimplementation of the capability provided to the reference by
compressai's GaussianConditional (imported at
/root/reference/LHBDC/model/layers.py:8). The scale table is the reference's
64-level exponential table from 0.11 to 256
(/root/reference/ICIP2023/src/model/elic.py:21-27).

Stateless: likelihood/build_indexes are pure jnp functions safe under jit;
table building for the host coder is numpy (runs once per model).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from tpuvc.entropy.emath import lower_bound, LIKELIHOOD_BOUND
from tpuvc.entropy.quant import quantize


SCALE_MIN = 0.11
SCALE_MAX = 256.0
SCALE_LEVELS = 64


def default_scale_table() -> np.ndarray:
    return np.exp(
        np.linspace(math.log(SCALE_MIN), math.log(SCALE_MAX), SCALE_LEVELS)
    )


def _std_cumulative(x: jnp.ndarray) -> jnp.ndarray:
    """Standard normal CDF via erfc for tail accuracy."""
    return 0.5 * jax.lax.erfc(-x * (2**-0.5))


class GaussianConditional:
    def __init__(self, scale_table=None, scale_bound: float = SCALE_MIN,
                 tail_mass: float = 1e-9):
        self.scale_table = np.asarray(
            default_scale_table() if scale_table is None else scale_table,
            dtype=np.float64,
        )
        self.scale_bound = float(scale_bound)
        self.tail_mass = float(tail_mass)

    def likelihood(
        self, y_hat: jnp.ndarray, scales: jnp.ndarray, means=None
    ) -> jnp.ndarray:
        """P(y_hat in [y-0.5, y+0.5]) under N(means, scales^2) per element."""
        v = y_hat if means is None else y_hat - means
        v = jnp.abs(v)
        s = lower_bound(scales, self.scale_bound)
        upper = _std_cumulative((0.5 - v) / s)
        lower = _std_cumulative((-0.5 - v) / s)
        return lower_bound(upper - lower, LIKELIHOOD_BOUND)

    def __call__(self, y, scales, means=None, mode: str = "noise", rng=None):
        """Returns (y_hat, likelihoods)."""
        y_hat = quantize(y, mode, means=means, rng=rng)
        return y_hat, self.likelihood(y_hat, scales, means=means)

    def build_indexes(self, scales: jnp.ndarray) -> jnp.ndarray:
        """Index of the smallest table scale >= scale, per element."""
        s = lower_bound(scales, self.scale_bound)
        table = jnp.asarray(self.scale_table[:-1], s.dtype)
        return jnp.sum(s[..., None] > table, axis=-1).astype(jnp.int32)

    def build_tables(self, precision: int = 16) -> "GaussianTables":
        """Quantized CDFs over [-m, m] per table scale for the host coder."""
        from tpuvc.entropy.cdf import build_cdf_table

        multiplier = -scipy.special.ndtri(self.tail_mass / 2.0)
        centers = np.ceil(self.scale_table * multiplier).astype(np.int64)
        lengths = 2 * centers + 1
        max_len = int(lengths.max())
        n = len(self.scale_table)
        pmf = np.zeros((n, max_len), dtype=np.float64)
        tails = np.zeros(n, dtype=np.float64)
        for i, (scale, c) in enumerate(zip(self.scale_table, centers)):
            x = np.arange(-c, c + 1, dtype=np.float64)
            up = 0.5 * scipy.special.erfc(-((x + 0.5) / scale) * (2**-0.5))
            lo = 0.5 * scipy.special.erfc(-((x - 0.5) / scale) * (2**-0.5))
            pmf[i, : lengths[i]] = up - lo
            tails[i] = 2.0 * (0.5 * scipy.special.erfc(
                ((c + 0.5) / scale) * (2**-0.5)
            ))
        cdfs, cdf_lengths = build_cdf_table(pmf, lengths, tails, precision)
        return GaussianTables(
            cdfs=cdfs,
            cdf_lengths=np.asarray(cdf_lengths, np.int32),
            offsets=(-centers).astype(np.int32),
        )


class GaussianTables:
    """Frozen coding tables: rANS CDFs indexed by scale-table index."""

    def __init__(self, cdfs, cdf_lengths, offsets):
        self.cdfs = cdfs
        self.cdf_lengths = cdf_lengths
        self.offsets = offsets
