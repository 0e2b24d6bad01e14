"""Rate-distortion losses.

Parity targets in /root/reference:
  - LHBDC/train.py:164-304 (T1): loss = alpha * MSE + rate, with
    alpha = lambda in {228, 436, 845, 1626, 3141}; separate aux loss on the
    factorized-prior quantiles.
  - ICIP2024/src/train/config.py:42-43 (T2): loss = beta * 255^2 * MSE +
    rate, beta in {0.0056, 0.0107, 0.0207, 0.0400, 0.0772}.
"""

from __future__ import annotations

import jax.numpy as jnp

#: LHBDC lambda rate points (LHBDC/encode_B.py:27).
LHBDC_LAMBDAS = (228, 436, 845, 1626, 3141)

#: ICIP2023/ICIP2024 beta rate points (ICIP2024/src/train/config.py:42).
ICIP_BETAS = (0.0056, 0.0107, 0.0207, 0.0400, 0.0772)


def rd_loss(x_hat, x, rate, alpha: float):
    """LHBDC-style: alpha * MSE + rate (rate already in bpp)."""
    mse = jnp.mean((x_hat - x) ** 2)
    return alpha * mse + jnp.mean(rate), mse


def rd_loss_beta(x_hat, x, rate, beta: float):
    """ICIP-style: beta * 255^2 * MSE + rate."""
    mse = jnp.mean((x_hat - x) ** 2)
    return beta * (255.0**2) * mse + jnp.mean(rate), mse
