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


#: MS-SSIM rate points. The reference publishes MS-SSIM RD curves
#: (LHBDC/results/mssim_bpp.txt) but not the training weights behind them;
#: these are the compressai-convention lambdas for (1 - MS-SSIM) distortion.
MSSSIM_ALPHAS = (2.40, 4.58, 8.73, 16.64, 31.73)


def rd_loss_msssim(x_hat, x, rate, alpha: float):
    """MS-SSIM-optimized RD objective: alpha * (1 - MS-SSIM) + rate.

    The distortion behind the reference's published MS-SSIM curves
    (LHBDC/results/mssim_bpp.txt); the reference repo ships only the MSE
    trainer, so this is a capability extension. Needs crops >= 176 px
    (5 dyadic scales x 11-tap valid-window SSIM kernel).
    """
    from tpuvc.eval.metrics import msssim

    d = 1.0 - msssim(x_hat, x)
    return alpha * d + jnp.mean(rate), d


def distortion_fn(name: str):
    """(d(x_hat, x), scale) for the trainer's beta * scale * d + rate form:
    'mse' -> beta * 255^2 * MSE (ICIP convention), 'ms_ssim' ->
    beta * (1 - MS-SSIM)."""
    if name == "ms_ssim":
        from tpuvc.eval.metrics import msssim

        return (lambda xh, x: 1.0 - msssim(xh, x)), 1.0
    if name == "mse":
        return (lambda xh, x: jnp.mean((xh - x) ** 2)), 255.0**2
    raise ValueError(f"unknown distortion: {name}")
