"""Distortion metrics, computed on device (scalars transferred, not frames).

Parity targets in /root/reference:
  - MSE/PSNR: LHBDC/test/utils.py:41-51, ICIP2023/src/utils.py:250-260.
  - Evaluation protocol: PSNR on uint8-rounded RGB over the unpadded crop
    (SURVEY.md section 6); ``psnr_uint8`` applies the uint8 round-trip on
    device so the per-frame host sync of the reference (testing.py:176-177)
    is avoided.
  - MS-SSIM (for the LHBDC MS-SSIM RD curve, LHBDC/results/mssim_bpp.txt):
    standard 5-scale Wang et al. computed with depthwise gaussian convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(mse_val, data_range: float = 1.0):
    return 10.0 * jnp.log10((data_range**2) / mse_val)


def _round_uint8(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.uint8:
        # Already in the uint8 domain — clipping against [0, 1] here would
        # binarize the frame (the r4 decode_b PSNR-readout bug: the
        # reconstruction was fine, the printed number was the PSNR of two
        # near-binary masks).
        return x.astype(jnp.float32)
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0)


def psnr_uint8(ref: jnp.ndarray, dec: jnp.ndarray) -> jnp.ndarray:
    """PSNR between uint8-rounded frames (the reference protocol).
    Accepts [0, 1] floats or uint8 arrays, like psnr_uint8_np."""
    m = jnp.mean((_round_uint8(jnp.asarray(ref)) -
                  _round_uint8(jnp.asarray(dec))) ** 2)
    return psnr(m, data_range=255.0)


def psnr_uint8_np(ref: np.ndarray, dec: np.ndarray) -> float:
    """Host (numpy) twin of psnr_uint8 for decode-side checks where both
    frames already live on host — avoids two uploads through the relay.
    Accepts [0,1] floats or uint8 arrays; same rounding protocol."""

    def r(x):
        if x.dtype == np.uint8:
            return x.astype(np.float64)
        return np.round(np.clip(x, 0.0, 1.0) * 255.0).astype(np.float64)

    m = np.mean((r(ref) - r(dec)) ** 2)
    return float(10.0 * np.log10(255.0**2 / max(m, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _ssim_components(a, b, k1=0.01, k2=0.03, data_range=1.0):
    """Per-level SSIM mean and contrast-structure mean for NHWC inputs."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    g = jnp.asarray(_gaussian_kernel())

    def blur2(x):
        # (B,H,W,C) -> valid-window gaussian blur, separable.
        k = g.shape[0]
        xh = jax.lax.conv_general_dilated(
            x, g.reshape(k, 1, 1, 1) * jnp.eye(x.shape[-1])[None, None],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        xw = jax.lax.conv_general_dilated(
            xh, g.reshape(1, k, 1, 1) * jnp.eye(x.shape[-1])[None, None],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return xw

    mu_a = blur2(a)
    mu_b = blur2(b)
    saa = blur2(a * a) - mu_a**2
    sbb = blur2(b * b) - mu_b**2
    sab = blur2(a * b) - mu_a * mu_b
    cs = (2 * sab + c2) / (saa + sbb + c2)
    ssim = ((2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)) * cs
    return jnp.mean(ssim), jnp.mean(cs)


_MSSSIM_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], np.float32)


def msssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Multi-scale SSIM (5 scales, Wang et al. weights), NHWC in [0,1]."""
    from tpuvc.ops.resample import avg_pool2d

    vals = []
    for i in range(5):
        s, cs = _ssim_components(a, b, data_range=data_range)
        vals.append(s if i == 4 else cs)
        if i < 4:
            # Pad to even if needed, then 2x2 average pool.
            if a.shape[-3] % 2 or a.shape[-2] % 2:
                ph = a.shape[-3] % 2
                pw = a.shape[-2] % 2
                pad = [(0, 0), (0, ph), (0, pw), (0, 0)]
                a = jnp.pad(a, pad, mode="edge")
                b = jnp.pad(b, pad, mode="edge")
            a = avg_pool2d(a, 2)
            b = avg_pool2d(b, 2)
    out = jnp.ones(())
    for w, v in zip(_MSSSIM_WEIGHTS, vals):
        # Clamp away from 0: v**w has an infinite gradient at v=0, and the
        # contrast-structure term can go negative on uncorrelated inputs
        # (early training under the MS-SSIM objective).
        out = out * jnp.maximum(v, 1e-6) ** w
    return out
