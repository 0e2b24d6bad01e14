"""Quantization surrogates for training and inference.

Parity targets in /root/reference:
  - STE round: ICIP2023/src/model/elic.py:35-45 (``quantize_ste``).
  - Additive-noise training path: compressai EntropyBottleneck/
    GaussianConditional "noise" mode (used by LHBDC/Flex-Rate training).
  - "dequantize" mode: round around a mean/median and add it back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round with a straight-through (identity) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize(
    x: jnp.ndarray,
    mode: str,
    means: jnp.ndarray | None = None,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Quantize ``x``.

    mode:
      'noise'      — add U(-0.5, 0.5) (training surrogate; requires rng).
      'ste'        — straight-through round of (x - means) + means.
      'dequantize' — hard round of (x - means) + means (inference).
      'symbols'    — integer symbols round(x - means) (for the coder).
      'symbols16'  — same, int16-clamped (cheap device->host fetch).
    """
    if mode == "noise":
        assert rng is not None, "noise quantization needs an rng key"
        noise = jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
        return x + noise
    centered = x if means is None else x - means
    if mode == "symbols":
        return jnp.round(centered).astype(jnp.int32)
    if mode == "symbols16":
        # Int16 coding symbols: halves the device->host fetch (the coders'
        # dominant transfer through a slow link). The clamp only binds on
        # degenerate/untrained statistics; reconstruction uses the SAME
        # clamped symbol on both encoder and decoder, so round trips stay
        # bit-exact regardless.
        s = jnp.round(centered)
        return jnp.clip(s, -32000, 32000).astype(jnp.int16)
    if mode == "ste":
        q = ste_round(centered)
    elif mode == "dequantize":
        q = jnp.round(centered)
    else:
        raise ValueError(f"unknown quantize mode: {mode}")
    return q if means is None else q + means
