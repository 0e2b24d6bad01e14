"""Checkerboard spatial-context helpers (ELIC entropy models).

Parity: /root/reference/ICIP2023/src/model/elic.py:196-245 and
src/model/layers.py:6-29 (E5):
  - anchor cells: (h + w) odd — rows even/cols odd plus rows odd/cols even;
  - the masked 5x5 context conv sees only anchor cells;
  - context params are zeroed at anchor positions (anchors use hyper+channel
    context only).

All helpers are pure elementwise masking — XLA fuses them into the
surrounding convolutions.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _anchor_mask_np(h: int, w: int) -> np.ndarray:
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return ((ii + jj) % 2 == 1).astype(np.float32)


def anchor_mask(h: int, w: int) -> jnp.ndarray:
    """(h, w) float mask, 1 at anchor cells ((h+w) odd)."""
    return jnp.asarray(_anchor_mask_np(h, w))


def keep_anchor(x: jnp.ndarray) -> jnp.ndarray:
    """Zero non-anchor cells of (..., H, W, C) (the context conv's input)."""
    m = anchor_mask(x.shape[-3], x.shape[-2])
    return x * m[..., None]


def keep_non_anchor(x: jnp.ndarray) -> jnp.ndarray:
    """Zero anchor cells of (..., H, W, C) (the context conv's output)."""
    m = anchor_mask(x.shape[-3], x.shape[-2])
    return x * (1.0 - m)[..., None]


def checkerboard_kernel_mask(k: int = 5) -> np.ndarray:
    """(k, k) mask, 1 where (i + j) odd — the masked conv taps."""
    ii, jj = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
    return ((ii + jj) % 2 == 1).astype(np.float32)


class CheckerboardConv(nn.Module):
    """5x5 conv whose kernel taps only checkerboard-offset neighbors.

    The mask is applied to the kernel functionally at every call (the dense
    parameter is masked, not mutated — the JAX analog of the reference's
    ``self.weight.data *= self.mask``).
    """

    features: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x):
        import jax

        k = self.kernel
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mask = jnp.asarray(checkerboard_kernel_mask(k))[:, :, None, None]
        y = jax.lax.conv_general_dilated(
            x,
            kernel * mask,
            window_strides=(1, 1),
            padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias
