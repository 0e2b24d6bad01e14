"""Shared entropy-model math: bounded ops with straight-through-style
gradients and likelihood-to-bits accounting.

Parity: the reference entropy models (via compressai, imported at
/root/reference/LHBDC/model/layers.py:8) lower-bound scales and likelihoods
with a LowerBound op whose gradient passes through when the input is above the
bound or when the gradient pushes it up. Bit accounting follows
LHBDC/model/m.py:73-91: bits = sum(-log2 likelihood)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x: jnp.ndarray, bound: float) -> jnp.ndarray:
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x >= bound,)


def _lower_bound_bwd(res, g):
    (pass_through,) = res
    grad = jnp.where(pass_through | (g < 0), g, 0.0)
    return grad, None


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)

#: Floor applied to likelihoods before taking logs (compressai default).
LIKELIHOOD_BOUND = 1e-9


def likelihood_to_bits(likelihoods: jnp.ndarray) -> jnp.ndarray:
    """Total information content in bits: sum(-log2 p)."""
    p = lower_bound(likelihoods, LIKELIHOOD_BOUND)
    return jnp.sum(jnp.log(p)) / (-math.log(2.0))


def per_sample_bits(likelihoods: jnp.ndarray) -> jnp.ndarray:
    """(B,) bits per batch element: sum(-log2 p) over all non-batch dims."""
    p = lower_bound(likelihoods, LIKELIHOOD_BOUND)
    axes = tuple(range(1, p.ndim))
    return jnp.sum(jnp.log(p), axis=axes) / (-math.log(2.0))
