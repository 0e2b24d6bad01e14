"""Trace-time mixed-precision policy for the codec transforms.

TPU MXU natively multiplies bfloat16 with float32 accumulation at ~2x the
float32 matmul rate, and the codec transforms (convs, GDN channel mixing,
deformable grouped einsums) carry essentially all of the FLOPs. This module
is a cross-cutting policy those layers consult at **trace time**:

    with mixed_precision():            # or set_compute_dtype(jnp.bfloat16)
        out = model.apply(variables, ...)

Inside the context, `tpuvc.models.layers.Conv/Deconv` (and everything built
on them) cast inputs and parameters to the policy dtype for the convolution
and cast the result back to the activation dtype, so:

  - parameters stay float32 (single checkpoint serves both modes);
  - everything *between* convs — flow arithmetic, warp coordinates, entropy
    parameters, likelihood math — stays float32, keeping the precision-
    critical paths (warp sampling positions, CDF evaluation, bit accounting)
    at full precision;
  - encoder and decoder run the same deterministic bf16 kernels, so real-
    bitstream round-trips remain bit-exact (the codec-correctness property;
    SURVEY.md 7.3.1).

The policy is read when JAX traces the function. A `jax.jit` cache entry
bakes in whatever policy was active at trace time; wrap the *call site* of
the jitted function (tracing happens under the caller's context) and keep
one jitted wrapper per policy if both are needed simultaneously.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

_COMPUTE_DTYPE: contextvars.ContextVar = contextvars.ContextVar(
    "tpuvc_compute_dtype", default=None
)


def compute_dtype():
    """The active compute dtype for conv/matmul layers, or None (float32)."""
    return _COMPUTE_DTYPE.get()


@contextlib.contextmanager
def set_compute_dtype(dtype):
    """Set the layer compute dtype for the enclosed trace (None to disable)."""
    token = _COMPUTE_DTYPE.set(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.reset(token)


def mixed_precision():
    """bfloat16 layer compute, float32 everything else (see module doc)."""
    return set_compute_dtype(jnp.bfloat16)


def policy_from_name(name: str):
    """Context manager for a config-level dtype name.

    "float32"/"f32"/"" -> no-op policy; "bfloat16"/"bf16" -> mixed precision.
    """
    name = (name or "float32").lower()
    if name in ("float32", "f32", "fp32"):
        return set_compute_dtype(None)
    if name in ("bfloat16", "bf16"):
        return set_compute_dtype(jnp.bfloat16)
    raise ValueError(f"unknown compute dtype: {name}")
