"""Single-forward 1080p timing for any codec family (dependency-chained)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from tpuvc.ops.precision import mixed_precision

H, W = 1088, 1920
ITERS = 8


def timed(name, fn, *args):
    # block_until_ready does NOT block through the axon relay: force the
    # warm-up (incl. compile/load) to complete by fetching a scalar, or
    # the compile lands inside the timed loop (PERF.md discipline).
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for _ in range(ITERS):
        out = fn(*[
            a + carry * 0.0
            if isinstance(a, jnp.ndarray) and a.dtype == jnp.float32
            else a
            for a in args
        ])
        carry = jax.tree_util.tree_leaves(out)[0].ravel()[0]
    float(carry)  # force completion through the relay
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1000:8.1f} ms", flush=True)
    return dt


def main():
    fam = sys.argv[1] if len(sys.argv) > 1 else "deform_b"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    r1 = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    r2 = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    key = jax.random.key(0)

    if fam == "deform_b":
        from tpuvc.models.deform_b import DeformB

        model = DeformB()
        variables = model.init(key, small, small, small, 0, "dequantize")

        @jax.jit
        def fwd(v, r1, r2, x):
            # v as an ARGUMENT: closing over it would inline ~35M weights
            # as HLO constants (hundreds of MB serialized), blowing remote
            # compile request limits.
            with mixed_precision():
                out = model.apply(v, r1, r2, x, 0, "dequantize")
            return out["x_hat"], out["size"]

        timed("deform_b full forward", fwd, variables, r1, r2, x)
    elif fam == "flowguided_b":
        from tpuvc.models.flowguided_b import FlowGuidedB

        model = FlowGuidedB()
        variables = model.init(
            key, small, small, small, 0, 0.5, -0.5, 1, "dequantize"
        )

        @jax.jit
        def fwd(v, r1, r2, x):
            with mixed_precision():
                out = model.apply(
                    v, r1, r2, x, 0, 0.5, -0.5, 1, "dequantize"
                )
            return out["x_hat"], out["size"]

        timed("flowguided_b full forward", fwd, variables, r1, r2, x)
    else:
        raise SystemExit(f"unknown family {fam}")


if __name__ == "__main__":
    main()
