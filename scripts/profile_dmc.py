"""Stage-level TPU timing for the DMC P-frame codec at 1080p.

Dependency-chained timing: each iteration's input carries a 0-weighted
scalar from the previous output so iterations serialize on-device; the
host fetches once at the end (the axon relay round trip is excluded).
"""

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

from tpuvc.models.dmc import PFrameDMC
from tpuvc.ops.precision import mixed_precision

H, W = 1088, 1920
ITERS = 8


def timed(name, fn, *args):
    out = fn(*args)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for _ in range(ITERS):
        out = fn(*[a + carry * 0.0 if isinstance(a, jnp.ndarray) and a.dtype == jnp.float32 else a for a in args])
        carry = jax.tree_util.tree_leaves(out)[0].ravel()[0]
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1000:8.1f} ms")
    return dt


def main():
    model = PFrameDMC()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    ref = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    dpb_small = {"ref_frame": small, "ref_feature": None, "ref_down_ratio": 1.0}
    variables = model.init(jax.random.key(0), small, dpb_small, 1.0, "dequantize")

    feat = jnp.asarray(rng.random((1, H, W, model.feat), dtype=np.float32))
    mv = jnp.asarray(0.5 * rng.standard_normal((1, H, W, 2)).astype(np.float32))
    ctx = feat

    def ap(method, *args, **kw):
        return model.apply(variables, *args, method=method, **kw)

    @jax.jit
    def full(x, ref, feat):
        with mixed_precision():
            out = model.apply(
                variables, x, {"ref_frame": ref, "ref_feature": feat,
                               "ref_down_ratio": 1.0}, 1.0, "dequantize")
        return out["x_hat"], out["bits"]

    @jax.jit
    def f_flow(x, ref):
        with mixed_precision():
            return ap(PFrameDMC.estimate_mv, x, ref, 1.0)

    @jax.jit
    def f_codemv(mv):
        with mixed_precision():
            return ap(PFrameDMC.code_mv, mv, "dequantize", None)[0]

    @jax.jit
    def f_mc(ref, feat, mv):
        with mixed_precision():
            return ap(PFrameDMC.motion_compensate, ref, feat, mv)[0]

    @jax.jit
    def f_codeframe(x, ctx):
        with mixed_precision():
            out = ap(PFrameDMC.code_frame, x, ctx, "dequantize", None)
        return out[0], out[1]

    timed("full forward", full, x, ref, feat)
    timed("estimate_mv (SPyNet)", f_flow, x, ref)
    timed("code_mv", f_codemv, mv)
    timed("motion_compensate", f_mc, ref, feat, mv)
    timed("code_frame", f_codeframe, x, ctx)


if __name__ == "__main__":
    main()
