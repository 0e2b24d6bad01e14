"""Per-scale timing of the v4 OffsetDiversity deform convs at 1080p.

Reproduces the three deform_conv2d call shapes of FlowGuidedB
(ICIP2024/src/model/m.py fusion stage; tpuvc/models/flowguided_b.py:183-196)
with untrained-statistics offsets (tanh(N(0,1)) * magnitude), so kernel
changes can be judged per scale without the 2 s full-forward loop.

Usage: python scripts/profile_offdiv.py [spread_scale]
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

from tpuvc.ops.deform import deform_conv2d
from tpuvc.ops.precision import mixed_precision

ITERS = 6
G = 16
K = 3

# (name, H, W, C_in(two refs), C_out, offset magnitude) — 1080p pyramid /2 /4 /8
SCALES = [
    ("L1", 544, 960, 128, 64, 40.0),
    ("L2", 272, 480, 192, 96, 20.0),
    ("L3", 136, 240, 256, 128, 10.0),
]


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for _ in range(ITERS):
        out = fn(args[0] + carry * 0.0, *args[1:])
        carry = out.ravel()[0]
    float(carry)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:36s} {dt * 1000:8.1f} ms", flush=True)
    return dt


def main():
    sscale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    rng = np.random.default_rng(0)
    total = 0.0
    for name, H, W, C, Cout, mag in SCALES:
        x = jnp.asarray(rng.random((1, H, W, C), dtype=np.float32))
        off = jnp.asarray(
            np.tanh(rng.standard_normal((1, H, W, G * K * K * 2), np.float32))
            * mag * sscale
        )
        masks = jnp.asarray(
            rng.random((1, H, W, G * K * K), dtype=np.float32)
        )
        wt = jnp.asarray(
            rng.standard_normal((K, K, C // G, Cout), np.float32) * 0.05
        )

        @jax.jit
        def fwd(x, off, masks, wt):
            with mixed_precision():
                return deform_conv2d(x, off, masks, wt, None, G, K)

        total += timed(f"{name} deform {H}x{W} C{C}->{Cout} mag{mag * sscale:g}",
                       fwd, x, off, masks, wt)
    print(f"{'total':36s} {total * 1000:8.1f} ms")


if __name__ == "__main__":
    main()
