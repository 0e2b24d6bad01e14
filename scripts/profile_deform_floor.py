"""Decompose the fused deform kernel's zero-spread floor at the v4 L1 shape.

Times deform_sample_accum directly (no conv wrapper) while sweeping the tap
count and channel count, separating per-tap gather cost from the fixed
per-band cost (DMA + de-interleave + slab walk + re-interleave). Offsets are
the 3x3 integer tap grid (zero diversity, zero flow) — the trained-statistics
floor PERF.md quotes.

Usage: python scripts/profile_deform_floor.py [spread]
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

from tpuvc.ops.deform_pallas import deform_sample_accum

H, W = 544, 960
CH, OG = 8, 4
ITERS = 6


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
    print(f"{name:44s} {dt * 1000:8.1f} ms", flush=True)
    return dt


def main():
    spread = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, H, W, CH), dtype=np.float32))
    base = np.stack(
        np.meshgrid([-1.0, 0.0, 1.0], [-1.0, 0.0, 1.0], indexing="ij"),
        axis=-1,
    ).reshape(9, 2)[:, ::-1]  # (dx, dy) per tap
    for taps in (1, 3, 9):
        flows = np.broadcast_to(
            base[None, :taps, None, None, :], (1, taps, H, W, 2)
        ).copy()
        if spread:
            flows = flows + rng.standard_normal(flows.shape) * spread
        flows_j = jnp.asarray(flows, jnp.float32)
        masks = jnp.asarray(
            rng.random((1, taps, H, W), dtype=np.float32)
        )
        wt = jnp.asarray(
            rng.standard_normal((taps, CH, OG), np.float32) * 0.05
        )
        fn = jax.jit(deform_sample_accum)
        timed(f"taps={taps} ch={CH} og={OG} spread={spread:g}",
              fn, img, flows_j, masks, wt)


if __name__ == "__main__":
    main()
