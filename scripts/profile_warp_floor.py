"""Warp band-kernel floor vs flow statistics, at the codec's hot shapes.

Times tpuvc.ops.warp_pallas.warp_pallas at the LHBDC motion-compensation
shape (B=4 level batch, 1080p, C=3) and the mid-pyramid SPyNet shape,
across flow fields: zero, uniform pan (+40 px), global ramp (constant
slope, the real-video regime the per-tile walk ranges target), smooth
local (+-2 px), and white noise (+-10 px). Publishes the numbers behind
PERF.md's warp floor ledger.

    python scripts/profile_warp_floor.py
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

from tpuvc.ops.warp_pallas import warp_pallas

ITERS = 10

SHAPES = [
    ("mc 1080p B=4 C=3", (4, 1088, 1920, 3)),
    ("spynet mid B=4 C=8", (4, 544, 960, 8)),
]


@jax.jit
def _fwd(img, flow):
    return warp_pallas(img, flow, 1.0, 1.0)


def flow_field(kind, B, H, W, rng):
    f = np.zeros((B, H, W, 2), np.float32)
    if kind == "zero":
        pass
    elif kind == "pan40":
        f[..., 0] = 40.0
        f[..., 1] = 40.0
    elif kind == "ramp":
        # constant-slope global motion: +-W/32 px dy across the width
        f[..., 1] = np.linspace(-W / 32, W / 32, W, np.float32)[None, None, :]
    elif kind == "smooth2":
        coarse = rng.standard_normal((B, H // 64 + 1, W // 64 + 1, 2))
        f = np.asarray(
            jax.image.resize(
                jnp.asarray(coarse, jnp.float32), (B, H, W, 2), "bilinear"
            )
        ) * 2.0
    elif kind == "white10":
        f = (rng.random((B, H, W, 2)).astype(np.float32) - 0.5) * 20.0
    return jnp.asarray(f)


def main():
    rng = np.random.default_rng(0)
    for name, (B, H, W, C) in SHAPES:
        img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        for kind in ["zero", "pan40", "ramp", "smooth2", "white10"]:
            flow = flow_field(kind, B, H, W, rng)
            float(_fwd(img, flow).ravel()[0])  # warm through the relay
            t0 = time.perf_counter()
            carry = jnp.float32(0.0)
            for _ in range(ITERS):
                out = _fwd(img + carry * 0.0, flow)
                carry = out.ravel()[0]
            float(carry)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{name:24s} {kind:8s} {dt * 1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
