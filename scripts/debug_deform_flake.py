"""Stress the fused deform kernel for run-to-run determinism.

debug_v4_chunk caught _fuse producing different bits on identical inputs
(intermittent). This calls deform_conv2d repeatedly on fixed inputs at
the v4 scale shapes and reports mismatch rates vs the first result.

    python scripts/debug_deform_flake.py [--reps 30] [--scale L3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from tpuvc.ops.deform import deform_conv2d

G = 16
K = 3

SCALES = {
    "L1": (544, 960, 128, 64),
    "L2": (272, 480, 192, 96),
    "L3": (136, 240, 256, 128),
}


@jax.jit
def fwd(x, off, masks, wt):
    return deform_conv2d(x, off, masks, wt, None, G, K)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--scale", default="L3")
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()
    H, W, C, Cout = SCALES[args.scale]
    B = args.batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
    off = jnp.asarray(
        np.tanh(rng.standard_normal((B, H, W, G * K * K * 2)))
        .astype(np.float32) * 3.0
    )
    masks = jnp.asarray(rng.random((B, H, W, G * K * K), dtype=np.float32))
    wt = jnp.asarray(
        rng.standard_normal((K, K, C // G, Cout)).astype(np.float32) * 0.05
    )

    ref = np.asarray(fwd(x, off, masks, wt))
    bad = 0
    for i in range(args.reps):
        out = np.asarray(fwd(x, off, masks, wt))
        if not np.array_equal(out, ref):
            d = np.abs(out - ref)
            idx = np.unravel_index(np.argmax(d), d.shape)
            print(
                f"rep {i}: MISMATCH n={int((d > 0).sum())}/{d.size} "
                f"max={d.max():.6g} at {idx}", flush=True,
            )
            bad += 1
    print(f"{args.scale} B={B}: {bad}/{args.reps} nondeterministic runs")


if __name__ == "__main__":
    main()
