"""Stress the v4 _fuse graph (3 fused-deform instances in ONE program)
for run-to-run determinism at 1080p — the configuration debug_v4_chunk
caught flaking.

    python scripts/debug_fuse_flake.py [--reps 30]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--hw", default="1088x1920")
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()
    h, w = (int(s) for s in args.hw.split("x"))

    from tpuvc.models.flowguided_b import FlowGuidedB, FlowGuidedBCoder

    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    model = FlowGuidedB()
    variables = model.init(
        jax.random.key(0), small, small, small, 0, 0.5, -0.5, 1, "dequantize"
    )
    coder = FlowGuidedBCoder(model, variables)

    rng = np.random.default_rng(0)
    base = rng.random((h, w, 3), dtype=np.float32)
    drift = (0.01 * rng.standard_normal((h, w, 3))).astype(np.float32)
    fr = [
        jnp.asarray(np.clip(base + i * drift, 0, 1))[None] for i in range(3)
    ]
    B = args.batch
    xref1 = jnp.concatenate([fr[0]] * B, axis=0)
    xref2 = jnp.concatenate([fr[2]] * B, axis=0)
    cond, offset_temp, flows, fref1, fref2 = coder._context(
        coder.variables, xref1, xref2, 0.5, 0.5, 1
    )
    del cond, offset_temp
    heads = tuple(
        jnp.asarray(
            rng.standard_normal(
                (f.shape[0], f.shape[1], f.shape[2], 432)
            ).astype(np.float32)
        )
        for f in fref1
    )

    ref = [
        np.asarray(o)
        for o in coder._fuse(coder.variables, heads, fref1, fref2, flows)
    ]
    bad = 0
    for i in range(args.reps):
        out = coder._fuse(coder.variables, heads, fref1, fref2, flows)
        mism = []
        for k in range(3):
            o = np.asarray(out[k])
            if not np.array_equal(o, ref[k]):
                d = np.abs(o - ref[k])
                idx = np.unravel_index(np.argmax(d), d.shape)
                mism.append(
                    f"[{k}] n={int((d > 0).sum())}/{d.size} "
                    f"max={d.max():.4g}@{idx}"
                )
        if mism:
            print(f"rep {i}: MISMATCH " + "; ".join(mism), flush=True)
            bad += 1
    print(f"_fuse 3-instance: {bad}/{args.reps} nondeterministic runs")


if __name__ == "__main__":
    main()
