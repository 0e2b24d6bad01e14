"""Determinism probe: run each v4 device stage TWICE on identical inputs
at the failing 1080p shape and compare bit-for-bit. The entropy path was
proven exact (debug_v4_exact), so a bench bit-exactness failure with
identical graphs + inputs implies some stage is nondeterministic across
executions.

    python scripts/debug_v4_determinism.py [--hw 1088x1920] [--batch 2]
"""

from __future__ import annotations

import argparse
import gc
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


def cmp(name, a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    if np.array_equal(a, b):
        print(f"{name}: deterministic", flush=True)
        return True
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    idx = np.unravel_index(np.argmax(d), d.shape)
    print(
        f"{name}: NONDETERMINISTIC n={int((d > 0).sum())}/{d.size} "
        f"max={d.max():.6g} at {idx}", flush=True,
    )
    return False


def main():
    p = argparse.ArgumentParser()
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
    s1, s2, dr = 0.5, 0.5, 1

    # --- _context twice ---
    c1 = coder._context(coder.variables, xref1, xref2, s1, s2, dr)
    c2 = coder._context(coder.variables, xref1, xref2, s1, s2, dr)
    names = ["cond", "offset_temp", "flows", "fref1", "fref2"]
    ok = True
    for n, a, b in zip(names, c1, c2):
        if isinstance(a, tuple):
            for k, (ai, bi) in enumerate(zip(a, b)):
                ok &= cmp(f"_context.{n}[{k}]", ai, bi)
                del ai, bi
        else:
            ok &= cmp(f"_context.{n}", a, b)
    cond, offset_temp, flows, fref1, fref2 = c1
    del c2
    gc.collect()

    # --- _fuse twice on synthetic heads (27*8*2 = 432 ch per scale) ---
    heads = tuple(
        jnp.asarray(
            0.1 * rng.standard_normal(
                (f.shape[0], f.shape[1], f.shape[2], 432)
            ).astype(np.float32)
        )
        for f in fref1
    )
    f1 = coder._fuse(coder.variables, heads, fref1, fref2, flows)
    f2 = coder._fuse(coder.variables, heads, fref1, fref2, flows)
    for k, (ai, bi) in enumerate(zip(f1, f2)):
        ok &= cmp(f"_fuse[{k}]", ai, bi)
    del f1, f2, heads
    gc.collect()

    # --- _features twice ---
    g1 = coder._features(coder.variables, xref1)
    g2 = coder._features(coder.variables, xref1)
    for k, (ai, bi) in enumerate(zip(g1, g2)):
        ok &= cmp(f"_features[{k}]", ai, bi)

    print("ALL DETERMINISTIC" if ok else "NONDETERMINISM FOUND")


if __name__ == "__main__":
    main()
