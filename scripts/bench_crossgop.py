"""Cross-GOP level batching vs per-GOP schedule at 1080p (LHBDC)."""

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

from tpuvc.gop.order import gop_coding_table
from tpuvc.gop.scheduler import code_gop_batched, code_gops_batched
from tpuvc.models.lhbdc import LHBDC
from tpuvc.ops.precision import mixed_precision

G = int(os.environ.get('CROSSGOP_G', '4'))


def main():
    model = LHBDC(N=128)
    h, w = 1088, 1920
    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    variables = model.init(jax.random.key(0), small, small, small, "dequantize")

    rng = np.random.default_rng(0)
    base = rng.random((h, w, 3), dtype=np.float32)
    drift = (0.01 * rng.standard_normal((h, w, 3))).astype(np.float32)
    # CROSSGOP_DEVICE=1: bench.py's regime — device-resident sources, with
    # the 17 unique frames aliased across GOPs so HBM cost stays constant.
    # Default: sources stay on host (the runner's lazy-upload pattern).
    if os.environ.get("CROSSGOP_DEVICE"):
        uniq = [
            jnp.asarray(np.clip(base + i * drift, 0, 1))[None]
            for i in range(17)
        ]
        frames = [uniq[i % 17] for i in range(G * 16 + 1)]
    else:
        frames = [
            np.clip(base + (i % 17) * drift, 0, 1)[None]
            for i in range(G * 16 + 1)
        ]

    @jax.jit
    def forward(v, r1, r2, xc):
        with mixed_precision():
            out = model.apply(v, r1, xc, r2, "dequantize")
        return out["x_hat"], out["sizes"]

    def inter_fn(r1, r2, xcur, idxs, refs):
        return forward(variables, r1, r2, xcur)

    table = gop_coding_table(16)
    anchors = {g: jnp.asarray(frames[g]) for g in range(0, G * 16 + 1, 16)}
    starts = list(range(0, G * 16, 16))

    # warm both paths
    code_gops_batched(frames, anchors, table, inter_fn, starts, max_batch=8)
    code_gop_batched(frames, {0: frames[0], 16: frames[16]}, table, inter_fn,
                     max_batch=8)

    t0 = time.perf_counter()
    _, sizes = code_gops_batched(
        frames, anchors, table, inter_fn, starts, max_batch=8
    )
    dt_x = time.perf_counter() - t0
    nb = len(sizes)
    print(f"cross-GOP (G={G}): {nb} B-frames in {dt_x:.2f}s = {nb/dt_x:.2f} fps")

    t0 = time.perf_counter()
    tot = 0
    for g in starts:
        _, s = code_gop_batched(
            frames[g : g + 17], {0: anchors[g], 16: anchors[g + 16]},
            table, inter_fn, max_batch=8,
        )
        tot += len(s)
    dt_p = time.perf_counter() - t0
    print(f"per-GOP:          {tot} B-frames in {dt_p:.2f}s = {tot/dt_p:.2f} fps")
    print(f"speedup {dt_p/dt_x:.3f}x")


if __name__ == "__main__":
    main()
