"""Benchmark: 1080p GOP-16 B-frame coding throughput on one chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the BASELINE.json headline unit of work: hierarchical GOP-16
coding of 1080p frames with the flagship codec — full differentiable eval
pass per B-frame (flows + MV codec + compensation + residual codec + bit
accounting), scheduled level-by-level so independent frames within a
hierarchy level share one batched forward (tpuvc.gop.scheduler). The
reference's hot loop codes the same 15 B-frames strictly sequentially
(/root/reference/LHBDC/test/testing.py:167). A 2-GOP window additionally
batches the same hierarchy level across GOPs (cross-GOP level batching,
tpuvc.gop.scheduler.code_gops_batched) — the narrow levels of the dyadic
schedule then also fill the MXU.

vs_baseline is against the reference PyTorch-CPU throughput target from
BASELINE.json (>10x per chip). The reference authors quote ~1s/frame on
their GPU for flow+mask alone (LHBDC/encode_B.py:87-99); the driver's
PyTorch-CPU anchor is slower still. We report B-frames/s and normalize
against a 0.1 fps CPU anchor estimate (10 s/frame for the full model on
CPU).
"""

from __future__ import annotations

import json
import time


REFERENCE_CPU_FPS = 0.1  # PyTorch-CPU 1080p anchor (see docstring)


def main():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np

    from tpuvc.gop.order import gop_coding_table
    from tpuvc.gop.scheduler import code_gops_batched
    from tpuvc.models.lhbdc import LHBDC
    from tpuvc.ops.precision import mixed_precision

    model = LHBDC(N=128)
    h, w = 1088, 1920  # 1080p padded to x64
    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    variables = model.init(
        jax.random.key(0), small, small, small, "dequantize"
    )

    rng = np.random.default_rng(0)
    base = rng.random((h, w, 3), dtype=np.float32)
    drift = (0.01 * rng.standard_normal((h, w, 3))).astype(np.float32)
    frames = [
        jnp.asarray(np.clip(base + i * drift, 0, 1))[None] for i in range(17)
    ]

    @jax.jit
    def forward(v, r1, r2, xc):
        # bf16 layer compute, f32 flow/warp/entropy math (tpuvc.ops.precision)
        with mixed_precision():
            out = model.apply(v, r1, xc, r2, "dequantize")
        return out["x_hat"], out["sizes"]

    def inter_fn(r1, r2, xcur, idxs, refs):
        return forward(variables, r1, r2, xcur)

    table = gop_coding_table(16)
    # max_batch=8: full level batching (1, 2, 4, 8). The batch-4/8 1080p
    # graphs take ~13 min of one-time remote compile (then persistent-cache
    # hits); they run 19% faster end-to-end than the chunked batch-2
    # schedule (4.03 vs 3.37 B-frames/s). Cross-GOP window batching (G=2)
    # additionally runs the same hierarchy level of both GOPs in one
    # forward, lifting the narrow levels to batch 2/4/8/8: measured
    # 4.42 vs 3.95 B-frames/s against the per-GOP schedule (+12%).
    max_batch = 8
    G = 2
    # 33-frame window aliasing the 17 device-resident uniques.
    frames_w = [frames[i if i < 17 else i - 16] for i in range(G * 16 + 1)]
    anchors = {g: frames_w[g] for g in range(0, G * 16 + 1, 16)}
    starts = list(range(0, G * 16, 16))

    # warm: compiles every level's batch shape
    code_gops_batched(
        frames_w, anchors, table, inter_fn, starts, max_batch=max_batch
    )

    windows = 2
    t0 = time.perf_counter()
    total_bits = 0.0
    for _ in range(windows):
        decoded, sizes = code_gops_batched(
            frames_w, anchors, table, inter_fn, starts, max_batch=max_batch
        )
        total_bits += sum(sizes.values())
    dt = time.perf_counter() - t0
    assert total_bits > 0
    fps = windows * G * 15 / dt  # 15 B-frames per GOP-16

    print(
        json.dumps(
            {
                "metric": "lhbdc_1080p_gop16_eval_fps",
                "value": round(fps, 3),
                "unit": "B-frames/s/chip",
                "vs_baseline": round(fps / REFERENCE_CPU_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
