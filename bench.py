"""Benchmark: 1080p GOP B-frame coding throughput on one chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the flagship forward (full differentiable eval pass: flows + MV
codec + compensation + residual codec + bit accounting) on 1080p frames,
the unit of work of the reference's hot eval loop
(/root/reference/LHBDC/test/testing.py:167, ~7 B-frames per GOP-8).

vs_baseline is against the reference PyTorch-CPU throughput target from
BASELINE.json (>10x per chip). The reference authors quote ~1s/frame on
their GPU for flow+mask alone (LHBDC/encode_B.py:87-99); the driver's
PyTorch-CPU anchor is slower still. We report frames/s and normalize against
a 0.1 fps CPU anchor estimate (10 s/frame for the full model on CPU).
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
        jnp.asarray(np.clip(base + i * drift, 0, 1))[None] for i in range(9)
    ]

    @jax.jit
    def forward(v, r1, r2, xc):
        # bf16 layer compute, f32 flow/warp/entropy math (tpuvc.ops.precision)
        with mixed_precision():
            out = model.apply(v, r1, xc, r2, "dequantize")
        return out["x_hat"], out["sizes"]

    # Throughput measurement: a stream of independent B-frame evaluations
    # (the shape of multi-sequence / multi-level RD evaluation, where frames
    # from different GOPs pipeline freely). Completion is forced by fetching
    # every output size at the end — block_until_ready is unreliable on the
    # axon relay backend (async futures).
    x_hat, sizes = forward(variables, frames[0], frames[8], frames[4])
    float(sizes[0])  # warm

    iters = 12
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        a, b, c = frames[i % 7], frames[i % 7 + 2], frames[i % 7 + 1]
        _, s = forward(variables, a, b, c)
        outs.append(s)
    total = sum(float(s[0]) for s in outs)
    dt = time.perf_counter() - t0
    assert total > 0
    fps = iters / dt

    print(
        json.dumps(
            {
                "metric": "lhbdc_1080p_bframe_eval_fps",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / REFERENCE_CPU_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
