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

    model = LHBDC(N=128)
    h, w = 1088, 1920  # 1080p padded to x64
    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    variables = model.init(
        jax.random.key(0), small, small, small, "dequantize"
    )

    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
        for _ in range(3)
    ]

    @jax.jit
    def forward(v, xb, xc, xa):
        out = model.apply(v, xb, xc, xa, "dequantize")
        return out["x_hat"], out["bits"]

    # Compile + warmup. block_until_ready is unreliable on the axon relay
    # backend (async futures); a host fetch of the result scalar is the
    # honest completion barrier.
    x_hat, bits = forward(variables, *frames)
    float(bits)

    iters = 10
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        x_hat, bits = forward(
            variables, frames[i % 3], frames[(i + 1) % 3], frames[(i + 2) % 3]
        )
        outs.append(bits)
    total_bits = sum(float(b) for b in outs)  # forces completion of all
    dt = time.perf_counter() - t0
    assert total_bits > 0
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
