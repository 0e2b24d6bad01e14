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
    import jax
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

    # Compile + warmup.
    x_hat, bits = forward(variables, *frames)
    x_hat.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        x_hat, bits = forward(variables, *frames)
    x_hat.block_until_ready()
    dt = time.perf_counter() - t0
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
