"""Real-bitstream coding benchmark: 1080p LHBDC level-batched encode fps.

Measures the FULL north-star unit of work (BASELINE.json: enc+dec with
real streams), unlike bench.py which measures the likelihood-eval
transform path. Uses the encode_v level-batched machinery directly on
synthetic 1080p frames (random-init weights — throughput is
content-independent), reporting steady-state B-frames/s over a warm
second window so per-process graph-load latency (PERF.md) is excluded.

    python scripts/bench_real.py [--gop 16] [--windows 2] [--small]
"""

from __future__ import annotations

import argparse
import json
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gop", type=int, default=16)
    p.add_argument("--windows", type=int, default=2,
                   help="timed GOP windows after the warm one")
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--small", action="store_true",
                   help="192x192 shapes (CPU smoke)")
    p.add_argument("--decode", action="store_true",
                   help="also time the batched decode of the warm window")
    args = p.parse_args()

    from tpuvc.coder.container import BFrameBitstream
    from tpuvc.gop.order import gop_coding_table
    from tpuvc.models.lhbdc import LHBDC, LHBDCCoder

    h, w = (192, 192) if args.small else (1088, 1920)
    model = LHBDC(N=128)
    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    variables = model.init(jax.random.key(0), small, small, small, "dequantize")
    coder = LHBDCCoder(model, variables)

    rng = np.random.default_rng(0)
    base = rng.random((h, w, 3), dtype=np.float32)
    drift = (0.01 * rng.standard_normal((h, w, 3))).astype(np.float32)
    frames = [
        jnp.asarray(np.clip(base + i * drift, 0, 1))[None]
        for i in range(args.gop + 1)
    ]

    table = gop_coding_table(args.gop)

    def code_gop():
        decoded = {0: frames[0], args.gop: frames[args.gop]}
        out_bits = []
        recons = {}
        for level_frames in table.frames_by_level():
            for c0 in range(0, len(level_frames), args.max_batch):
                chunk = level_frames[c0 : c0 + args.max_batch]
                refs = [table.refs[f] for f in chunk]
                xb = jnp.concatenate([decoded[a] for a, _ in refs], axis=0)
                xa = jnp.concatenate([decoded[b] for _, b in refs], axis=0)
                xc = jnp.concatenate([frames[f] for f in chunk], axis=0)
                bits, x_hat = coder.encode_level_batch(xb, xc, xa, rate_id=845)
                for i, f in enumerate(chunk):
                    decoded[f] = x_hat[i : i + 1]
                    recons[f] = x_hat[i : i + 1]
                    out_bits.append((f, bits[i]))
        return out_bits, recons

    def decode_gop(out_bits):
        decoded = {0: frames[0], args.gop: frames[args.gop]}
        stream_of = dict(out_bits)
        outs = {}
        for level_frames in table.frames_by_level():
            for c0 in range(0, len(level_frames), args.max_batch):
                chunk = level_frames[c0 : c0 + args.max_batch]
                refs = [table.refs[f] for f in chunk]
                xb = jnp.concatenate([decoded[a] for a, _ in refs], axis=0)
                xa = jnp.concatenate([decoded[b] for _, b in refs], axis=0)
                parsed = [
                    BFrameBitstream.deserialize(stream_of[f].serialize())
                    for f in chunk
                ]
                x_hat = coder.decode_level_batch(xb, xa, parsed)
                for i, f in enumerate(chunk):
                    decoded[f] = x_hat[i : i + 1]
                    outs[f] = x_hat[i : i + 1]
        return outs

    print("warm window (compile/load)...", file=sys.stderr)
    t0 = time.perf_counter()
    warm_bits, warm_recons = code_gop()
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    total_bytes = 0
    for _ in range(args.windows):
        out_bits, _ = code_gop()
        total_bytes += sum(b.num_bytes for _, b in out_bits)
    dt = time.perf_counter() - t0
    n_b = args.gop - 1
    fps = args.windows * n_b / dt

    result = {
        "metric": "lhbdc_1080p_gop16_real_encode_fps",
        "value": round(fps, 3),
        "unit": "B-frames/s/chip",
        "vs_baseline": round(fps / 0.1, 2),
        "warmup_s": round(warm, 1),
        "bpp": round(
            8 * total_bytes / (args.windows * n_b * h * w), 4
        ),
    }
    if args.decode:
        decode_gop(warm_bits)  # warm decode graphs
        t0 = time.perf_counter()
        outs = decode_gop(warm_bits)
        result["decode_fps"] = round(n_b / (time.perf_counter() - t0), 3)
        same = all(
            bool(jnp.array_equal(outs[f], warm_recons[f]))
            for f in outs
        )
        result["decode_matches_encode"] = same
    print(json.dumps(result))


if __name__ == "__main__":
    main()
