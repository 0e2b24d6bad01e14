"""Per-family REAL-bitstream 1080p GOP-16 enc+dec throughput (B-frames/s).

bench.py measures the flagship LHBDC family; this script covers the rest
(VERDICT r2 task #3): flexrate (v2), deform_b (v3), flowguided_b (v4,
fixed down_ratio or --adaptive search), and the DMC P-frame codec
(low-delay chain). Same methodology as bench.py: level-batched coding with
chunks padded to ONE batch shape (fps counts real frames only), one warm
window (graph loads), then timed windows; decode bit-exactness asserted
against the encoder reconstructions.

    python scripts/bench_families.py --family deform_b [--max_batch 2]
    python scripts/bench_families.py --family flowguided_b --adaptive
    python scripts/bench_families.py --family dmc [--frames 9]

Prints one JSON line. Random-init weights: bpp is a plumbing smoke metric,
not an RD number.
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


def make_frames(n, h, w):
    rng = np.random.default_rng(0)
    base = rng.random((h, w, 3), dtype=np.float32)
    drift = (0.01 * rng.standard_normal((h, w, 3))).astype(np.float32)
    return [
        jnp.asarray(np.clip(base + i * drift, 0, 1))[None] for i in range(n)
    ]


def build(family, small):
    key = jax.random.key(0)
    if family == "flexrate":
        from tpuvc.models.flexrate import BidirFlowRef, FlexRateCoder

        model = BidirFlowRef(N=128)
        variables = model.init(
            key, small, small, small, 0, 1.0, "dequantize"
        )
        return FlexRateCoder(model, variables)
    if family == "deform_b":
        from tpuvc.models.deform_b import DeformB, DeformBCoder

        model = DeformB()
        variables = model.init(key, small, small, small, 0, "dequantize")
        return DeformBCoder(model, variables)
    if family == "flowguided_b":
        from tpuvc.models.flowguided_b import FlowGuidedB, FlowGuidedBCoder

        model = FlowGuidedB()
        variables = model.init(
            key, small, small, small, 0, 0.5, -0.5, 1, "dequantize"
        )
        return FlowGuidedBCoder(model, variables)
    if family == "dmc":
        from tpuvc.models.dmc import PFrameDMC, PFrameDMCCoder

        model = PFrameDMC()
        dpb = {"ref_frame": small, "ref_feature": None,
               "ref_down_ratio": 1.0}
        variables = model.init(key, small, dpb, 1.0, "dequantize")
        return PFrameDMCCoder(model, variables)
    raise SystemExit(f"unknown family {family}")


def run_bframe(args, coder):
    from tpuvc.gop.order import gop_coding_table
    from tpuvc.models.flowguided_b import get_scales

    h, w = args.h, args.w
    gop = 16
    B = args.max_batch
    frames = make_frames(gop + 1, h, w)
    table = gop_coding_table(gop)

    def chunks_padded(level_frames):
        for c0 in range(0, len(level_frames), B):
            chunk = level_frames[c0 : c0 + B]
            nr = len(chunk)
            yield chunk + [chunk[-1]] * (B - nr), nr

    fam = args.family

    def encode_chunk(xb, xa, xc, f0, refs0):
        if fam == "flexrate":
            return coder.encode_level_batch_async(xb, xc, xa, n=1, l=0.5)
        if fam == "deform_b":
            return coder.encode_level_batch_async(xb, xa, xc, s=1.0)
        s1, s2 = get_scales(f0, refs0[0], refs0[1])
        return coder.encode_level_batch_async(
            xb, xa, xc, s=1.0, scale1=s1, scale2=s2, down_ratio=1
        )

    def decode_chunk(xb, xa, parsed):
        return coder.decode_level_batch(xb, xa, parsed)

    def code_window():
        decoded = {0: frames[0], gop: frames[gop]}
        recons, pending = {}, []
        for level_frames in table.frames_by_level():
            for chunk, nr in chunks_padded(level_frames):
                refs = [table.refs[f] for f in chunk]
                xb = jnp.concatenate([decoded[a] for a, _ in refs], axis=0)
                xa = jnp.concatenate([decoded[b] for _, b in refs], axis=0)
                xc = jnp.concatenate([frames[f] for f in chunk], axis=0)
                resolve, x_hat = encode_chunk(
                    xb, xa, xc, chunk[0], table.refs[chunk[0]]
                )
                for i, f in enumerate(chunk[:nr]):
                    decoded[f] = x_hat[i : i + 1]
                    recons[f] = x_hat[i : i + 1]
                pending.append((chunk[:nr], resolve))
        out_bits = []
        for real, resolve in pending:
            out_bits.extend(zip(real, resolve()))
        return out_bits, recons

    def decode_window(out_bits):
        stream_of = {f: b for f, b in out_bits}
        decoded = {0: frames[0], gop: frames[gop]}
        outs = {}
        for level_frames in table.frames_by_level():
            for chunk, nr in chunks_padded(level_frames):
                refs = [table.refs[f] for f in chunk]
                xb = jnp.concatenate([decoded[a] for a, _ in refs], axis=0)
                xa = jnp.concatenate([decoded[b] for _, b in refs], axis=0)
                parsed = [
                    type(stream_of[f]).deserialize(stream_of[f].serialize())
                    for f in chunk
                ]
                x_hat = decode_chunk(xb, xa, parsed)
                for i, f in enumerate(chunk[:nr]):
                    decoded[f] = x_hat[i : i + 1]
                    outs[f] = x_hat[i : i + 1]
        return outs

    warm_bits, warm_recons = code_window()
    dec_out = decode_window(warm_bits)
    bit_exact = all(
        bool(jnp.array_equal(dec_out[f], warm_recons[f])) for f in dec_out
    )
    n_real = gop - 1
    t0 = time.perf_counter()
    total_bytes = 0
    for _ in range(args.windows):
        out_bits, _ = code_window()
        total_bytes += sum(
            len(b.serialize()) for _, b in out_bits
        )
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.windows):
        decode_window(warm_bits)
    t_dec = time.perf_counter() - t0
    return {
        "n_frames": args.windows * n_real,
        "t_enc": t_enc,
        "t_dec": t_dec,
        "bit_exact": bit_exact,
        "bpp": 8 * total_bytes / (args.windows * n_real * h * w),
        "padded_compute_pct": round(100 * (16 - 15) / 16, 2),
    }


def run_v4_adaptive(args, coder):
    """Sequential v4 coding with the per-frame integer down-ratio search
    (ICIP2024/src/opt_helpers.py:41-51 protocol: 5 flow-only prediction
    evals per frame, warp-PSNR argmax)."""
    from tpuvc.gop.adaptive import best_down_ratio_prediction
    from tpuvc.gop.order import gop_coding_table
    from tpuvc.models.flowguided_b import FlowGuidedB, get_scales

    h, w = args.h, args.w
    gop = 16
    frames = make_frames(gop + 1, h, w)
    table = gop_coding_table(gop)
    pred_cache = {}

    def code_window():
        decoded = {0: frames[0], gop: frames[gop]}
        out = []
        for level_frames in table.frames_by_level():
            for f in level_frames:
                a, b = table.refs[f]
                ref1, ref2 = decoded[a], decoded[b]
                s1, s2 = get_scales(f, a, b)

                def predict(r, ref1=ref1, ref2=ref2, s1=s1, s2=s2):
                    if r not in pred_cache:
                        pred_cache[r] = jax.jit(
                            lambda v, x1, x2, a_, b_, r=r: coder.model.apply(
                                v, x1, x2, a_, b_, r,
                                method=FlowGuidedB.prediction_flowonly,
                            )
                        )
                    return pred_cache[r](coder.variables, ref1, ref2, s1, s2)

                ratio, _ = best_down_ratio_prediction(predict, frames[f])
                bits, x_hat = coder.encode_recon(
                    ref1, ref2, frames[f], s=1.0, scale1=s1, scale2=s2,
                    down_ratio=int(ratio),
                )
                decoded[f] = x_hat
                out.append((f, bits))
        return out, decoded

    def decode_window(out):
        """Sequential decode of the adaptive streams: the per-frame
        down_ratio rides the VFrameBitstream header, so the decoder
        replays the search's choices without re-running it."""
        decoded = {0: frames[0], gop: frames[gop]}
        for f, bits in out:
            a, b = table.refs[f]
            decoded[f] = coder.decode(
                decoded[a], decoded[b],
                type(bits).deserialize(bits.serialize()),
            )
        float(jnp.asarray(decoded[out[-1][0]][0, 0, 0, 0]))  # force tail
        return decoded

    warm_bits, warm_recons = code_window()
    dec_out = decode_window(warm_bits)
    bit_exact = all(
        bool(jnp.array_equal(dec_out[f], warm_recons[f]))
        for f, _ in warm_bits
    )
    t0 = time.perf_counter()
    for _ in range(args.windows):
        out, _ = code_window()
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.windows):
        decode_window(warm_bits)
    t_dec = time.perf_counter() - t0
    total_bytes = sum(len(b.serialize()) for _, b in out)
    return {
        "n_frames": args.windows * (gop - 1),
        "t_enc": t_enc,
        "t_dec": t_dec,
        "bit_exact": bit_exact,
        "bpp": 8 * total_bytes / ((gop - 1) * h * w),
        "mode": "adaptive",
    }


def run_dmc(args, coder):
    """Low-delay P chain: I anchor (raw) + (n-1) P frames."""
    h, w = args.h, args.w
    n = args.frames
    frames = make_frames(n, h, w)

    def code_chain():
        # encode_async: frame i+1's device transforms dispatch while frame
        # i's symbol fetches + host rANS drain on the worker (the blocking
        # per-frame encode serialized ~0.5 s of relay traffic per frame).
        dpb = {"ref_frame": frames[0], "ref_feature": None,
               "ref_down_ratio": 1.0}
        futs = []
        for i in range(1, n):
            fut, dpb = coder.encode_async(frames[i], dpb, ratio=1.0, q=0.5)
            futs.append(fut)
        return [f.result() for f in futs], dpb

    def decode_chain(streams):
        dpb = {"ref_frame": frames[0], "ref_feature": None,
               "ref_down_ratio": 1.0}
        xs, dpb = coder.decode_sequence(
            dpb,
            [type(b).deserialize(b.serialize()) for b in streams],
        )
        # force the tail (block_until_ready does not block on the relay)
        float(jnp.asarray(dpb["ref_frame"][0, 0, 0, 0]))
        return dpb

    warm_streams, enc_dpb = code_chain()
    dec_dpb = decode_chain(warm_streams)
    bit_exact = bool(
        jnp.array_equal(dec_dpb["ref_frame"], enc_dpb["ref_frame"])
    )
    t0 = time.perf_counter()
    for _ in range(args.windows):
        out, _ = code_chain()
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.windows):
        decode_chain(warm_streams)
    t_dec = time.perf_counter() - t0
    total_bytes = sum(len(b.serialize()) for b in out)
    return {
        "n_frames": args.windows * (n - 1),
        "t_enc": t_enc,
        "t_dec": t_dec,
        "bit_exact": bit_exact,
        "bpp": 8 * total_bytes / ((n - 1) * h * w),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True,
                   choices=["flexrate", "deform_b", "flowguided_b", "dmc"])
    p.add_argument("--max_batch", type=int, default=None,
                   help="level-batch chunk size (default: 4 flexrate, "
                        "2 for v3/v4)")
    p.add_argument("--windows", type=int, default=1)
    p.add_argument("--frames", type=int, default=9, help="DMC chain length")
    p.add_argument("--adaptive", action="store_true",
                   help="v4: per-frame down-ratio search (sequential "
                        "enc+dec; ratio rides the stream header)")
    p.add_argument("--hw", default="1088x1920")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="bfloat16",
                   help="layer compute policy for the coding graphs "
                        "(bench.py's r5 default; float32 reproduces the "
                        "r4 table's configuration)")
    args = p.parse_args()
    args.h, args.w = (int(s) for s in args.hw.split("x"))
    if args.max_batch is None:
        args.max_batch = 4 if args.family == "flexrate" else 2

    from tpuvc.ops.precision import policy_from_name

    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    coder = build(args.family, small)
    # Trace-time policy: wrap warm-up AND timed windows in one context so
    # every coder graph bakes the same dtype (enc/dec bit-identity).
    with policy_from_name(args.compute_dtype):
        if args.family == "dmc":
            r = run_dmc(args, coder)
        elif args.adaptive:
            if args.family != "flowguided_b":
                raise SystemExit("--adaptive is a v4 mode")
            r = run_v4_adaptive(args, coder)
        else:
            r = run_bframe(args, coder)

    nf = r.pop("n_frames")
    t_enc, t_dec = r.pop("t_enc"), r.pop("t_dec")
    out = {
        "family": args.family + ("-adaptive" if args.adaptive else ""),
        "hw": args.hw,
        "compute_dtype": args.compute_dtype,
        "encode_fps": round(nf / t_enc, 3),
        "decode_fps": (
            round(nf / t_dec, 3) if t_dec == t_dec else None
        ),
        "encdec_fps": (
            round(2 * nf / (t_enc + t_dec), 3) if t_dec == t_dec else None
        ),
        "bpp_random_init_smoke": round(r.pop("bpp"), 4),
        "decode_bit_exact": r.pop("bit_exact"),
        **r,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
