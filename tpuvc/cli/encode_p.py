"""Encode a frame sequence low-delay (I + chained P-frames) to one file.

    python -m tpuvc.cli.encode_p --frames /data/UVG/beauty --n_frames 33 \
        --bin out.tpvs --q 1.0 --adaptive --intra_period 32

CLI surface of the OJSP-style P-frame coding path: the reference drives
DMC.encode per frame from the DCVC harness (/root/reference/OJSP2025/
video_model.py:505-528 with the ratio search at 621-666); here one command
codes a whole sequence into a PSequenceBitstream — ELIC intra streams for
I-frames, PFrameDMCCoder streams for P-frames, fractional down-ratio search
with hysteresis when ``--adaptive`` is set.

Weights: ``--weights_intra``/``--weights_dmc`` point at .msgpack
checkpoints; ``--init random`` skips loading (structural smoke runs).
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", default=None,
                   help="directory of PNG frames (sorted)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic frames instead of --frames")
    p.add_argument("--width", type=int, default=192,
                   help="synthetic frame width")
    p.add_argument("--height", type=int, default=128,
                   help="synthetic frame height")
    p.add_argument("--n_frames", type=int, default=None)
    p.add_argument("--bin", default="out.tpvs")
    p.add_argument("--q", type=float, default=0.0,
                   help="rate level (fractional; gain interpolation)")
    p.add_argument("--ratio", type=float, default=1.0,
                   help="fixed motion down-sampling ratio")
    p.add_argument("--adaptive", action="store_true",
                   help="per-frame fractional ratio search with hysteresis")
    p.add_argument("--ratios", default="1.0,1.25,1.5,2.0,3.0,4.0",
                   help="candidate ratios for --adaptive (each compiles one "
                        "flow graph; the full OJSP grid is 1..8.75 step .25)")
    p.add_argument("--intra_period", type=int, default=32)
    p.add_argument("--weights_intra", default="elic.msgpack")
    p.add_argument("--weights_dmc", default="dmc.msgpack")
    p.add_argument("--init", choices=["load", "random"], default="load")
    p.add_argument("--feat", type=int, default=48)
    p.add_argument("--N", type=int, default=64)
    p.add_argument("--intra_N", type=int, default=192)
    p.add_argument("--intra_M", type=int, default=320)
    p.add_argument("--intra_groups", default=None,
                   help="comma ints summing to intra_M (default ELIC groups)")
    return p


def load_frames(args):
    if args.synthetic:
        from tpuvc.data.uvg import SyntheticSequence

        return SyntheticSequence(
            n_frames=args.synthetic, h=args.height, w=args.width
        )
    from tpuvc.data.uvg import SequenceFrames

    if not args.frames:
        raise SystemExit("need --frames DIR or --synthetic N")
    return SequenceFrames(args.frames, n_frames=args.n_frames)


def build_codecs(args):
    import jax
    import jax.numpy as jnp

    from tpuvc.models.dmc import PFrameDMC
    from tpuvc.models.elic import ELIC

    key = jax.random.key(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)

    if args.intra_groups:
        groups = tuple(int(v) for v in args.intra_groups.split(","))
    else:
        groups = (16, 16, 32, 64, 192) if args.intra_M == 320 else None
    kw = {"N": args.intra_N, "M": args.intra_M}
    if groups is not None:
        kw["groups"] = groups
    intra = ELIC(**kw)
    intra_vars = intra.init(key, x, "dequantize")

    dmc = PFrameDMC(feat=args.feat, N=args.N)
    dpb = {"ref_frame": x, "ref_feature": None, "ref_down_ratio": 1.0}
    dmc_vars = dmc.init(key, x, dpb, 1.0, "dequantize")

    if args.init == "load":
        from tpuvc.utils.checkpoint import load_checkpoint

        intra_vars = {"params": load_checkpoint(args.weights_intra)["params"]}
        dmc_vars = {"params": load_checkpoint(args.weights_dmc)["params"]}
    return (intra, intra_vars), (dmc, dmc_vars)


def main(argv=None):
    args = build_parser().parse_args(argv)

    from tpuvc.utils.jaxcache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuvc.coder.container import (
        IFrameBitstream,
        PFrameBitstream,
        PSequenceBitstream,
    )
    from tpuvc.gop.adaptive import fractional_ratio_search
    from tpuvc.models.dmc import PFrameDMC, PFrameDMCCoder
    from tpuvc.models.elic import ELICCoder

    frames = load_frames(args)
    h, w = frames.size
    (intra, intra_vars), (dmc, dmc_vars) = build_codecs(args)
    intra_coder = ELICCoder(intra, intra_vars)
    p_coder = PFrameDMCCoder(dmc, dmc_vars)

    ratios = tuple(float(r) for r in args.ratios.split(","))
    warp_pred = {}

    def predict(x, ref):
        def p(ratio):
            if ratio not in warp_pred:
                warp_pred[ratio] = jax.jit(
                    lambda v, a, b, r=ratio: dmc.apply(
                        v, a, b, r, method=PFrameDMC.warp_prediction
                    )
                )
            return warp_pred[ratio](dmc_vars, x, ref)

        return p

    seq = PSequenceBitstream(width=w, height=h)
    dpb = None
    entries: list = []  # (type, blob | Future[PFrameBitstream])
    t0 = time.perf_counter()
    from tpuvc.data.uvg import device_frame

    for i in range(len(frames)):
        x = device_frame(frames.u8(i))
        if i % args.intra_period == 0:
            out = intra_coder.compress(x)
            dec = jnp.clip(intra_coder.synthesize(out["y_hat"]), 0.0, 1.0)
            blob = IFrameBitstream.from_compress(out).serialize()
            dpb = {"ref_frame": dec, "ref_feature": None,
                   "ref_down_ratio": 1.0}
            entries.append(("I", blob))
            ratio = 1.0
        else:
            if args.adaptive:
                ratio, _, _ = fractional_ratio_search(
                    predict(x, dpb["ref_frame"]), x,
                    prev_ratio=dpb["ref_down_ratio"], ratios=ratios,
                )
            else:
                ratio = args.ratio
            # Async split: the DPB comes back immediately (device chain);
            # host rANS packs the stream on a worker thread, overlapping
            # the next frame's transforms. Backpressure: each pending
            # future pins its frame's symbol planes on device, so bound
            # the backlog in case host packing lags the device.
            pending = [f for _, f in entries if not isinstance(f, bytes)]
            if len([f for f in pending if not f.done()]) >= 4:
                pending[-4].result()
            fut, dpb = p_coder.encode_async(x, dpb, ratio=ratio, q=args.q)
            entries.append(("P", fut))
        print(f"frame {i:4d} {entries[-1][0]} ratio {ratio}")
    for typ, item in entries:
        blob = item if isinstance(item, bytes) else item.result().serialize()
        seq.frames.append((typ, blob))
    for i, (typ, blob) in enumerate(seq.frames):
        print(
            f"frame {i:4d} {typ} {len(blob)} bytes "
            f"({8 * len(blob) / (h * w):.4f} bpp)"
        )
    blob = seq.serialize()
    with open(args.bin, "wb") as f:
        f.write(blob)
    print(
        f"wrote {len(blob)} bytes ({len(frames)} frames) to {args.bin} "
        f"in {time.perf_counter() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
