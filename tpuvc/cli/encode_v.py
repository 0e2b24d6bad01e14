"""Encode a frame sequence hierarchically (I + dyadic B GOPs) to one file.

    python -m tpuvc.cli.encode_v --frames /data/UVG/beauty --n_frames 65 \
        --bin out.tpvb --family lhbdc --gop 16 --l 1626

Whole-sequence surface for the hierarchical B codecs: ELIC intra streams
at GOP boundaries, B-frame streams from the chosen family in the dyadic
coding order, all in one VSequenceBitstream file. The reference codes one
B-frame per file (LHBDC/encode_B.py:114-126) and evaluates sequences with
likelihood bit-counts only; this CLI is the real-bitstream completion of
that pipeline. The decoder (tpuvc.cli.decode_v) re-derives the schedule
from the header and the reference-frame pairs from the same DPB walk, so
streams are self-contained.

The encoder reconstructs every coded frame exactly as the decoder will
(same decode path, same DPB), so encoder/decoder drift is structurally
impossible.

Weights: ``--weights`` points at the B-family checkpoint directory (same
naming as encode_b), ``--weights_intra`` at the ELIC .msgpack;
``--init random`` skips loading for structural smoke runs.
"""

from __future__ import annotations

import argparse
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", default=None,
                   help="directory of PNG frames (sorted)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic frames instead of --frames")
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--n_frames", type=int, default=None)
    p.add_argument("--bin", default="out.tpvb")
    p.add_argument(
        "--family",
        choices=["lhbdc", "flexrate", "deform_b", "flowguided_b"],
        default="lhbdc",
    )
    p.add_argument("--gop", type=int, default=16)
    # Rate knobs (family-dependent, as in encode_b).
    p.add_argument("--l", type=int, default=1626,
                   help="lhbdc lambda / flexrate interp numerator id")
    p.add_argument("--n", type=int, default=0,
                   help="flexrate gain level")
    p.add_argument("--interp", type=float, default=1.0,
                   help="flexrate interpolation factor")
    p.add_argument("--s", type=float, default=0.0,
                   help="v3/v4 fractional rate level")
    p.add_argument("--down_ratio", type=int, default=1,
                   help="v4 motion downsampling ratio")
    p.add_argument("--adaptive", action="store_true",
                   help="v4 per-frame down-ratio search (argmax warp-PSNR "
                        "over {1,2,4,8,16}, ICIP2024/src/opt_helpers.py:41-51)"
                   )
    p.add_argument("--level_batched", action="store_true",
                   help="code frames of the same hierarchy level in one "
                        "batched device forward (any family; the stream "
                        "records the mode — decode_v replays the same "
                        "batch shapes)")
    p.add_argument("--max_batch", type=int, default=8,
                   help="per-forward batch cap for --level_batched")
    p.add_argument("--mesh", type=int, default=1,
                   help="shard --level_batched device stages over an "
                        "N-device mesh (all four families; recorded "
                        "in the header — decode_v must use the same mesh "
                        "size for the entropy decode to stay bit-identical)")
    p.add_argument("--window_gops", type=int, default=1,
                   help="GOPs coded together per window in --level_batched "
                        "mode: the same hierarchy level across the window's "
                        "GOPs shares one forward (HBM-bounded; 2 is the "
                        "1080p sweet spot)")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="layer compute policy (tpuvc.ops.precision); "
                        "recorded in the stream header so decode_v traces "
                        "its graphs under the same numerics")
    p.add_argument("--weights", default="pretrained_weights")
    p.add_argument("--weights_intra", default="elic.msgpack")
    p.add_argument("--init", choices=["load", "random"], default="load")
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--intra_N", type=int, default=192)
    p.add_argument("--intra_M", type=int, default=320)
    p.add_argument("--intra_groups", default=None,
                   help="comma ints summing to intra_M (default ELIC groups)")
    return p


def build_intra(args):
    import jax
    import jax.numpy as jnp

    from tpuvc.models.elic import ELIC, ELICCoder

    if args.intra_groups:
        groups = tuple(int(v) for v in args.intra_groups.split(","))
    else:
        groups = (16, 16, 32, 64, 192) if args.intra_M == 320 else None
    kw = {"N": args.intra_N, "M": args.intra_M}
    if groups is not None:
        kw["groups"] = groups
    intra = ELIC(**kw)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = intra.init(jax.random.key(0), x, "dequantize")
    if args.init == "load":
        from tpuvc.utils.checkpoint import load_checkpoint

        variables = {"params": load_checkpoint(args.weights_intra)["params"]}
    return ELICCoder(intra, variables)


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


def code_b_frame(coder, family, args, ref1, ref2, xcur, idx, o1, o2,
                 pred_cache=None):
    """Encode one B-frame; returns (bitstream, decoder-identical recon)."""
    if family == "lhbdc":
        return coder.encode_recon(ref1, xcur, ref2, rate_id=args.l)
    if family == "flexrate":
        return coder.encode_recon(ref1, xcur, ref2, n=args.n, l=args.interp)
    if family == "deform_b":
        return coder.encode_recon(ref1, ref2, xcur, s=args.s)
    from tpuvc.models.flowguided_b import get_scales

    s1, s2 = get_scales(idx, o1, o2)
    ratio = args.down_ratio
    if args.adaptive:
        import jax

        from tpuvc.gop.adaptive import best_down_ratio_prediction
        from tpuvc.models.flowguided_b import FlowGuidedB

        def predict(r):
            if r not in pred_cache:
                pred_cache[r] = jax.jit(
                    lambda v, a, b, x1, x2, r=r: coder.model.apply(
                        v, a, b, x1, x2, r,
                        method=FlowGuidedB.prediction_flowonly,
                    )
                )
            return pred_cache[r](coder.variables, ref1, ref2, s1, s2)

        ratio, _ = best_down_ratio_prediction(predict, xcur)
        print(f"  frame {idx}: down_ratio {ratio}")
    return coder.encode_recon(
        ref1, ref2, xcur, s=args.s, scale1=s1, scale2=s2,
        down_ratio=ratio,
    )


def _encode_level_batched(args, frames, coder, intra_coder):
    """Real-bitstream level-batched encoding (all four families): frames of one
    hierarchy level share every device forward (the eval scheduler's
    batching, applied to actual coding). The decoder replays identical
    batch shapes (VSequenceBitstream mode=1), which is what keeps the
    entropy decode in sync — see the container docstring."""
    import jax.numpy as jnp

    from tpuvc.coder.container import IFrameBitstream, VSequenceBitstream
    from tpuvc.gop.order import gop_coding_table
    h, w = frames.size
    n = len(frames)
    gop = args.gop
    if (n - 1) % gop != 0:
        raise SystemExit(
            f"--level_batched needs k*{gop}+1 frames, got {n}; "
            "drop the tail or use the sequential mode"
        )
    table = gop_coding_table(gop)
    if args.mesh > 1:
        # Shard every level-batch device stage over the mesh; host rANS
        # stays per-frame. The header records the mesh size (see
        # VSequenceBitstream.mesh for why the decoder must match it).
        if not hasattr(coder, "set_shard"):
            raise SystemExit(
                f"--mesh is not supported for family {args.family!r} yet"
            )
        if not 1 <= args.mesh <= 255:
            raise SystemExit(
                f"--mesh {args.mesh} out of range (header field is uint8, "
                "1..255)"
            )
        import jax

        if args.mesh > len(jax.devices()):
            # make_mesh would silently truncate to the available devices,
            # desyncing the recorded mesh size from the programs actually
            # compiled (mirrors decode_v's check).
            raise SystemExit(
                f"--mesh {args.mesh} but only {len(jax.devices())} "
                "devices available"
            )
        from tpuvc.parallel.mesh import level_batch_sharder, make_mesh

        coder.set_shard(level_batch_sharder(make_mesh(args.mesh)))
    records: list = []
    anchors: dict = {}
    t0 = time.perf_counter()

    from tpuvc.data.uvg import device_frame

    import os as _os

    timing = bool(_os.environ.get("TPUVC_TIMING"))

    from tpuvc.ops.precision import policy_from_name

    def intra_batch(fresh):
        """Code a window's fresh anchors in one batched forward (decoder
        groups the consecutive I records and replays the same B)."""
        ti = time.perf_counter()
        xs = jnp.concatenate(
            [device_frame(frames.u8(b)) for b in fresh], axis=0
        )
        out = intra_coder.compress_batch(xs)
        dec = jnp.clip(intra_coder.synthesize(out["y_hat"]), 0.0, 1.0)
        z_shape = tuple(int(v) for v in out["shape"])
        for j, b in enumerate(fresh):
            anchors[b] = dec[j : j + 1]
            y_strs, z_str = out["strings"][j]
            blob = IFrameBitstream(
                z_shape=z_shape, streams=list(y_strs) + [z_str]
            ).serialize()
            records.append(("I", b, blob))
        if timing:
            print(f"  intra_batch {fresh}: {time.perf_counter() - ti:.2f}s")

    def code_window(w0):
        """Code one window of up to --window_gops GOPs: the same hierarchy
        level of every GOP in the window shares one batched forward (the
        eval scheduler's cross-GOP batching, applied to real coding)."""
        starts = list(
            range(w0, min(w0 + max(1, args.window_gops) * gop, n - 1), gop)
        )
        fresh = [
            b for b in [w0] + [g + gop for g in starts] if b not in anchors
        ]
        if fresh:
            intra_batch(fresh)
        # Frames before this window can no longer be referenced.
        for k in [k for k in anchors if k < w0]:
            del anchors[k]
        decoded = {}  # absolute index
        for g in starts:
            decoded[g] = anchors[g]
            decoded[g + gop] = anchors[g + gop]
        # Host phases drain on workers; each level's futures are resolved
        # right after the NEXT level dispatches (one level behind), so a
        # rANS/packing exception surfaces within a level of its cause and
        # resolved closures release their pinned symbol arrays instead of
        # accumulating across the whole window (ADVICE r3).
        pending_prev = []  # previous level's (chunk, resolve)
        for level_frames in table.frames_by_level():
            pending_cur = []
            work = [(g0, f) for f in level_frames for g0 in starts]
            for c0 in range(0, len(work), args.max_batch):
                tc = time.perf_counter()
                chunk = work[c0 : c0 + args.max_batch]
                refs = [table.refs[f] for _, f in chunk]
                xb = jnp.concatenate(
                    [decoded[g0 + a] for (g0, _), (a, _) in zip(chunk, refs)],
                    axis=0,
                )
                xa = jnp.concatenate(
                    [decoded[g0 + b] for (g0, _), (_, b) in zip(chunk, refs)],
                    axis=0,
                )
                xc = jnp.concatenate(
                    [device_frame(frames.u8(g0 + f)) for g0, f in chunk],
                    axis=0,
                )
                # async variants: the next chunk's device work dispatches
                # while this chunk's symbols stream back / rANS packs
                if args.family == "lhbdc":
                    resolve, x_hat = coder.encode_level_batch_async(
                        xb, xc, xa, rate_id=args.l
                    )
                elif args.family == "flexrate":
                    resolve, x_hat = coder.encode_level_batch_async(
                        xb, xc, xa, n=args.n, l=args.interp
                    )
                elif args.family == "deform_b":
                    resolve, x_hat = coder.encode_level_batch_async(
                        xb, xa, xc, s=args.s
                    )
                else:
                    from tpuvc.models.flowguided_b import get_scales

                    a0, b0 = refs[0]
                    s1, s2 = get_scales(chunk[0][1], a0, b0)
                    resolve, x_hat = coder.encode_level_batch_async(
                        xb, xa, xc, s=args.s, scale1=s1, scale2=s2,
                        down_ratio=args.down_ratio,
                    )
                x_hat = jnp.clip(x_hat, 0.0, 1.0)
                for i, (g0, f) in enumerate(chunk):
                    decoded[g0 + f] = x_hat[i : i + 1]
                pending_cur.append((chunk, resolve))
                if timing:
                    print(
                        f"  chunk {chunk} (B={len(chunk)}): "
                        f"{time.perf_counter() - tc:.2f}s dispatch"
                    )
            for chunk, resolve in pending_prev:
                for (g0, f), b in zip(chunk, resolve()):
                    records.append(("B", g0 + f, b.serialize()))
            pending_prev = pending_cur
        for chunk, resolve in pending_prev:
            for (g0, f), b in zip(chunk, resolve()):
                records.append(("B", g0 + f, b.serialize()))
        print(f"window {w0}..{starts[-1] + gop} coded")

    # Policy wraps the jit call sites (graphs trace under it); the header
    # records it so decode_v traces under the same numerics.
    window = max(1, args.window_gops) * gop
    with policy_from_name(args.compute_dtype):
        for w0 in range(0, n - 1, window):
            code_window(w0)

    seq = VSequenceBitstream(
        family=args.family, width=w, height=h, gop=gop, n_frames=n,
        frames=records, mode=1, max_batch=args.max_batch,
        dtype=1 if args.compute_dtype == "bfloat16" else 0,
        window_gops=max(1, args.window_gops), mesh=max(1, args.mesh),
    )
    blob = seq.serialize()
    with open(args.bin, "wb") as f:
        f.write(blob)
    print(
        f"wrote {len(blob)} bytes ({n} frames, "
        f"{8 * len(blob) / (h * w * n):.4f} bpp, level-batched) to "
        f"{args.bin} in {time.perf_counter() - t0:.1f}s"
    )


def main(argv=None):
    args = build_parser().parse_args(argv)

    from tpuvc.utils.jaxcache import enable as enable_cache

    enable_cache()

    import jax.numpy as jnp

    from tpuvc.cli.encode_b import load_model, make_coder
    from tpuvc.coder.container import IFrameBitstream, VSequenceBitstream
    from tpuvc.eval.metrics import psnr_uint8
    from tpuvc.gop.dpb import DecodedPictureBuffer
    from tpuvc.gop.order import sequence_schedule

    frames = load_frames(args)
    h, w = frames.size
    n = len(frames)
    model, variables = load_model(args)
    coder = make_coder(args, model, variables)
    intra_coder = build_intra(args)

    if args.level_batched:
        if args.adaptive:
            raise SystemExit(
                "--adaptive needs the sequential mode (the per-frame "
                "ratio search breaks level batching); drop one flag"
            )
        return _encode_level_batched(args, frames, coder, intra_coder)

    if args.mesh > 1:
        raise SystemExit("--mesh requires --level_batched")

    from tpuvc.ops.precision import policy_from_name

    order, typ = sequence_schedule(args.gop, n)
    dpb = DecodedPictureBuffer()
    blobs: list = []
    pred_cache: dict = {}
    t0 = time.perf_counter()
    # The policy wraps the jit CALL SITES: coder graphs trace under it, so
    # bf16 layer compute bakes into every compiled program (and the header
    # tells decode_v to trace under the same policy).
    from tpuvc.data.uvg import device_frame

    with policy_from_name(args.compute_dtype):
        for idx in order:
            x = device_frame(frames.u8(idx))
            if typ[idx] == "I":
                out = intra_coder.compress(x)
                dec = intra_coder.synthesize(out["y_hat"])
                blob = IFrameBitstream.from_compress(out).serialize()
                ftyp = "I"
            else:
                ref1, ref2, o1, o2 = dpb.select_references(idx)
                # encode_recon reconstructs from the decoder-identical
                # quantized latents, so the buffered frame is exactly what
                # decode_v will buffer — without a second full decode pass.
                bits, dec = code_b_frame(
                    coder, args.family, args, ref1, ref2, x, idx, o1, o2,
                    pred_cache=pred_cache,
                )
                blob = bits.serialize()
                ftyp = "B"
            dec = jnp.clip(dec, 0.0, 1.0)
            dpb.add(dec, idx)
            blobs.append((idx, ftyp, blob))
            p = psnr_uint8(dec[:, :h, :w], x[:, :h, :w])
            print(
                f"frame {idx:4d} {ftyp} {len(blob)} bytes "
                f"({8 * len(blob) / (h * w):.4f} bpp) psnr {float(p):.2f}"
            )
    seq = VSequenceBitstream(
        family=args.family, width=w, height=h, gop=args.gop, n_frames=n,
        frames=[(t, i, b) for i, t, b in blobs],
        dtype=1 if args.compute_dtype == "bfloat16" else 0,
    )
    blob = seq.serialize()
    with open(args.bin, "wb") as f:
        f.write(blob)
    print(
        f"wrote {len(blob)} bytes ({n} frames, "
        f"{8 * len(blob) / (h * w * n):.4f} bpp) to {args.bin} "
        f"in {time.perf_counter() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
