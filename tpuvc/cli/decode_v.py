"""Decode a hierarchically-coded sequence (VSequenceBitstream) to PNGs.

    python -m tpuvc.cli.decode_v --bin out.tpvb --out_dir /tmp/dec \
        [--frames /data/UVG/beauty]   # originals -> per-frame PSNR

Counterpart of tpuvc.cli.encode_v. The header's (family, gop, n_frames)
triple re-derives the coding schedule (tpuvc.gop.order.sequence_schedule)
and the decoded-picture-buffer walk re-derives every frame's reference
pair, so the file is self-contained given the model weights. I-frames
decode via the ELIC coder, B-frames via the family coder — the same
decode path the encoder used to build its buffer, so reconstructions are
bit-identical to the encoder's (the reference's decode_B PSNR check,
Flex-Rate…/test/decode_B.py:138-144, generalized to sequences).
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bin", default="out.tpvb")
    p.add_argument("--out_dir", default="decoded")
    p.add_argument("--frames", default=None,
                   help="optional originals dir for PSNR")
    p.add_argument("--synthetic", type=int, default=0,
                   help="compare against N synthetic frames (same generator "
                        "as encode_v --synthetic)")
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--height", type=int, default=128)
    # Model knobs must match the encoder's (as with encode_b/decode_b).
    p.add_argument("--weights", default="pretrained_weights")
    p.add_argument("--weights_intra", default="elic.msgpack")
    p.add_argument("--init", choices=["load", "random"], default="load")
    p.add_argument("--l", type=int, default=1626)
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--intra_N", type=int, default=192)
    p.add_argument("--intra_M", type=int, default=320)
    p.add_argument("--intra_groups", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from tpuvc.utils.jaxcache import enable as enable_cache

    enable_cache()

    import jax.numpy as jnp
    import numpy as np

    from tpuvc.cli.encode_b import load_model, make_coder
    from tpuvc.cli.encode_v import build_intra
    from tpuvc.coder.container import (
        BFrameBitstream,
        IFrameBitstream,
        VFrameBitstream,
        VSequenceBitstream,
    )
    from tpuvc.data.frames import save_png
    from tpuvc.eval.metrics import psnr_uint8
    from tpuvc.gop.dpb import DecodedPictureBuffer
    from tpuvc.gop.order import sequence_schedule

    with open(args.bin, "rb") as f:
        seq = VSequenceBitstream.deserialize(f.read())
    args.family = seq.family
    h, w, n = seq.height, seq.width, seq.n_frames

    model, variables = load_model(args)
    coder = make_coder(args, model, variables)
    intra_coder = build_intra(args)
    frame_cls = (
        BFrameBitstream if seq.family in ("lhbdc", "flexrate")
        else VFrameBitstream
    )

    originals = None
    if args.frames or args.synthetic:
        from tpuvc.cli.encode_v import load_frames

        args.n_frames = n
        args.width, args.height = w, h  # match the stream header
        originals = load_frames(args)

    order, typ = sequence_schedule(seq.gop, n)
    assert len(order) == len(seq.frames), "schedule/stream length mismatch"
    dpb = DecodedPictureBuffer()
    decoded: dict[int, jnp.ndarray] = {}
    t0 = time.perf_counter()
    for idx, (ftyp, blob) in zip(order, seq.frames):
        assert ftyp == typ[idx], f"frame {idx}: stream says {ftyp}"
        if ftyp == "I":
            bits = IFrameBitstream.deserialize(blob)
            dec = intra_coder.decompress(bits.to_strings(), bits.z_shape)
        else:
            ref1, ref2, _, _ = dpb.select_references(idx)
            dec = coder.decode(ref1, ref2, frame_cls.deserialize(blob))
        dec = jnp.clip(dec, 0.0, 1.0)
        dpb.add(dec, idx)
        decoded[idx] = dec
        line = f"frame {idx:4d} {ftyp} {len(blob)} bytes"
        if originals is not None:
            p = psnr_uint8(
                dec[:, :h, :w], jnp.asarray(originals[idx])[:, :h, :w]
            )
            line += f" psnr {float(p):.2f}"
        print(line)

    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(n):
        img = np.asarray(decoded[i][0, :h, :w])
        img_u8 = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
        save_png(os.path.join(args.out_dir, f"frame_{i:05d}.png"), img_u8)
    print(
        f"decoded {n} frames to {args.out_dir} "
        f"in {time.perf_counter() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
