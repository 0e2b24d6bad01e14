"""Decode a low-delay coded sequence (PSequenceBitstream) to PNG frames.

    python -m tpuvc.cli.decode_p --bin out.tpvs --out_dir /tmp/dec \
        [--frames /data/UVG/beauty]   # originals -> per-frame PSNR

Counterpart of tpuvc.cli.encode_p; the decoder needs only the stream file
and the model weights — I-frames decode via the ELIC coder, P-frames via
the DMC coder chained through the decoded-picture buffer (the reference's
DMC.decompress walk, /root/reference/OJSP2025/video_model.py:516-528).
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bin", default="out.tpvs")
    p.add_argument("--out_dir", default="decoded")
    p.add_argument("--frames", default=None,
                   help="optional originals dir for PSNR")
    p.add_argument("--synthetic", type=int, default=0,
                   help="compare against N synthetic frames (same generator "
                        "as encode_p --synthetic)")
    p.add_argument("--weights_intra", default="elic.msgpack")
    p.add_argument("--weights_dmc", default="dmc.msgpack")
    p.add_argument("--init", choices=["load", "random"], default="load")
    p.add_argument("--feat", type=int, default=48)
    p.add_argument("--N", type=int, default=64)
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

    from tpuvc.cli.encode_p import build_codecs
    from tpuvc.coder.container import (
        IFrameBitstream,
        PFrameBitstream,
        PSequenceBitstream,
    )
    from tpuvc.data.frames import save_png
    from tpuvc.eval.metrics import psnr_uint8_np
    from tpuvc.models.elic import ELICCoder
    from tpuvc.models.dmc import PFrameDMCCoder

    with open(args.bin, "rb") as f:
        seq = PSequenceBitstream.deserialize(f.read())
    h, w = seq.height, seq.width

    (intra, intra_vars), (dmc, dmc_vars) = build_codecs(args)
    intra_coder = ELICCoder(intra, intra_vars)
    p_coder = PFrameDMCCoder(dmc, dmc_vars)

    originals = None
    if args.frames:
        from tpuvc.data.uvg import SequenceFrames

        originals = SequenceFrames(args.frames, n_frames=len(seq.frames))
    elif args.synthetic:
        from tpuvc.data.uvg import SyntheticSequence

        originals = SyntheticSequence(n_frames=args.synthetic, h=h, w=w)

    os.makedirs(args.out_dir, exist_ok=True)
    dpb = None
    psnrs = []
    t0 = time.perf_counter()
    # Decode GOP-wise through the pipelined sequence path: each I anchor
    # resets the DPB; the P run until the next I decodes with the MV /
    # frame-latent / synthesis chains overlapped (decode_sequence).
    decoded: list = []
    run: list = []

    def flush_run():
        nonlocal dpb
        if not run:
            return
        xs, dpb = p_coder.decode_sequence(dpb, run)
        # fetch to host as each run completes: the PNG writer needs the
        # pixels anyway, and long sequences must not pin every decoded
        # frame in HBM
        decoded.extend(("P", np.asarray(x)) for x in xs)
        run.clear()

    for typ, blob in seq.frames:
        if typ == "I":
            flush_run()
            bits = IFrameBitstream.deserialize(blob)
            dec = intra_coder.decompress(bits.to_strings(), bits.z_shape)
            dec = jnp.clip(dec, 0.0, 1.0)
            dpb = {"ref_frame": dec, "ref_feature": None,
                   "ref_down_ratio": 1.0}
            decoded.append(("I", dec))
        else:
            run.append(PFrameBitstream.deserialize(blob))
    flush_run()

    for i, ((typ, blob), (_, dec)) in enumerate(
        zip(seq.frames, decoded)
    ):
        img = np.asarray(jnp.clip(dec[0, :h, :w], 0.0, 1.0))
        img_u8 = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
        path = os.path.join(args.out_dir, f"frame_{i:05d}.png")
        save_png(path, img_u8)
        line = f"frame {i:4d} {typ} ({8 * len(blob) / (h * w):.4f} bpp)"
        if originals is not None:
            ref = originals.u8(i)[0, :h, :w]
            p = psnr_uint8_np(ref, img)
            psnrs.append(p)
            line += f" psnr {p:.2f} dB"
        print(line)
    msg = (
        f"decoded {len(seq.frames)} frames to {args.out_dir} in "
        f"{time.perf_counter() - t0:.1f}s"
    )
    if psnrs:
        msg += f"; mean psnr {sum(psnrs) / len(psnrs):.2f} dB"
    print(msg)


if __name__ == "__main__":
    main()
