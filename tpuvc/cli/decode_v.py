"""Decode a hierarchically-coded sequence (VSequenceBitstream) to PNGs.

    python -m tpuvc.cli.decode_v --bin out.tpvb --out_dir /tmp/dec \
        [--frames /data/UVG/beauty]   # originals -> per-frame PSNR

Counterpart of tpuvc.cli.encode_v. Frames carry their display index, so
the decoder replays the file's coding order and the decoded-picture-buffer
walk re-derives every frame's reference pair — the file is self-contained
given the model weights. I-frames decode via the ELIC coder, B-frames via
the family coder — the same decode path the encoder used to build its
buffer, so reconstructions are bit-identical to the encoder's (the
reference's decode_B PSNR check, Flex-Rate…/test/decode_B.py:138-144,
generalized to sequences). Streams with header mode=1 were coded with
level-batched device graphs and decode through the same batch shapes
(see VSequenceBitstream docstring for why shapes must match).
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


def _decode_level_batched(args, seq, coder, intra_coder, originals,
                          frame_cls):
    """Decode a mode=1 (level-batched) stream: regroup the file's B
    records into the encoder's exact chunks (consecutive same-level frames
    of one GOP, capped at the header's max_batch) and run the same
    B-shaped device graphs — shape parity is what keeps the decoder's
    re-estimated flow, and with it the rANS decode, bit-identical."""
    import jax.numpy as jnp
    import numpy as np

    from tpuvc.coder.container import IFrameBitstream
    from tpuvc.data.frames import save_png
    from tpuvc.eval.metrics import psnr_uint8_np
    from tpuvc.gop.order import gop_coding_table
    from tpuvc.ops.precision import policy_from_name

    h, w, n = seq.height, seq.width, seq.n_frames
    gop = seq.gop
    window = max(1, seq.window_gops) * gop
    if getattr(seq, "mesh", 1) > 1:
        # The encoder sharded its level batches over a mesh; replay the
        # same placement (program identity — see VSequenceBitstream.mesh).
        import jax

        from tpuvc.parallel.mesh import level_batch_sharder, make_mesh

        if len(jax.devices()) < seq.mesh:
            raise SystemExit(
                f"stream was coded over a {seq.mesh}-device mesh but only "
                f"{len(jax.devices())} devices are visible"
            )
        coder.set_shard(level_batch_sharder(make_mesh(seq.mesh)))
    table = gop_coding_table(gop)
    level_of = {
        f: li for li, lv in enumerate(table.frames_by_level()) for f in lv
    }
    # Device copies live only as long as a later frame can reference them
    # (the current GOP + its boundaries); host copies feed the PNG writer,
    # keeping HBM bounded for long sequences.
    decoded: dict[int, jnp.ndarray] = {}
    decoded_host: dict[int, np.ndarray] = {}
    t0 = time.perf_counter()

    def flush(chunk, resolve=None):
        if not chunk:
            return
        w0 = (chunk[0][0] // window) * window
        # Frames before this window can no longer be referenced.
        for k in [k for k in decoded if k < w0]:
            del decoded[k]
        gs = [(idx // gop) * gop for idx, _ in chunk]
        locs = [idx - g0 for (idx, _), g0 in zip(chunk, gs)]
        refs = [table.refs[f] for f in locs]
        xb = jnp.concatenate(
            [decoded[g0 + a] for g0, (a, _) in zip(gs, refs)], axis=0
        )
        xa = jnp.concatenate(
            [decoded[g0 + b] for g0, (_, b) in zip(gs, refs)], axis=0
        )
        if resolve is None:
            bits = [frame_cls.deserialize(blob) for _, blob in chunk]
            x_hat = coder.decode_level_batch(xb, xa, bits)
        else:
            x_hat = resolve(xb, xa)
        x_hat = jnp.clip(x_hat, 0.0, 1.0)
        host = np.asarray(x_hat)
        for i, (idx, _) in enumerate(chunk):
            decoded[idx] = x_hat[i : i + 1]
            decoded_host[idx] = host[i, :h, :w]

    def flush_i(i_run):
        """Decode a run of consecutive I records in one batched forward —
        the encoder coded a window's fresh anchors together, so the run
        length IS the encoder's batch size (shape parity again)."""
        if not i_run:
            return
        bits = [IFrameBitstream.deserialize(blob) for _, blob in i_run]
        dec = intra_coder.decompress_batch(
            [b.to_strings() for b in bits], bits[0].z_shape
        )
        dec = jnp.clip(dec, 0.0, 1.0)
        host = np.asarray(dec)
        for j, (idx, _) in enumerate(i_run):
            decoded[idx] = dec[j : j + 1]
            decoded_host[idx] = host[j, :h, :w]

    # Group the file's records into the encoder's exact batches first …
    groups: list = []  # ("I", run) | ("B", chunk)
    chunk: list = []
    i_run: list = []
    for ftyp, idx, blob in seq.frames:
        if ftyp == "I":
            if chunk:
                groups.append(("B", chunk))
                chunk = []
            i_run.append((idx, blob))
            continue
        if i_run:
            groups.append(("I", i_run))
            i_run = []
        same_chunk = (
            chunk
            and len(chunk) < (seq.max_batch or 8)
            and (idx // window) == (chunk[0][0] // window)
            and level_of[idx - (idx // gop) * gop]
            == level_of[chunk[0][0] - (chunk[0][0] // gop) * gop]
        )
        if not same_chunk:
            if chunk:
                groups.append(("B", chunk))
            chunk = []
        chunk.append((idx, blob))
    if i_run:
        groups.append(("I", i_run))
    if chunk:
        groups.append(("B", chunk))

    # … then walk them with the entropy decode PIPELINED for the
    # hyperprior families: a B chunk's rANS + index-fetch phases are
    # reference-independent, so they are submitted up to `lookahead`
    # chunks ahead on worker threads while the device tail of earlier
    # chunks runs (bounded lookahead keeps HBM use flat on 600-frame
    # sequences). v3/v4 conditional bottlenecks need the references for
    # their entropy parameters, so they keep the synchronous flush.
    pipelined = hasattr(coder, "decode_level_batch_async")
    lookahead = 4
    pending: dict[int, object] = {}

    def submit_ahead(start):
        for j in range(start, min(start + lookahead, len(groups))):
            typ, recs = groups[j]
            if typ == "B" and j not in pending:
                bits = [frame_cls.deserialize(blob) for _, blob in recs]
                pending[j] = coder.decode_level_batch_async(bits)

    # Decode graphs trace under the encoder's recorded compute policy.
    with policy_from_name("bfloat16" if seq.dtype == 1 else "float32"):
        for j, (typ, recs) in enumerate(groups):
            if typ == "I":
                flush_i(recs)
                continue
            if pipelined:
                submit_ahead(j)
                flush(recs, pending.pop(j))
            else:
                flush(recs)

    os.makedirs(args.out_dir, exist_ok=True)
    psnrs = []
    for i in range(n):
        img = decoded_host[i]
        img_u8 = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
        save_png(os.path.join(args.out_dir, f"frame_{i:05d}.png"), img_u8)
        if originals is not None:
            ref = originals.u8(i)[0, :h, :w]
            psnrs.append(psnr_uint8_np(ref, img))
    msg = (
        f"decoded {n} frames (level-batched) to {args.out_dir} "
        f"in {time.perf_counter() - t0:.1f}s"
    )
    if psnrs:
        msg += f"; mean psnr {sum(psnrs) / len(psnrs):.2f} dB"
    print(msg)


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
    from tpuvc.eval.metrics import psnr_uint8_np
    from tpuvc.gop.dpb import DecodedPictureBuffer
    from tpuvc.ops.precision import policy_from_name

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
        if args.synthetic:
            args.synthetic = n  # header count wins; the flag just enables
        originals = load_frames(args)

    if seq.mode == 1:
        return _decode_level_batched(
            args, seq, coder, intra_coder, originals, frame_cls
        )
    dpb = DecodedPictureBuffer()
    # Reconstructions move to host as soon as they're computed: only the
    # DPB's <=32 reference frames stay device-resident, so HBM use is
    # bounded for 600-frame 1080p sequences.
    decoded_host: dict[int, np.ndarray] = {}
    t0 = time.perf_counter()
    # Trace decode graphs under the encoder's recorded compute policy —
    # the re-derived entropy parameters must match numerically.
    with policy_from_name("bfloat16" if seq.dtype == 1 else "float32"):
        for ftyp, idx, blob in seq.frames:
            if ftyp == "I":
                bits = IFrameBitstream.deserialize(blob)
                dec = intra_coder.decompress(bits.to_strings(), bits.z_shape)
            else:
                ref1, ref2, _, _ = dpb.select_references(idx)
                dec = coder.decode(ref1, ref2, frame_cls.deserialize(blob))
            dec = jnp.clip(dec, 0.0, 1.0)
            dpb.add(dec, idx)
            decoded_host[idx] = np.asarray(dec[0, :h, :w])
            line = f"frame {idx:4d} {ftyp} {len(blob)} bytes"
            if originals is not None:
                p = psnr_uint8_np(
                    originals.u8(idx)[0, :h, :w], decoded_host[idx]
                )
                line += f" psnr {p:.2f}"
            print(line)

    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(n):
        img = decoded_host[i]
        img_u8 = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
        save_png(os.path.join(args.out_dir, f"frame_{i:05d}.png"), img_u8)
    print(
        f"decoded {n} frames to {args.out_dir} "
        f"in {time.perf_counter() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
