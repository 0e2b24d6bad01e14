"""Decode one B-frame bitstream back to a PNG.

CLI mirror of /root/reference/LHBDC/decode_B.py:23-28:

    python -m tpuvc.cli.decode_b --ref_1 a.png --ref_2 b.png \
        --bin out.bin --out decoded.png --weights dir/

The lambda (and thus the weights file) is read from the bitstream header,
exactly like the reference (decode_B.py:89, 110).
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--family",
        choices=["lhbdc", "flexrate", "deform_b", "flowguided_b"],
        default="lhbdc",
    )
    p.add_argument("--ref_1", default="frames/ref_1.png")
    p.add_argument("--ref_2", default="frames/ref_2.png")
    p.add_argument("--bin", default="bits.bin")
    p.add_argument("--out", default="decoded.png")
    p.add_argument("--weights", default="pretrained_weights")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="must match the encoder's --compute_dtype")
    p.add_argument("--init", choices=["load", "random"], default="load")
    p.add_argument("--N", type=int, default=128)
    p.add_argument(
        "--current", default=None,
        help="optional ground-truth frame: prints PSNR and stream size "
        "(parity with Flex-Rate.../test/decode_B.py:138-144)",
    )
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from tpuvc.coder.container import BFrameBitstream
    from tpuvc.data.frames import float_to_uint8, prepare_frame, save_png
    from tpuvc.utils.checkpoint import load_checkpoint

    with open(args.bin, "rb") as f:
        blob = f.read()
    if args.family in ("deform_b", "flowguided_b"):
        from tpuvc.coder.container import VFrameBitstream

        bits = VFrameBitstream.deserialize(blob)
    else:
        bits = BFrameBitstream.deserialize(blob)

    x = jnp.zeros((1, 192, 192, 3), jnp.float32)
    if args.family == "lhbdc":
        from tpuvc.models.lhbdc import LHBDC, LHBDCCoder

        model = LHBDC(N=args.N)
        ckpt = f"compression_{bits.rate_id}.msgpack"
        init = lambda: model.init(jax.random.key(0), x, x, x, "dequantize")
        make = LHBDCCoder
    elif args.family == "flowguided_b":
        from tpuvc.models.flowguided_b import FlowGuidedB, FlowGuidedBCoder

        model = FlowGuidedB()
        ckpt = "flowguided_b.msgpack"
        init = lambda: model.init(
            jax.random.key(0), x, x, x, 0, 0.5, -0.5, 1, "dequantize"
        )
        make = FlowGuidedBCoder
    elif args.family == "deform_b":
        from tpuvc.models.deform_b import DeformB, DeformBCoder

        model = DeformB()
        ckpt = "deform_b.msgpack"
        init = lambda: model.init(
            jax.random.key(0), x, x, x, 0.0, "dequantize"
        )
        make = DeformBCoder
    else:
        from tpuvc.models.flexrate import BidirFlowRef, FlexRateCoder

        model = BidirFlowRef(N=args.N)
        ckpt = "flexrate.msgpack"
        init = lambda: model.init(
            jax.random.key(0), x, x, x, 0, 1.0, "dequantize"
        )
        make = FlexRateCoder
    if args.init == "load":
        path = os.path.join(args.weights, ckpt)
        variables = {"params": load_checkpoint(path)["params"]}
    else:
        variables = init()
    coder = make(model, variables)

    from tpuvc.ops.precision import policy_from_name

    x_before, size = prepare_frame(args.ref_1)
    x_after, _ = prepare_frame(args.ref_2)
    with policy_from_name(args.compute_dtype):
        x_hat = coder.decode(
            jnp.asarray(x_before), jnp.asarray(x_after), bits
        )
    h, w = size
    img = float_to_uint8(jax.device_get(x_hat)[0, :h, :w])
    save_png(args.out, img)
    print(f"decoded {args.out} ({h}x{w})")
    if args.current is not None:
        import numpy as np

        from tpuvc.eval.metrics import psnr_uint8

        gt, _ = prepare_frame(args.current)
        gt_img = float_to_uint8(np.asarray(gt)[0, :h, :w])
        print(
            f"psnr {psnr_uint8(img, gt_img):.2f} dB, "
            f"{os.path.getsize(args.bin)} bytes"
        )


if __name__ == "__main__":
    main()
