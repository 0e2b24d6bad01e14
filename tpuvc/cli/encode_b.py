"""Encode one B-frame to a real bitstream.

CLI mirror of /root/reference/LHBDC/encode_B.py:21-37:

    python -m tpuvc.cli.encode_b --ref_1 a.png --ref_2 b.png \
        --current c.png --bin out.bin --l 1626 --weights dir/

Weights are loaded from ``{weights}/compression_{l}.msgpack`` (the reference's
``compression_{lambda}.pth`` naming, encode_B.py:33); ``--init random`` skips
loading for smoke tests.
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
    p.add_argument("--current", default="frames/current.png")
    p.add_argument("--bin", default="bits.bin")
    p.add_argument("--l", type=int, default=1626,
                   help="lhbdc: lambda rate point (228|436|845|1626|3141)")
    p.add_argument("--n", type=int, default=0,
                   help="flexrate: gain level index")
    p.add_argument("--interp", type=float, default=1.0,
                   help="flexrate: fractional interpolation l in (0, 1]")
    p.add_argument("--s", type=float, default=0.0,
                   help="flowguided_b: rate level (fractional allowed)")
    p.add_argument("--down_ratio", type=int, default=1,
                   help="flowguided_b: motion-adaptive down ratio")
    p.add_argument("--scale1", type=float, default=0.5)
    p.add_argument("--scale2", type=float, default=-0.5)
    p.add_argument("--weights", default="pretrained_weights")
    p.add_argument("--init", choices=["load", "random"], default="load")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="layer compute policy; the decoder must be run "
                        "with the same value (like --l / --n)")
    p.add_argument("--N", type=int, default=128)
    return p


def load_model(args):
    import jax
    import jax.numpy as jnp

    from tpuvc.utils.checkpoint import load_checkpoint

    x = jnp.zeros((1, 192, 192, 3), jnp.float32)
    if args.family == "lhbdc":
        from tpuvc.models.lhbdc import LHBDC

        model = LHBDC(N=args.N)
        ckpt = f"compression_{args.l}.msgpack"
        init = lambda: model.init(jax.random.key(0), x, x, x, "dequantize")
    elif args.family == "flowguided_b":
        from tpuvc.models.flowguided_b import FlowGuidedB

        model = FlowGuidedB()
        ckpt = "flowguided_b.msgpack"
        init = lambda: model.init(
            jax.random.key(0), x, x, x, 0, 0.5, -0.5, 1, "dequantize"
        )
    elif args.family == "deform_b":
        from tpuvc.models.deform_b import DeformB

        model = DeformB()
        ckpt = "deform_b.msgpack"
        init = lambda: model.init(
            jax.random.key(0), x, x, x, 0.0, "dequantize"
        )
    else:
        from tpuvc.models.flexrate import BidirFlowRef

        model = BidirFlowRef(N=args.N)
        ckpt = "flexrate.msgpack"
        init = lambda: model.init(
            jax.random.key(0), x, x, x, 0, 1.0, "dequantize"
        )
    if args.init == "load":
        path = os.path.join(args.weights, ckpt)
        variables = {"params": load_checkpoint(path)["params"]}
    else:
        variables = init()
    return model, variables


def make_coder(args, model, variables):
    if args.family == "lhbdc":
        from tpuvc.models.lhbdc import LHBDCCoder

        return LHBDCCoder(model, variables)
    if args.family == "flowguided_b":
        from tpuvc.models.flowguided_b import FlowGuidedBCoder

        return FlowGuidedBCoder(model, variables)
    if args.family == "deform_b":
        from tpuvc.models.deform_b import DeformBCoder

        return DeformBCoder(model, variables)
    from tpuvc.models.flexrate import FlexRateCoder

    return FlexRateCoder(model, variables)


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp

    from tpuvc.data.frames import prepare_frame

    from tpuvc.ops.precision import policy_from_name

    model, variables = load_model(args)
    coder = make_coder(args, model, variables)
    x_before, _ = prepare_frame(args.ref_1)
    x_after, _ = prepare_frame(args.ref_2)
    x_current, _ = prepare_frame(args.current)
    with policy_from_name(args.compute_dtype):
        if args.family == "lhbdc":
            bits = coder.encode(
                jnp.asarray(x_before), jnp.asarray(x_current),
                jnp.asarray(x_after), rate_id=args.l,
            )
        elif args.family == "flowguided_b":
            bits = coder.encode(
                jnp.asarray(x_before), jnp.asarray(x_after),
                jnp.asarray(x_current), s=args.s, scale1=args.scale1,
                scale2=args.scale2, down_ratio=args.down_ratio,
            )
        elif args.family == "deform_b":
            bits = coder.encode(
                jnp.asarray(x_before), jnp.asarray(x_after),
                jnp.asarray(x_current), s=args.s,
            )
        else:
            bits = coder.encode(
                jnp.asarray(x_before), jnp.asarray(x_current),
                jnp.asarray(x_after), n=args.n, l=args.interp,
            )
    with open(args.bin, "wb") as f:
        f.write(bits.serialize())
    print(f"wrote {bits.num_bytes} bytes to {args.bin}")


if __name__ == "__main__":
    main()
