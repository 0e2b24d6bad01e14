"""Convert a reference PyTorch checkpoint to a tpuvc checkpoint.

    python -m tpuvc.cli.import_torch --input compression_1626.pth \
        --output lhbdc_1626.tpuvc --family lhbdc

Reads the reference's whole-model ``.pth`` (LHBDC/train.py:205-215 format,
or a raw state dict), maps it onto the tpuvc parameter tree
(tpuvc.utils.torch_import), and writes it in tpuvc's checkpoint format so
``encode_b``/``decode_b``/``test`` can load trained reference weights.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help=".pth checkpoint path")
    ap.add_argument("--output", required=True, help="tpuvc checkpoint path")
    ap.add_argument(
        "--family", default="lhbdc",
        choices=[
            "lhbdc", "flexrate", "elic",
            "deform_b", "icip2023", "flowguided", "icip2024",
        ],
        help="codec family the checkpoint belongs to "
             "(elic = intra model; icip2023/icip2024 are aliases for "
             "deform_b/flowguided)",
    )
    args = ap.parse_args(argv)

    import jax

    from tpuvc.utils.checkpoint import save_checkpoint
    from tpuvc.utils.torch_import import load_pth

    params, report = load_pth(args.input, args.family)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print(f"mapped {n_leaves} parameter tensors; "
          f"skipped {len(report.skipped)} rebuilt buffers")
    unused = getattr(report, "unmapped", [])
    if unused:
        print(f"WARNING: {len(unused)} unmapped keys, e.g. {unused[:5]}")
    save_checkpoint(args.output, {"params": params})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
