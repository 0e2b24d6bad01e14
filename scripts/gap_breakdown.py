"""Per-stream stream-vs-likelihood gap breakdown for trained LHBDC weights.

eval_rd_curve.py measures the AGGREGATE stream-vs-likelihood bpp gap; this
script attributes it per component (mv_y / mv_z / res_y / res_z) by coding
one B-triple with `LHBDCCoder.encode_recon` (real rANS bytes per stream
from the BFrameBitstream fields) and computing the matching likelihood
bits from the identical forward quantities (same flows, same prediction,
"dequantize" mode == the coding-time rounding).

The factorized z streams are the quantile-driven ones (CDF tables built
from the learned quantiles, entropy/cdf.py); the y streams use the scale-
table gaussian CDFs. A gap concentrated in z indicts quantile
convergence; a uniform gap would indict the table/coder machinery itself
(which test_rans.py rules out at random init).

    python scripts/gap_breakdown.py --ckpt checkpoints_r5/lhbdc_a1626 \
        --frames /tmp/heldout17            # under-converged quantiles
    python scripts/gap_breakdown.py --ckpt checkpoints_r4/lhbdc --noise \
                                           # 12k-step converged quantiles
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints_r5/lhbdc_a1626")
    ap.add_argument("--frames", default="/tmp/heldout17")
    ap.add_argument("--noise", action="store_true",
                    help="use a drifting-noise triple (the r4 checkpoint's "
                         "training distribution) instead of --frames")
    args = ap.parse_args()

    from tpuvc.utils.jaxcache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp

    from tpuvc.entropy.emath import likelihood_to_bits
    from tpuvc.models.lhbdc import LHBDC, LHBDCCoder
    from tpuvc.utils.checkpoint import load_checkpoint

    ck = load_checkpoint(os.path.join(REPO, args.ckpt, "latest.msgpack"))
    variables = {"params": ck["params"]}
    model = LHBDC(N=128)
    coder = LHBDCCoder(model, variables)

    if args.noise:
        rng = np.random.default_rng(3)
        base = rng.random((1, 256, 320, 3), dtype=np.float32)
        drift = (0.04 * rng.standard_normal((1, 256, 320, 3))).astype(
            np.float32
        )
        x1 = jnp.asarray(base)
        xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
        x2 = jnp.clip(jnp.asarray(base + drift), 0, 1)
    else:
        from tpuvc.data.uvg import SequenceFrames, device_frame

        frames = SequenceFrames(args.frames, n_frames=3)
        x1, xc, x2 = (device_frame(frames.u8(i)) for i in range(3))

    # Real streams (coding-time rounding, decoder-identical recon).
    bits, _ = coder.encode_recon(x1, xc, x2, rate_id=0)
    real = {
        "mv_y": 8 * len(bits.mv_y),
        "mv_z": 8 * len(bits.mv_z),
        "res_y": 8 * len(bits.res_y),
        "res_z": 8 * len(bits.res_z),
    }

    # Matching likelihood bits from the same forward quantities. The
    # "dequantize" mode rounds exactly as the coder does, so the y/z
    # likelihoods price the very symbols the rANS coded.
    def _lik(m, xb, xc, xa):
        flow_ba, flow_ab, flow_cb, flow_ca, size = m.all_flows(xb, xc, xa)
        diff = jnp.concatenate(
            [flow_cb - flow_ab, flow_ca - flow_ba], axis=-1
        )
        fo = m.mv_compressor(diff, mode="dequantize")
        f_cb, f_ca = jnp.split(fo["x_hat"], 2, axis=-1)
        x_pred = m.motion_compensate(
            xb, xa, f_cb + flow_ab, f_ca + flow_ba, size
        )
        ro = m.residual_compressor(xc - x_pred, mode="dequantize")
        return (
            fo["likelihoods"]["y"], fo["likelihoods"]["z"],
            ro["likelihoods"]["y"], ro["likelihoods"]["z"],
        )

    lik_fn = jax.jit(
        lambda v, xb, xc, xa: tuple(
            likelihood_to_bits(l)
            for l in model.apply(v, xb, xc, xa, method=_lik)
        )
    )
    ly, lz, ry, rz = (float(v) for v in lik_fn(variables, x1, xc, x2))
    lik = {"mv_y": ly, "mv_z": lz, "res_y": ry, "res_z": rz}

    rows = {
        k: {
            "real_bits": real[k],
            "lik_bits": round(lik[k], 1),
            "gap_pct": round(100 * (real[k] - lik[k]) / max(lik[k], 1e-9), 2),
        }
        for k in real
    }
    total_r = sum(real.values())
    total_l = sum(lik.values())
    out = {
        "ckpt": args.ckpt,
        "source": "noise" if args.noise else args.frames,
        "per_stream": rows,
        "total_gap_pct": round(100 * (total_r - total_l) / total_l, 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
