"""Trained multi-rate RD curve + BD-rate machinery, end to end (r5 task 6).

Consumes the checkpoints written by scripts/train_rd_curve.sh (LHBDC at
lambda in {228, 1626, 3141} + a matching ELIC intra per point) and produces,
on a HELD-OUT photographic-motion clip:

  1. a 3-point real-bitstream RD curve (encode_v --level_batched ->
     decode_v, PSNR on uint8 RGB, bpp from actual file bytes) — the same
     protocol as the reference's per-level tables
     (ICIP2023/icip2023_results.csv);
  2. the same 3 points from likelihood bit ESTIMATES (eval forward), and
     the stream-vs-likelihood bpp gap per point — the trained-weight
     check that the rANS tables (built from the learned quantiles) do not
     quietly tax real streams (VERDICT r4 weak #5);
  3. BD-rate of the real-stream curve against the likelihood curve via
     tpuvc.eval.bd_rate (machinery exercised on real numbers; expect ~0);
  4. an aux-loss diagnosis per checkpoint: quantile CDF logits vs the
     +-log(2/tail_mass - 1) target and the learned quantile range vs the
     ACTUAL z percentiles on the clip — explains the monotone aux growth
     seen in the r4/r5 train logs.

Run AFTER /tmp/train_rd_done exists (needs the TPU; ~10 min warm):

    python scripts/eval_rd_curve.py [--alphas 228,1626,3141]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W = 256, 320
N_FRAMES = 17


def gen_heldout(root: str, seed: int = 777):
    """17-frame clip from the gen_dataset source with an UNSEEN trajectory
    (seed disjoint from the training seeds)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_dataset import _source
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    src = _source()
    sw, sh = src.size
    rng = np.random.default_rng(seed)
    zoom0 = rng.uniform(0.9, 1.1)
    zoom1 = zoom0 * rng.uniform(0.95, 1.05)
    max_x = sw - int(W * max(zoom0, zoom1)) - 40
    max_y = sh - int(H * max(zoom0, zoom1)) - 40
    x0, y0 = rng.uniform(20, max_x), rng.uniform(20, max_y)
    dx, dy = rng.uniform(-2.5, 2.5, size=2)
    for f in range(N_FRAMES):
        t = f - N_FRAMES // 2
        z = zoom0 + (zoom1 - zoom0) * (f / (N_FRAMES - 1.0))
        frame = src.transform(
            (W, H), Image.AFFINE,
            (z, 0.0, x0 + dx * t, 0.0, z, y0 + dy * t),
            resample=Image.BILINEAR,
        )
        frame.save(os.path.join(root, f"f{f:04d}.png"))


def stage_weights(alpha: int, tmp: str) -> tuple[str, str]:
    """encode_v expects {weights}/compression_{l}.msgpack + an intra path."""
    import shutil

    wdir = os.path.join(tmp, f"w{alpha}")
    os.makedirs(wdir, exist_ok=True)
    b = os.path.join(REPO, f"checkpoints_r5/lhbdc_a{alpha}/latest.msgpack")
    i = os.path.join(REPO, f"checkpoints_r5/elic_a{alpha}/latest.msgpack")
    dst = os.path.join(wdir, f"compression_{alpha}.msgpack")
    if not os.path.exists(dst):
        os.symlink(os.path.abspath(b), dst)
    return wdir, i


def real_point(alpha: int, clip: str, tmp: str) -> dict:
    """Real-bitstream RD point via the actual CLIs (level-batched)."""
    import contextlib
    import io
    import re

    from tpuvc.cli.decode_v import main as decode_main
    from tpuvc.cli.encode_v import main as encode_main

    wdir, intra = stage_weights(alpha, tmp)
    bin_path = os.path.join(tmp, f"rd_{alpha}.tpvb")
    encode_main([
        "--frames", clip, "--n_frames", str(N_FRAMES), "--bin", bin_path,
        "--family", "lhbdc", "--gop", "16", "--l", str(alpha),
        "--level_batched", "--max_batch", "8",
        "--weights", wdir, "--weights_intra", intra,
    ])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decode_main([
            "--bin", bin_path, "--out_dir", os.path.join(tmp, f"dec{alpha}"),
            "--frames", clip, "--weights", wdir, "--weights_intra", intra,
            "--l", str(alpha),
        ])
    out = buf.getvalue()
    sys.stdout.write(out)
    m = re.search(r"mean psnr ([0-9.]+) dB", out)
    nbytes = os.path.getsize(bin_path)
    return {
        "alpha": alpha,
        "bpp": 8 * nbytes / (H * W * N_FRAMES),
        "psnr": float(m.group(1)),
        "bytes": nbytes,
    }


def likelihood_point(alpha: int, clip: str) -> dict:
    """Likelihood-estimate RD on the SAME coding structure: ELIC forward
    bits for I frames, LHBDC forward bits for B frames coded against the
    real decoded refs (encoder-identical DPB via encode_recon's recon)."""
    import jax
    import jax.numpy as jnp

    from tpuvc.data.uvg import SequenceFrames, device_frame
    from tpuvc.gop.order import sequence_schedule
    from tpuvc.gop.dpb import DecodedPictureBuffer
    from tpuvc.models.elic import ELIC
    from tpuvc.models.lhbdc import LHBDC
    from tpuvc.utils.checkpoint import load_checkpoint

    frames = SequenceFrames(clip, n_frames=N_FRAMES)
    h, w = frames.size
    bck = load_checkpoint(
        os.path.join(REPO, f"checkpoints_r5/lhbdc_a{alpha}/latest.msgpack")
    )
    ick = load_checkpoint(
        os.path.join(REPO, f"checkpoints_r5/elic_a{alpha}/latest.msgpack")
    )
    b_model = LHBDC(N=128)
    i_model = ELIC()
    bvars = {"params": bck["params"]}
    ivars = {"params": ick["params"]}

    b_fwd = jax.jit(
        lambda v, r1, xc, r2: b_model.apply(v, r1, xc, r2, "dequantize")
    )
    # stage2=True: price (and reconstruct) the intra frame the way the
    # real coder does — groups rounded AROUND MEANS into g_s/context
    # (forward_stage2 semantics). The stage-1 forward's around-zero recon
    # is a training-time approximation the bitstream path never produces;
    # pricing against it overstated the stream gap by ~30 points and its
    # better refs underpriced every downstream B frame (r5 diagnosis).
    i_fwd = jax.jit(
        lambda v, x: i_model.apply(v, x, "dequantize", stage2=True)
    )

    order, typ = sequence_schedule(16, N_FRAMES)
    dpb = DecodedPictureBuffer()
    total_bits = 0.0
    for idx in order:
        x = device_frame(frames.u8(idx))
        if typ[idx] == "I":
            out = i_fwd(ivars, x)
            bits = float(
                sum(
                    -jnp.sum(jnp.log2(jnp.maximum(l, 1e-9)))
                    for l in out["likelihoods"].values()
                )
            )
            dec = out["x_hat"]
        else:
            r1, r2, _, _ = dpb.select_references(idx)
            out = b_fwd(bvars, r1, x, r2)
            bits = float(out["bits"])
            dec = out["x_hat"]
        total_bits += bits
        dpb.add(jnp.clip(dec, 0.0, 1.0), idx)
    return {"alpha": alpha, "bpp_lik": total_bits / (h * w * N_FRAMES)}


def aux_diagnosis(alpha: int) -> list[dict]:
    """Quantile health per factorized bottleneck of the LHBDC checkpoint:
    CDF logits at the learned quantiles vs the tail target, and the
    implied coding range."""
    import jax.numpy as jnp

    from tpuvc.entropy.bottleneck import FactorizedBottleneck
    from tpuvc.utils.checkpoint import load_checkpoint

    ck = load_checkpoint(
        os.path.join(REPO, f"checkpoints_r5/lhbdc_a{alpha}/latest.msgpack")
    )
    rows = []
    for name in ("mv_compressor", "residual_compressor"):
        params = ck["params"][name]["entropy_bottleneck"]
        eb = FactorizedBottleneck(channels=int(params["quantiles"].shape[0]))
        v = {"params": params}
        logits = eb.apply(
            v, jnp.asarray(params["quantiles"]), True,
            method=FactorizedBottleneck._logits_cumulative,
        )
        t = float(np.log(2.0 / eb.tail_mass - 1.0))
        lo = np.asarray(logits)[:, 0, 0]
        hi = np.asarray(logits)[:, 0, 2]
        q = np.asarray(params["quantiles"])
        rows.append({
            "alpha": alpha,
            "bottleneck": name,
            "target_logit": round(t, 2),
            "lo_logit_mean": round(float(lo.mean()), 2),
            "hi_logit_mean": round(float(hi.mean()), 2),
            "aux_contrib": round(
                float(np.abs(lo + t).sum() + np.abs(hi - t).sum()
                      + np.abs(np.asarray(logits)[:, 0, 1]).sum()), 1),
            "range_mean_px": round(
                float((q[:, 0, 2] - q[:, 0, 0]).mean()), 2),
            "range_max_px": round(
                float((q[:, 0, 2] - q[:, 0, 0]).max()), 2),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alphas", default="228,1626,3141")
    ap.add_argument("--clip", default="/tmp/heldout17")
    ap.add_argument("--tmp", default="/tmp/rd_eval")
    args = ap.parse_args()
    alphas = [int(a) for a in args.alphas.split(",")]

    from tpuvc.utils.jaxcache import enable as enable_cache

    enable_cache()
    os.makedirs(args.tmp, exist_ok=True)
    if not os.path.exists(os.path.join(args.clip, "f0000.png")):
        gen_heldout(args.clip)

    real = [real_point(a, args.clip, args.tmp) for a in alphas]
    lik = [likelihood_point(a, args.clip) for a in alphas]
    aux = [row for a in alphas for row in aux_diagnosis(a)]

    from tpuvc.eval.bd_rate import bd_rate

    curve = sorted(zip(real, lik), key=lambda t: t[0]["bpp"])
    r_bpp = [r["bpp"] for r, _ in curve]
    r_psnr = [r["psnr"] for r, _ in curve]
    l_bpp = [l["bpp_lik"] for _, l in curve]
    # BD-rate of the real-stream curve vs the likelihood-estimate curve at
    # the same reconstructions: the integrated stream overhead in percent.
    bd = float(bd_rate(l_bpp, r_psnr, r_bpp, r_psnr))

    report = {
        "real_points": real,
        "likelihood_points": lik,
        "gap_pct": [
            round(100 * (r["bpp"] - l["bpp_lik"]) / l["bpp_lik"], 2)
            for r, l in zip(real, lik)
        ],
        "bd_rate_stream_vs_likelihood_pct": round(bd, 3),
        "aux_diagnosis": aux,
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "checkpoints_r5", "rd_curve.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
