"""One-command RD validation against the reference's published UVG curves.

The moment UVG frames and the reference's pretrained ``.pth`` checkpoints
land on a machine, this validates the BASELINE.json claim (BD-rate within
0.5% of the reference) in a single command:

    python scripts/validate_rd.py --uvg /data/UVG --weights /data/pth \
        --families lhbdc,flexrate,deform_b,flowguided_b

Per family it (1) imports the ``.pth`` checkpoints via
``tpuvc.cli.import_torch`` (filename conventions below), (2) runs the
protocol-exact evaluation (``tpuvc.cli.test``: GOP-16 — GOP-8 for lhbdc —
PSNR on uint8 RGB over the 1080x1920 crop, bpp over unpadded pixels;
SURVEY.md §6), and (3) computes BD-rate of the measured per-level means
against the family's published curve (BASELINE.md), failing if |BD-rate|
exceeds the threshold.

Expected weights layout under --weights (the reference's own naming):
    lhbdc:        compression_{228,436,845,1626,3141}.pth
    flexrate:     flexrate.pth  (one model, gain levels)
    deform_b:     icip2023.pth + intra ELIC checkpoints elic_l{0..4}.pth
    flowguided_b: icip2024.pth + the same intra checkpoints

``--dry-run`` exercises the full pipeline with synthetic frames and random
weights (no assets needed): import is skipped, the eval runs on a tiny
synthetic sequence, and the BD-rate gate is reported but not enforced.

Parity: the reference's own validation loop is ICIP2023/src/test.py:98-178
+ bd_rate.py; published targets transcribed in BASELINE.md.
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Published aggregate curves (BASELINE.md; bpp, PSNR).
PUBLISHED = {
    "lhbdc": (
        [0.0457, 0.0648, 0.0950, 0.1722, 0.3074],
        [35.43, 36.53, 37.51, 38.44, 39.40],
    ),
    "flexrate": (
        [0.0593, 0.0773, 0.0911, 0.1056, 0.1297, 0.1432, 0.1581, 0.2030],
        [36.38, 37.11, 37.44, 37.70, 38.12, 38.30, 38.47, 38.85],
    ),
    "deform_b": (
        [0.0344, 0.0483, 0.0745, 0.1234, 0.2121],
        [36.41, 37.25, 38.08, 38.87, 39.61],
    ),
    "flowguided_b": (
        [0.0306, 0.0440, 0.0664, 0.1055, 0.1802],
        [36.44, 37.28, 38.04, 38.73, 39.39],
    ),
}

IMPORT_FAMILY = {  # tpuvc family -> import_torch --family name
    "lhbdc": "lhbdc",
    "flexrate": "flexrate",
    "deform_b": "deform_b",
    "flowguided_b": "flowguided",
}


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def import_weights(family: str, weights_dir: str, out_dir: str) -> None:
    """Convert every .pth the family needs into the weights layout
    tpuvc.cli.test loads (weights/{intra,inter}/latest.msgpack)."""
    inter_dir = os.path.join(out_dir, family, "inter")
    intra_dir = os.path.join(out_dir, family, "intra")
    os.makedirs(inter_dir, exist_ok=True)
    os.makedirs(intra_dir, exist_ok=True)
    names = {
        "lhbdc": ["compression_845.pth", "lhbdc.pth"],
        "flexrate": ["flexrate.pth", "icip2022.pth"],
        "deform_b": ["icip2023.pth", "deform_b.pth"],
        "flowguided_b": ["icip2024.pth", "flowguided_b.pth"],
    }[family]
    src = next(
        (os.path.join(weights_dir, n) for n in names
         if os.path.exists(os.path.join(weights_dir, n))),
        None,
    )
    if src is None:
        raise SystemExit(
            f"{family}: no checkpoint found under {weights_dir} "
            f"(looked for {names})"
        )
    run([
        sys.executable, "-m", "tpuvc.cli.import_torch",
        "--input", src,
        "--output", os.path.join(inter_dir, "latest.msgpack"),
        "--family", IMPORT_FAMILY[family],
    ])
    intra = os.path.join(weights_dir, "elic_l2.pth")
    if os.path.exists(intra):
        run([
            sys.executable, "-m", "tpuvc.cli.import_torch",
            "--input", intra,
            "--output", os.path.join(intra_dir, "latest.msgpack"),
            "--family", "elic",
        ])


def eval_family(family: str, uvg: str | None, weights: str, out_dir: str,
                dry_run: bool) -> str:
    """Run tpuvc.cli.test; returns the results CSV path."""
    fam_out = os.path.join(out_dir, family, "eval")
    os.makedirs(fam_out, exist_ok=True)
    overrides = [
        f"model.family={family}",
        f"output_dir={fam_out}",
        "results_csv=results.csv",
        f"intra_weights={os.path.join(out_dir, family, 'intra')}",
        f"inter_weights={os.path.join(out_dir, family, 'inter')}",
    ]
    if dry_run:
        overrides += [
            "dataset.name=synthetic",
            'dataset.sequences={"synth": 9}',
            "dataset.gop=8",
            "dataset.width=192",
            "dataset.height=128",
            "levels=(0,1)",
        ]
    else:
        overrides += [
            f"dataset.root={uvg}",
            "dataset.gop=" + ("8" if family == "lhbdc" else "16"),
        ]
    run([sys.executable, "-m", "tpuvc.cli.test"] + overrides)
    return os.path.join(fam_out, "results.csv")


def per_level_means(csv_path: str):
    """(bpps, psnrs) per-level means from the ICIP-format results CSV."""
    rows = {}
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            rows.setdefault(int(float(row["level"])), []).append(
                (float(row["bpp"]), float(row["psnr"]))
            )
    bpps, psnrs = [], []
    for lvl in sorted(rows):
        vals = rows[lvl]
        bpps.append(sum(v[0] for v in vals) / len(vals))
        psnrs.append(sum(v[1] for v in vals) / len(vals))
    return bpps, psnrs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--uvg", default=None, help="UVG 1080p PNG frames root")
    ap.add_argument("--weights", default=None, help="dir of reference .pth")
    ap.add_argument("--families",
                    default="lhbdc,flexrate,deform_b,flowguided_b")
    ap.add_argument("--out", default="outputs/validate_rd")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="max |BD-rate| %% vs the published curve")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthetic data + random weights; no gate")
    args = ap.parse_args()

    if not args.dry_run and (args.uvg is None or args.weights is None):
        raise SystemExit("--uvg and --weights are required unless --dry-run")

    sys.path.insert(0, REPO)
    from tpuvc.eval.bd_rate import bd_rate

    failures = []
    for family in args.families.split(","):
        family = family.strip()
        if not args.dry_run:
            import_weights(family, args.weights, args.out)
        csv_path = eval_family(
            family, args.uvg, args.weights or "", args.out, args.dry_run
        )
        bpps, psnrs = per_level_means(csv_path)
        ref_bpp, ref_psnr = PUBLISHED[family]
        bd = bd_rate(ref_bpp, ref_psnr, bpps, psnrs)
        gate = "(dry run, not enforced)" if args.dry_run else (
            "PASS" if abs(bd) <= args.threshold else "FAIL"
        )
        print(f"{family}: BD-rate vs published = {bd:+.3f}%  {gate}")
        if not args.dry_run and abs(bd) > args.threshold:
            failures.append((family, bd))

    if failures:
        raise SystemExit(
            "RD validation failed: "
            + ", ".join(f"{f} ({bd:+.2f}%)" for f, bd in failures)
        )
    print("RD validation complete.")


if __name__ == "__main__":
    main()
