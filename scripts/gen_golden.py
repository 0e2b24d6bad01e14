"""Regenerate or verify the golden-value numerics fixtures.

Fixtures are per-backend:
  tests/golden/golden.json      CPU backend (pytest's environment)
  tests/golden/golden_tpu.json  real TPU backend (generated once per round
                                on the chip; locks device-side numerics —
                                Pallas warp/deform kernels, MXU conv
                                reductions — that the CPU fixtures cannot
                                see; SURVEY.md 4(b), VERDICT r2 task #6)

Run generation ONLY when a numeric change is deliberate (new backend rev,
an intentional RD-affecting change); the fixture diff is then the
reviewable record of the drift. tests/test_golden.py asserts the CPU file
byte-for-byte inside pytest; tests/test_golden_tpu.py shells out to
``--backend tpu --check`` (the pytest process itself is pinned to CPU).

    python scripts/gen_golden.py [--backend cpu|tpu] [--check]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", choices=["cpu", "tpu"], default="cpu")
    p.add_argument(
        "--check", action="store_true",
        help="compare against the committed fixture instead of writing; "
             "exit 1 on drift",
    )
    args = p.parse_args()

    import jax

    if args.backend == "cpu":
        # Same platform forcing as tests/conftest.py: CPU fixtures are
        # reproduced inside the pytest environment.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
        fname = "golden.json"
    else:
        dev = jax.devices()[0]
        if dev.platform not in ("tpu", "axon") and "TPU" not in str(dev):
            print(f"NO_TPU: default device is {dev}", file=sys.stderr)
            sys.exit(3)
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        fname = "golden_tpu.json"

    from golden_common import CASES

    out = {
        "_backend": args.backend,
        "_device": str(jax.devices()[0]),
        "_jax": jax.__version__,
    }
    for name, fn in CASES.items():
        print(f"generating {name}...", file=sys.stderr)
        out[name] = fn()
        print(f"  {out[name]}", file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", fname,
    )
    if args.check:
        with open(path) as f:
            expected = json.load(f)
        bad = []
        for name in CASES:
            if name not in expected:
                bad.append(f"{name}: missing from fixture (regenerate)")
                continue
            for key in ("stream_sha256", "stream_len"):
                if out[name][key] != expected[name][key]:
                    bad.append(
                        f"{name}.{key}: {out[name][key]} != fixture "
                        f"{expected[name][key]}"
                    )
            if abs(out[name]["psnr"] - expected[name]["psnr"]) > 1e-3:
                bad.append(
                    f"{name}.psnr: {out[name]['psnr']} != fixture "
                    f"{expected[name]['psnr']}"
                )
        if bad:
            print("GOLDEN DRIFT:\n  " + "\n  ".join(bad))
            sys.exit(1)
        print(f"OK: {len(CASES)} cases match {fname}")
        return

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
