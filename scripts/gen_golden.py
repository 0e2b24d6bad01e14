"""Regenerate the golden-value numerics fixtures (tests/golden/golden.json).

Run this ONLY when a numeric change is deliberate (new backend rev, an
intentional RD-affecting change); the diff of golden.json is then the
reviewable record of the drift. tests/test_golden.py asserts the committed
values byte-for-byte.

    python scripts/gen_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

# Same platform forcing as tests/conftest.py: fixtures are CPU-backend
# streams so the pytest environment reproduces them.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from golden_common import CASES

    out = {"_backend": "cpu", "_jax": jax.__version__}
    for name, fn in CASES.items():
        print(f"generating {name}...", file=sys.stderr)
        out[name] = fn()
        print(f"  {out[name]}", file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "golden.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
