"""TPU-backend golden-value regression (VERDICT r2 task #6).

The CPU fixtures (tests/golden/golden.json) lock host-path numerics only;
this test locks DEVICE numerics — the Pallas warp/deform band kernels and
MXU conv reductions the CPU backend never exercises — against
tests/golden/golden_tpu.json, generated once per round on the real chip
via ``python scripts/gen_golden.py --backend tpu``.

pytest's own process is pinned to the CPU backend (conftest.py), so the
check shells out to a fresh interpreter that keeps the session's default
(axon/TPU) platform. Skips cleanly when no TPU is reachable or the TPU
fixture has not been generated yet.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FIXTURE = os.path.join(_REPO, "tests", "golden", "golden_tpu.json")


def test_golden_tpu():
    if not os.path.exists(_FIXTURE):
        pytest.skip("golden_tpu.json not generated (run gen_golden.py "
                    "--backend tpu on the chip)")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "gen_golden.py"),
         "--backend", "tpu", "--check"],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    if proc.returncode == 3:
        pytest.skip("no TPU device reachable")
    assert proc.returncode == 0, (
        f"TPU golden drift:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    )
