"""Golden-value numerics regression: encode streams must be byte-identical
(sha256) to the committed fixtures, reconstruction PSNR must match to 1e-3.

Any numeric drift in transforms, entropy math, or the rANS coder fails
here even when round-trip consistency still holds — the guard for
"bit-exact across refactors" that needs no trained weights (SURVEY.md
4(b)). Deliberate changes: regenerate with scripts/gen_golden.py and
commit the diff.
"""

import json
import os

import pytest

from golden_common import CASES

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(_GOLDEN) as f:
        return json.load(f)


_HEAVY = {"deform_b", "flowguided_b", "dmc", "elic", "lhbdc_mid"}
# heavy families compile for minutes on small hosts; the light
# lhbdc/flexrate cases keep stream-byte regression in the fast tier


@pytest.mark.parametrize(
    "family",
    [
        pytest.param(f, marks=pytest.mark.slow) if f in _HEAVY else f
        for f in sorted(CASES)
    ],
)
def test_golden(family, golden):
    expected = golden[family]
    got = CASES[family]()
    assert got["stream_len"] == expected["stream_len"], (got, expected)
    assert got["stream_sha256"] == expected["stream_sha256"], (
        f"{family}: stream bytes drifted "
        f"(len {got['stream_len']} vs {expected['stream_len']}); if the "
        "numeric change is deliberate, rerun scripts/gen_golden.py"
    )
    assert got["psnr"] == pytest.approx(expected["psnr"], abs=1e-3)
