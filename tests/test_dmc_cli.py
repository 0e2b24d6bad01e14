"""CPU smoke of the DMC low-delay RD-eval branch of tpuvc.cli.test
(model.family=dmc): OJSP protocol — I every dmc_intra_period, chained P
frames, per-frame diagnostics CSV. The adaptive ratio search is disabled
here (each candidate ratio compiles its own flow graph; the search logic
is covered by tests/test_dmc.py)."""

import csv
import os

import pytest

pytestmark = pytest.mark.slow


def test_dmc_eval_cli(tmp_path):
    from tpuvc.cli.test import main

    out = str(tmp_path / "out")
    main([
        "dataset.name=synthetic",
        'dataset.sequences={"synth": 3}',
        "dataset.width=64",
        "dataset.height=64",
        "model.family=dmc",
        "levels=(0,)",
        "dmc_intra_period=2",
        "adaptive_down_ratio=False",
        "dmc_diag_csv=diag.csv",
        f"output_dir={out}",
    ])
    with open(os.path.join(out, "results.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1 and rows[0]["sequence"] == "synth"
    assert float(rows[0]["bpp"]) > 0

    with open(os.path.join(out, "synth_l0_diag.csv")) as f:
        diag = list(csv.DictReader(f))
    assert [r["type"] for r in diag] == ["I", "P", "I"]
    assert float(diag[1]["bits_mv"]) > 0
    float(diag[1]["warp_psnr"])  # present and numeric (from the P forward)
