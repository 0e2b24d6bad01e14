"""End-to-end CLI round trip for the low-delay P-frame sequence coder.

Covers the OJSP-style sequence surface (encode_p/decode_p): ELIC intra
stream for the I-frame, chained DMC P-frame streams, container round trip,
and decoder output written to PNGs. The reference has no equivalent CLI
(its OJSP harness lives in the absent DCVC repo) — this is the tpuvc
surface for the same capability.
"""

import os

import numpy as np
import pytest

from tpuvc.coder.container import (
    IFrameBitstream,
    PSequenceBitstream,
)

pytestmark = pytest.mark.slow


class TestContainers:
    def test_sequence_round_trip(self):
        seq = PSequenceBitstream(
            width=192, height=128,
            frames=[("I", b"intra-bytes"), ("P", b"p1"), ("P", b"")],
        )
        blob = seq.serialize()
        assert len(blob) == seq.num_bytes
        assert PSequenceBitstream.deserialize(blob) == seq

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            PSequenceBitstream.deserialize(b"XXXX" + b"\0" * 8)

    def test_iframe_round_trip(self):
        b = IFrameBitstream(
            z_shape=(3, 5), streams=[b"a", b"", b"cc", b"z-string"]
        )
        assert IFrameBitstream.deserialize(b.serialize()) == b
        ys, z = b.to_strings()
        assert ys == [b"a", b"", b"cc"] and z == b"z-string"


SMALL = [
    "--synthetic", "3", "--width", "64", "--height", "64",
    "--init", "random", "--feat", "8", "--N", "16",
    "--intra_N", "16", "--intra_M", "24", "--intra_groups", "4,4,16",
]


def test_encode_decode_cli_round_trip(tmp_path):
    from tpuvc.cli.decode_p import main as decode_main
    from tpuvc.cli.encode_p import main as encode_main

    bin_path = str(tmp_path / "seq.tpvs")
    out_dir = str(tmp_path / "dec")
    encode_main(SMALL + ["--bin", bin_path, "--intra_period", "4"])
    assert os.path.getsize(bin_path) > 0

    with open(bin_path, "rb") as f:
        seq = PSequenceBitstream.deserialize(f.read())
    assert [t for t, _ in seq.frames] == ["I", "P", "P"]
    assert (seq.width, seq.height) == (64, 64)

    model_args = SMALL[SMALL.index("--init"):]
    decode_main(model_args + ["--bin", bin_path, "--out_dir", out_dir,
                              "--synthetic", "3"])
    decoded = sorted(os.listdir(out_dir))
    assert decoded == [f"frame_{i:05d}.png" for i in range(3)]

    from tpuvc.data.frames import load_png

    img = load_png(os.path.join(out_dir, "frame_00000.png"))
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img.astype(np.float32)).all()


def test_adaptive_ratio_flag(tmp_path):
    """--adaptive picks a ratio per P-frame and rides the stream header."""
    from tpuvc.cli.encode_p import main as encode_main
    from tpuvc.coder.container import PFrameBitstream

    bin_path = str(tmp_path / "seq.tpvs")
    encode_main(
        SMALL + ["--bin", bin_path, "--intra_period", "4",
                 "--adaptive", "--ratios", "1.0,2.0"]
    )
    with open(bin_path, "rb") as f:
        seq = PSequenceBitstream.deserialize(f.read())
    for typ, blob in seq.frames:
        if typ == "P":
            bits = PFrameBitstream.deserialize(blob)
            assert bits.ratio_centi in (100, 200)
