"""End-to-end CLI round trip for the hierarchical B-frame sequence coder.

Covers the whole-sequence B surface (encode_v/decode_v): ELIC intra
streams at GOP boundaries, dyadic B-frame streams via the family coders,
VSequenceBitstream container round trip, schedule re-derivation from the
header, and decoder reconstructions matching the encoder's (drift-free by
construction). The reference codes one B-frame per file
(/root/reference/LHBDC/encode_B.py:114-126) and has no sequence container;
this is the tpuvc completion of that pipeline.
"""

import os

import numpy as np
import pytest

from tpuvc.coder.container import VSequenceBitstream
from tpuvc.gop.order import sequence_schedule

pytestmark = pytest.mark.slow


class TestContainer:
    def test_round_trip(self):
        seq = VSequenceBitstream(
            family="deform_b", width=192, height=128, gop=8, n_frames=3,
            frames=[("I", 0, b"intra"), ("B", 1, b"b-bytes"), ("I", 2, b"")],
            mode=1, max_batch=4,
        )
        blob = seq.serialize()
        assert len(blob) == seq.num_bytes
        assert VSequenceBitstream.deserialize(blob) == seq

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            VSequenceBitstream.deserialize(b"XXXX" + b"\0" * 16)


class TestSchedule:
    def test_gop16_uses_reference_order(self):
        order, typ = sequence_schedule(16, 33)
        assert order[:5] == [0, 16, 8, 4, 12]
        assert [i for i in range(33) if typ[i] == "I"] == [0, 16, 32]

    def test_gop4_covers_all_frames(self):
        order, typ = sequence_schedule(4, 9)
        assert sorted(order) == list(range(9))
        assert [i for i in range(9) if typ[i] == "I"] == [0, 4, 8]


SMALL = [
    "--synthetic", "9", "--width", "64", "--height", "64", "--gop", "4",
    "--init", "random", "--N", "32",
    "--intra_N", "16", "--intra_M", "24", "--intra_groups", "4,4,16",
]


def test_encode_decode_cli_round_trip(tmp_path):
    from tpuvc.cli.decode_v import main as decode_main
    from tpuvc.cli.encode_v import main as encode_main

    bin_path = str(tmp_path / "seq.tpvb")
    out_dir = str(tmp_path / "dec")
    encode_main(SMALL + ["--family", "lhbdc", "--bin", bin_path])
    assert os.path.getsize(bin_path) > 0

    with open(bin_path, "rb") as f:
        seq = VSequenceBitstream.deserialize(f.read())
    assert seq.family == "lhbdc"
    assert (seq.width, seq.height, seq.gop, seq.n_frames) == (64, 64, 4, 9)
    assert sum(1 for t, _, _ in seq.frames if t == "I") == 3
    assert sorted(i for _, i, _ in seq.frames) == list(range(9))

    model_args = SMALL[SMALL.index("--init"):]
    decode_main(model_args + ["--bin", bin_path, "--out_dir", out_dir,
                              "--synthetic", "9"])
    decoded = sorted(os.listdir(out_dir))
    assert decoded == [f"frame_{i:05d}.png" for i in range(9)]

    from tpuvc.data.frames import load_png

    img = load_png(os.path.join(out_dir, "frame_00000.png"))
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img.astype(np.float32)).all()


def test_level_batched_round_trip(tmp_path):
    """mode=1 streams: batched encode, batched decode with the same chunk
    shapes, reconstructions valid for every frame."""
    from tpuvc.cli.decode_v import main as decode_main
    from tpuvc.cli.encode_v import main as encode_main

    bin_path = str(tmp_path / "seq_lb.tpvb")
    out_dir = str(tmp_path / "dec_lb")
    encode_main(SMALL + ["--family", "lhbdc", "--bin", bin_path,
                         "--level_batched", "--max_batch", "2"])
    with open(bin_path, "rb") as f:
        seq = VSequenceBitstream.deserialize(f.read())
    assert seq.mode == 1 and seq.max_batch == 2
    assert sorted(i for _, i, _ in seq.frames) == list(range(9))

    model_args = SMALL[SMALL.index("--init"):]
    decode_main(model_args + ["--bin", bin_path, "--out_dir", out_dir,
                              "--synthetic", "9"])
    decoded = sorted(os.listdir(out_dir))
    assert decoded == [f"frame_{i:05d}.png" for i in range(9)]

    from tpuvc.data.frames import load_png

    img = load_png(os.path.join(out_dir, "frame_00004.png"))
    assert np.isfinite(img.astype(np.float32)).all()


def test_level_batched_flexrate_round_trip(tmp_path):
    """mode=1 with the flexrate family decodes cleanly."""
    from tpuvc.cli.decode_v import main as decode_main
    from tpuvc.cli.encode_v import main as encode_main

    bin_path = str(tmp_path / "seq_fr.tpvb")
    out_dir = str(tmp_path / "dec_fr")
    encode_main(SMALL + ["--family", "flexrate", "--bin", bin_path,
                         "--level_batched", "--max_batch", "2",
                         "--n", "1", "--interp", "0.7"])
    with open(bin_path, "rb") as f:
        seq = VSequenceBitstream.deserialize(f.read())
    assert seq.family == "flexrate" and seq.mode == 1

    model_args = SMALL[SMALL.index("--init"):]
    decode_main(model_args + ["--bin", bin_path, "--out_dir", out_dir,
                              "--synthetic", "9"])
    assert sorted(os.listdir(out_dir)) == [
        f"frame_{i:05d}.png" for i in range(9)
    ]
    # A regroup/rANS desync would crater these; random-init codecs sit
    # around 5 dB on this synthetic content.
    ps = _decoded_psnrs(out_dir)
    assert all(3.0 < p < 60.0 for p in ps), ps


def _decoded_psnrs(out_dir, n=9):
    from tpuvc.data.frames import load_png
    from tpuvc.data.uvg import SyntheticSequence
    from tpuvc.eval.metrics import psnr_uint8_np

    src = SyntheticSequence(n_frames=n, h=64, w=64)
    return [
        psnr_uint8_np(
            src.u8(i)[0, :64, :64],
            load_png(os.path.join(out_dir, f"frame_{i:05d}.png")),
        )
        for i in range(n)
    ]


def test_level_batched_mesh_round_trip(tmp_path):
    """mode=1 with --mesh 2: level-batch device stages shard over a
    2-device mesh (virtual CPU devices from conftest); the header records
    the mesh size and the decoder replays identically-sharded graphs.
    Encoder reconstructions and decoder outputs must still agree (the
    entropy decode desyncs otherwise)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from tpuvc.cli.decode_v import main as decode_main
    from tpuvc.cli.encode_v import main as encode_main

    bin_path = str(tmp_path / "seq_mesh.tpvb")
    out_dir = str(tmp_path / "dec_mesh")
    encode_main(SMALL + ["--family", "lhbdc", "--bin", bin_path,
                         "--level_batched", "--max_batch", "2",
                         "--mesh", "2"])
    with open(bin_path, "rb") as f:
        seq = VSequenceBitstream.deserialize(f.read())
    assert seq.mode == 1 and seq.mesh == 2

    model_args = SMALL[SMALL.index("--init"):]
    decode_main(model_args + ["--bin", bin_path, "--out_dir", out_dir,
                              "--synthetic", "9"])
    assert sorted(os.listdir(out_dir)) == [
        f"frame_{i:05d}.png" for i in range(9)
    ]
    ps = _decoded_psnrs(out_dir)
    assert all(3.0 < p < 60.0 for p in ps), ps


def test_level_batched_window_gops_round_trip(tmp_path):
    """mode=1 with cross-GOP windows (window_gops=2): one window spans
    both GOPs; the decoder regroups by window + level."""
    from tpuvc.cli.decode_v import main as decode_main
    from tpuvc.cli.encode_v import main as encode_main

    bin_path = str(tmp_path / "seq_wg.tpvb")
    out_dir = str(tmp_path / "dec_wg")
    encode_main(SMALL + ["--family", "lhbdc", "--bin", bin_path,
                         "--level_batched", "--max_batch", "4",
                         "--window_gops", "2"])
    with open(bin_path, "rb") as f:
        seq = VSequenceBitstream.deserialize(f.read())
    assert seq.mode == 1 and seq.window_gops == 2
    # Cross-GOP batching: the deepest level of both GOPs rides one run of
    # consecutive records (frames 1,3 of each GOP -> 4 same-level records).
    b_idx = [i for t, i, _ in seq.frames if t == "B"]
    assert sorted(b_idx) == [1, 2, 3, 5, 6, 7]

    model_args = SMALL[SMALL.index("--init"):]
    decode_main(model_args + ["--bin", bin_path, "--out_dir", out_dir,
                              "--synthetic", "9"])
    assert sorted(os.listdir(out_dir)) == [
        f"frame_{i:05d}.png" for i in range(9)
    ]
    ps = _decoded_psnrs(out_dir)
    assert all(3.0 < p < 60.0 for p in ps), ps


@pytest.mark.parametrize("family", ["deform_b", "flowguided_b"])
def test_level_batched_mesh_v34_round_trip(tmp_path, family):
    """--mesh 2 for the CondELIC families (v3/v4): the group-loop entropy
    stages shard over a 2-device mesh on both sides; decoded frames must
    match the encoder's reconstructions (else the conditional entropy
    decode desyncs)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from tpuvc.cli.decode_v import main as decode_main
    from tpuvc.cli.encode_v import main as encode_main

    bin_path = str(tmp_path / f"seq_mesh_{family}.tpvb")
    out_dir = str(tmp_path / f"dec_mesh_{family}")
    encode_main(SMALL + ["--family", family, "--bin", bin_path,
                         "--level_batched", "--max_batch", "2",
                         "--mesh", "2"])
    with open(bin_path, "rb") as f:
        seq = VSequenceBitstream.deserialize(f.read())
    assert seq.mode == 1 and seq.mesh == 2

    model_args = SMALL[SMALL.index("--init"):]
    decode_main(model_args + ["--bin", bin_path, "--out_dir", out_dir,
                              "--synthetic", "9"])
    assert sorted(os.listdir(out_dir)) == [
        f"frame_{i:05d}.png" for i in range(9)
    ]
    ps = _decoded_psnrs(out_dir)
    assert all(3.0 < p < 60.0 for p in ps), ps
