"""CPU round trip of the single-B-frame CLIs (the reference's
encode_B/decode_B surface) including the bf16 compute-policy flag."""

import os

import numpy as np

import pytest

pytestmark = pytest.mark.slow


def _write_pngs(tmp_path, n=3):
    from tpuvc.data.frames import save_png

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    paths = []
    for i in range(n):
        img = np.clip(base.astype(np.int32) + 5 * i, 0, 255).astype(np.uint8)
        p = str(tmp_path / f"f{i}.png")
        save_png(p, img)
        paths.append(p)
    return paths


def test_encode_decode_b_cli_real_frames(tmp_path):
    """Round trip on the bundled photographic frames (tests/frames/*.png,
    the reference's LHBDC/frames fixture role): natural textures and
    coherent sub-pixel motion through the flow + entropy paths, with a
    sanity reconstruction floor and deterministic decode."""
    from tpuvc.cli.decode_b import main as decode_main
    from tpuvc.cli.encode_b import main as encode_main
    from tpuvc.data.frames import load_png
    from tpuvc.eval.metrics import psnr_uint8

    frames = os.path.join(os.path.dirname(__file__), "frames")
    r1 = os.path.join(frames, "ref_1.png")
    cur = os.path.join(frames, "current.png")
    r2 = os.path.join(frames, "ref_2.png")
    bin_path = str(tmp_path / "bits.bin")
    out_path = str(tmp_path / "dec.png")
    common = ["--family", "lhbdc", "--init", "random", "--N", "32"]
    encode_main(common + ["--ref_1", r1, "--ref_2", r2, "--current", cur,
                          "--bin", bin_path, "--l", "845"])
    assert os.path.getsize(bin_path) > 0
    decode_main(common + ["--ref_1", r1, "--ref_2", r2, "--bin", bin_path,
                          "--out", out_path, "--current", cur])
    img = load_png(out_path)
    gt = load_png(cur)
    assert img.shape == gt.shape == (192, 256, 3)
    # Untrained weights: the floor guards against NaN/black frames, not RD.
    p = psnr_uint8(img, gt)
    assert np.isfinite(p) and p > 4.0, p

    # Decode determinism: a second decode writes identical pixels.
    out2 = str(tmp_path / "dec2.png")
    decode_main(common + ["--ref_1", r1, "--ref_2", r2, "--bin", bin_path,
                          "--out", out2, "--current", cur])
    assert np.array_equal(load_png(out2), img)


def test_encode_decode_b_cli_bf16(tmp_path):
    from tpuvc.cli.decode_b import main as decode_main
    from tpuvc.cli.encode_b import main as encode_main

    r1, cur, r2 = _write_pngs(tmp_path)
    bin_path = str(tmp_path / "bits.bin")
    out_path = str(tmp_path / "dec.png")
    common = ["--family", "lhbdc", "--init", "random", "--N", "32",
              "--compute_dtype", "bfloat16"]
    encode_main(common + ["--ref_1", r1, "--ref_2", r2, "--current", cur,
                          "--bin", bin_path, "--l", "845"])
    assert os.path.getsize(bin_path) > 0
    decode_main(common + ["--ref_1", r1, "--ref_2", r2, "--bin", bin_path,
                          "--out", out_path, "--current", cur])
    from tpuvc.data.frames import load_png

    img = load_png(out_path)
    assert img.shape == (64, 64, 3)
