"""Still-image (Kodak-style) eval: dataset, runner, CLI smoke."""

import numpy as np
import pytest

from tpuvc.data.kodak import SyntheticImages
from tpuvc.eval.image_runner import eval_images
from tpuvc.eval.infographic import TestInfographic


def test_synthetic_images_padded():
    ds = SyntheticImages(n=2, h=100, w=150)
    assert len(ds) == 2
    assert ds[0].shape == (1, 128, 192, 3)  # padded to x64
    assert ds.size(0) == (100, 150)


def test_eval_images_identity_codec():
    """A perfect 0-bit codec scores inf-free high PSNR and 0 bpp."""
    ds = SyntheticImages(n=2, h=64, w=64)
    info = TestInfographic()

    def intra_fn(x):
        return x, 128.0  # echo + 128 bits

    psnrs, bpps = eval_images(ds, intra_fn, name="synth", level=1, info=info)
    assert len(psnrs) == 2
    assert all(p > 50 for p in psnrs)
    np.testing.assert_allclose(bpps, 128.0 / (64 * 64))
    df = info.dataframe()
    assert list(df["type"]) == ["I", "I"]
    assert list(df["level"]) == [1, 1]


def test_image_folder(tmp_path):
    from PIL import Image

    from tpuvc.data.kodak import ImageFolder

    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.random((80, 130, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"kodim{i:02d}.png")
    ds = ImageFolder(str(tmp_path))
    assert len(ds) == 2
    assert ds[0].shape == (1, 128, 192, 3)
    assert ds.size(1) == (80, 130)


@pytest.mark.slow
def test_cli_smoke(tmp_path, capsys):
    from tpuvc.cli.test_image import main

    main([
        "dataset.name=synthetic",
        "dataset.height=64",
        "dataset.width=64",
        "levels=(0,)",
        f"output_dir={tmp_path}",
    ])
    outp = capsys.readouterr().out
    assert "level 0" in outp
    assert (tmp_path / "results.csv").exists()
