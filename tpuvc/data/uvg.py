"""UVG / test-set sequence loading.

Parity: /root/reference/LHBDC/test/utils.py:163-228 (UVGTestDataset) and the
per-sequence frame lists of ICIP2023/configs/dataset/UVG.yaml. Frames are
PNGs named ``im%05d.png``-style (any sorted glob works); loading is lazy and
cached per call site so 600-frame 1080p sequences never sit in host RAM.
"""

from __future__ import annotations

import functools
import glob
import os

import numpy as np

from tpuvc.data.frames import load_png, to_float
from tpuvc.ops.pad import pad_to_multiple


def _pad_np(img: np.ndarray, multiple: int) -> np.ndarray:
    """Host-side reflection pad (same geometry as ops.pad.pad_to_multiple)
    — keeps the loader off the device and the dtype uint8."""
    h, w = img.shape[-3], img.shape[-2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph == 0 and pw == 0:
        return img
    pad_width = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return np.pad(img, pad_width, mode="reflect")


def device_frame(u8: np.ndarray):
    """Upload a uint8 frame and convert to float on device: the
    host->device link moves 4x less data than uploading the float view
    (load-bearing through the ~50 MB/s axon relay; identical values to
    ``to_float`` on host)."""
    import jax.numpy as jnp

    return jnp.asarray(u8).astype(jnp.float32) / 255.0


class SequenceFrames:
    """Lazy indexable of padded (1, H', W', 3) frames for one sequence."""

    def __init__(self, directory: str, n_frames: int | None = None,
                 multiple: int = 64, cache_size: int = 8):
        self.paths = sorted(
            glob.glob(os.path.join(directory, "*.png"))
        )
        if n_frames is not None:
            self.paths = self.paths[:n_frames]
        assert self.paths, f"no frames in {directory}"
        first = to_float(load_png(self.paths[0]))
        self.size = first.shape[:2]
        self._load = functools.lru_cache(maxsize=cache_size)(self._load_uncached)

    def __len__(self):
        return len(self.paths)

    def _load_uncached(self, idx: int) -> np.ndarray:
        img = load_png(self.paths[idx])[None]  # uint8
        return _pad_np(img, 64)

    def __getitem__(self, idx: int) -> np.ndarray:
        return to_float(self._load(idx))

    def u8(self, idx: int) -> np.ndarray:
        """Padded (1, H', W', 3) uint8 — 4x smaller host->device upload
        than the float view; convert with ``device_frame``."""
        return self._load(idx)


class SyntheticSequence:
    """Synthetic drifting sequence for tests: same interface. Frames are
    uint8-quantized like real PNG sources (so the u8 upload path is
    value-identical to the float view)."""

    def __init__(self, n_frames: int = 17, h: int = 128, w: int = 192,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        base = rng.random((h, w, 3), dtype=np.float32)
        drift = 0.01 * rng.standard_normal((h, w, 3)).astype(np.float32)
        self.frames = [
            np.clip(np.rint(np.clip(base + i * drift, 0, 1) * 255), 0, 255)
            .astype(np.uint8)
            for i in range(n_frames)
        ]
        self.size = (h, w)

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx: int) -> np.ndarray:
        return to_float(self.u8(idx))

    def u8(self, idx: int) -> np.ndarray:
        return _pad_np(self.frames[idx][None], 64)
