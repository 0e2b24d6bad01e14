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
        img = to_float(load_png(self.paths[idx]))[None]
        padded, _ = pad_to_multiple(img, 64)
        return np.asarray(padded)

    def __getitem__(self, idx: int) -> np.ndarray:
        return self._load(idx)


class SyntheticSequence:
    """Synthetic drifting sequence for tests: same interface."""

    def __init__(self, n_frames: int = 17, h: int = 128, w: int = 192,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        base = rng.random((h, w, 3), dtype=np.float32)
        drift = 0.01 * rng.standard_normal((h, w, 3)).astype(np.float32)
        self.frames = [
            np.clip(base + i * drift, 0, 1) for i in range(n_frames)
        ]
        self.size = (h, w)

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx: int) -> np.ndarray:
        padded, _ = pad_to_multiple(self.frames[idx][None], 64)
        return np.asarray(padded)
