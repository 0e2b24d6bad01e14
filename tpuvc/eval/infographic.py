"""Frame-level results ledger and aggregations.

Parity: /root/reference/LHBDC/test/utils.py:393-490 (``TestInfographic``, V2)
plus the results-CSV writer of ICIP2023/src/test.py:98-145,176-178, whose
column layout (level, sequence, psnr, bpp) must stay byte-comparable with
``icip202x_results.csv`` (BASELINE.md targets).
"""

from __future__ import annotations

import pandas as pd


class TestInfographic:
    """Accumulates one row per coded frame, then aggregates."""

    COLUMNS = ["video", "level", "frame_num", "type", "psnr", "size", "pixels"]

    def __init__(self, extra_columns: tuple[str, ...] = ()):
        self.columns = self.COLUMNS + list(extra_columns)
        self.rows: list[dict] = []

    def update(self, video, level, frame_num, frame_type, psnr, size, pixels,
               **extra) -> None:
        row = dict(
            video=video, level=level, frame_num=frame_num, type=frame_type,
            psnr=float(psnr), size=float(size), pixels=int(pixels),
        )
        row.update(extra)
        self.rows.append(row)

    def dataframe(self) -> pd.DataFrame:
        return pd.DataFrame(self.rows, columns=self.columns)

    def per_level(self) -> pd.DataFrame:
        """Mean PSNR and bpp per rate level (the headline RD points)."""
        df = self.dataframe()
        df["bpp"] = df["size"] / df["pixels"]
        per_video = (
            df.groupby(["level", "video"])[["psnr", "bpp"]].mean().reset_index()
        )
        return per_video.groupby("level")[["psnr", "bpp"]].mean().reset_index()

    def per_video(self) -> pd.DataFrame:
        df = self.dataframe()
        df["bpp"] = df["size"] / df["pixels"]
        return (
            df.groupby(["level", "video"])[["psnr", "bpp"]].mean().reset_index()
        )

    def per_frame_type(self) -> pd.DataFrame:
        df = self.dataframe()
        df["bpp"] = df["size"] / df["pixels"]
        return df.groupby(["level", "type"])[["psnr", "bpp"]].mean().reset_index()

    def results_csv(self, path) -> pd.DataFrame:
        """Write the ICIP-style results CSV: level, sequence, psnr, bpp."""
        out = self.per_video().rename(columns={"video": "sequence"})
        out = out[["level", "sequence", "psnr", "bpp"]]
        out.to_csv(path, index=False)
        return out

    def to_excel(self, path) -> None:
        self.dataframe().to_excel(path, index=False)
