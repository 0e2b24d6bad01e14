"""PMF -> quantized CDF tables for the host rANS coder.

TPU-native replacement for compressai._CXX.pmf_to_quantized_cdf (used by the
reference entropy models' ``update()``; see SURVEY.md section 2.3). The
quantization runs on host in numpy: it executes once per trained model (per
``update()``), not per frame, so there is nothing to win by porting it to
device. A C++ twin lives in tpuvc/coder/csrc for use inside the coder library.

Contract (shared with the rANS coder):
  - precision-bit total mass: cdf[0] = 0, cdf[-1] = 2**precision.
  - strictly monotone: every symbol, including escape slots, has freq >= 1.
"""

from __future__ import annotations

import numpy as np


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Quantize a pmf into an integer CDF with total mass 2**precision.

    Every symbol is guaranteed a nonzero frequency; the deficit/surplus after
    flooring is settled against the highest-probability symbols so the
    distortion of the coded distribution is minimal.
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    assert pmf.ndim == 1 and pmf.size >= 1, pmf.shape
    if not np.all(np.isfinite(pmf)):
        raise ValueError("pmf contains non-finite values")
    pmf = np.clip(pmf, 0.0, None)
    total = 1 << precision
    n = pmf.size
    if n > total:
        raise ValueError(f"alphabet size {n} exceeds 2^{precision}")

    norm = pmf.sum()
    if norm <= 0:
        freqs = np.full(n, total // n, dtype=np.int64)
        freqs[: total - freqs.sum()] += 1
    else:
        freqs = np.floor(pmf / norm * total).astype(np.int64)
        freqs = np.maximum(freqs, 1)
        deficit = total - freqs.sum()
        if deficit > 0:
            # Give surplus mass to the largest-probability symbols.
            order = np.argsort(-pmf, kind="stable")
            idx = order[np.arange(deficit) % n]
            np.add.at(freqs, idx, 1)
        elif deficit < 0:
            # Steal from the largest frequencies, never below 1.
            for _ in range(-deficit):
                i = np.argmax(freqs)
                if freqs[i] <= 1:
                    raise ValueError("cannot renormalize pmf: too many symbols")
                freqs[i] -= 1
    cdf = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(freqs, out=cdf[1:])
    assert cdf[-1] == total
    return cdf


def build_cdf_table(
    pmfs: np.ndarray,
    lengths: np.ndarray,
    tail_masses: np.ndarray,
    precision: int = 16,
):
    """Build padded per-row CDF tables from per-row pmfs of varying length.

    Args:
      pmfs: (n_rows, max_len) pmf values; row i uses pmfs[i, :lengths[i]].
      lengths: (n_rows,) valid pmf lengths.
      tail_masses: (n_rows,) leftover probability folded into one escape slot.

    Returns:
      cdfs: (n_rows, max_len + 2) int32, row i valid through cdf_lengths[i].
      cdf_lengths: (n_rows,) = lengths + 2 (pmf + escape + leading zero).
    """
    pmfs = np.asarray(pmfs, dtype=np.float64)
    lengths = np.asarray(lengths, dtype=np.int32)
    tail_masses = np.asarray(tail_masses, dtype=np.float64)
    n_rows, max_len = pmfs.shape
    cdfs = np.zeros((n_rows, max_len + 2), dtype=np.int32)
    for i in range(n_rows):
        L = int(lengths[i])
        row_pmf = np.concatenate([pmfs[i, :L], [max(tail_masses[i], 0.0)]])
        cdf = pmf_to_quantized_cdf(row_pmf, precision)
        cdfs[i, : L + 2] = cdf
    return cdfs, lengths + 2
