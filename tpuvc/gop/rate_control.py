"""Per-frame rate control tables (O4).

Parity targets in /root/reference:
  - Flex-Rate per-hierarchy-level quality pairs: 8 RD points, each an
    (intra_quality, {hier_level: (n, l)}) assignment
    (Flex-Rate.../test/testing.py:79-89).
  - v3/v4 scalar level s indexing the gain vectors, with per-level beta
    (ICIP2023/configs/test.yaml:28, ICIP2024/src/train/config.py:42-43).
"""

from __future__ import annotations

#: Flex-Rate RD points: (intra_q, {hierarchy_level: (n, l)}).
#: n indexes the 6-level gain matrix, l in (0,1] interpolates toward n+1.
FLEXRATE_QUALITIES = [
    (5, {0: (1, 1.0), 1: (0, 0.33), 2: (0, 0.66), 3: (0, 1.0)}),
    (6, {0: (1, 0.66), 1: (1, 1.0), 2: (0, 0.33), 3: (0, 0.66)}),
    (6, {0: (1, 0.33), 1: (1, 0.66), 2: (1, 1.0), 3: (0, 0.33)}),
    (6, {0: (2, 1.0), 1: (1, 0.33), 2: (1, 0.66), 3: (1, 1.0)}),
    (7, {0: (2, 0.66), 1: (2, 1.0), 2: (1, 0.33), 3: (1, 0.66)}),
    (7, {0: (2, 0.33), 1: (2, 0.66), 2: (2, 1.0), 3: (1, 0.33)}),
    (7, {0: (3, 1.0), 1: (2, 0.33), 2: (2, 0.66), 3: (2, 1.0)}),
    (8, {0: (3, 1.0), 1: (3, 1.0), 2: (3, 1.0), 3: (2, 0.33)}),
]

#: LHBDC: one model per lambda; intra quality paired per point
#: (LHBDC/test/testing.py pairs mbt2018_mean quality with lambda).
LHBDC_POINTS = [
    (4, 228),
    (5, 436),
    (6, 845),
    (7, 1626),
    (8, 3141),
]


def flexrate_rate_for_frame(point: int, hier_level: int) -> tuple[int, float]:
    """(n, l) for a B-frame at ``hier_level`` under RD point ``point``.

    Hierarchy levels deeper than the table (level 4 in GOP-16) reuse the
    deepest entry, matching the reference's 4-level table applied to GOP-16.
    """
    intra_q, table = FLEXRATE_QUALITIES[point]
    return table[min(hier_level - 1, max(table))]
