"""Interval-set arithmetic on int64 coordinate arrays.

Shared by bar rescue (outgroup-coverage tests) and the ingroup→outgroup
trim cascade (uncovered-remainder extraction) — the numpy replacement
for the reference's bedRegion machinery (bar/impl/rescue.c) and
`paffy to_bed` / `faffy extract` (paf/local_alignment.py:460-496).
"""

from __future__ import annotations

import numpy as np


def merge_intervals(ivs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge (n,2) start/end intervals → sorted disjoint (starts, ends)."""
    if not len(ivs):
        z = np.zeros(0, dtype=np.int64)
        return z, z
    ivs = np.asarray(ivs, dtype=np.int64)
    order = np.argsort(ivs[:, 0], kind="stable")
    s, e = ivs[order, 0], ivs[order, 1]
    run_end = np.maximum.accumulate(e)
    new_run = np.zeros(len(s), dtype=bool)
    new_run[0] = True
    new_run[1:] = s[1:] > run_end[:-1]
    starts = s[new_run]
    ends = np.maximum.reduceat(e, np.flatnonzero(new_run))
    return starts, ends


def interval_coverage(qa: np.ndarray, qb: np.ndarray,
                      s: np.ndarray, e: np.ndarray) -> np.ndarray:
    """Covered bases of each query [qa,qb) by disjoint sorted (s,e)."""
    qa = np.asarray(qa, dtype=np.int64)
    qb = np.asarray(qb, dtype=np.int64)
    if not len(s):
        return np.zeros(len(qa), dtype=np.int64)
    C = np.concatenate([[0], np.cumsum(e - s)])
    i = np.searchsorted(e, qa, side="right")
    j = np.searchsorted(s, qb, side="left")
    full = C[j] - C[i]
    has = j > i
    si = s[np.minimum(i, len(s) - 1)]
    ej = e[np.maximum(j - 1, 0)]
    full = full - np.where(has, np.maximum(qa - si, 0), 0)
    full = full - np.where(has, np.maximum(ej - qb, 0), 0)
    return np.maximum(full, 0)


def complement_intervals(s: np.ndarray, e: np.ndarray, lo: int, hi: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Gaps of disjoint sorted (s,e) within [lo, hi)."""
    s = np.clip(np.asarray(s, dtype=np.int64), lo, hi)
    e = np.clip(np.asarray(e, dtype=np.int64), lo, hi)
    keep = e > s
    s, e = s[keep], e[keep]
    gs = np.concatenate([[lo], e])
    ge = np.concatenate([s, [hi]])
    keep = ge > gs
    return gs[keep], ge[keep]
