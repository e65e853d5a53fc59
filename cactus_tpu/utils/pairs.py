"""Packed homology-pair arrays.

The accuracy oracle (mafComparator-equivalent, reference
test/evolverTest.py:1208-1269) compares sets of homologous base pairs
between two genomes.  Python sets of (posA, posB, strand) tuples cost
~200 B/pair and a dict op per base — a 600 kb genome pair has ~10^6
truth pairs, and the evolver-scale gate needs tens of such pair sets per
run.  Here a pair is one int64 key::

    key = posA << 32 | posB << 1 | (strand > 0)

(positions < 2^31; per-genome concatenated coordinates) and pair sets
are sorted-unique int64 arrays, so intersection is a merge and the whole
oracle is O(n log n) numpy.
"""

from __future__ import annotations

import numpy as np

_POS_BITS = 31


def pack_pairs(pos_a: np.ndarray, pos_b: np.ndarray,
               rel_strand: np.ndarray) -> np.ndarray:
    """Pack parallel (posA, posB, ±1 strand) arrays into unsorted keys."""
    pa = np.asarray(pos_a, dtype=np.int64)
    pb = np.asarray(pos_b, dtype=np.int64)
    if len(pa) and (int(pa.max(initial=0)) >= 1 << _POS_BITS
                    or int(pb.max(initial=0)) >= 1 << _POS_BITS):
        raise OverflowError("position exceeds 31-bit pair-key budget")
    sbit = (np.asarray(rel_strand) > 0).astype(np.int64)
    return (pa << 32) | (pb << 1) | sbit


def unpack_pairs(keys: np.ndarray) -> set[tuple[int, int, int]]:
    """Decode keys back to the legacy tuple-set representation."""
    keys = np.asarray(keys, dtype=np.int64)
    pa = keys >> 32
    pb = (keys >> 1) & ((1 << _POS_BITS) - 1)
    s = np.where(keys & 1, 1, -1)
    return {(int(a), int(b), int(x)) for a, b, x in zip(pa, pb, s)}


def unique_keys(keys: np.ndarray) -> np.ndarray:
    return np.unique(np.asarray(keys, dtype=np.int64))


def strandless(keys: np.ndarray) -> np.ndarray:
    """Drop the strand bit (sorted-unique in, sorted-unique out)."""
    return np.unique(np.asarray(keys, dtype=np.int64) >> 1)


def intersect_count(a: np.ndarray, b: np.ndarray) -> int:
    """|a ∩ b| for sorted-unique key arrays."""
    return len(np.intersect1d(a, b, assume_unique=True))


def join_expand(keys_a: np.ndarray, keys_b: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """All-matches equi-join: for every i with keys_a[i] present in
    keys_b, emit one (i, j) per matching j.  Returns (idx_a, idx_b)
    index arrays into the inputs.  keys_b need not be sorted."""
    keys_a = np.asarray(keys_a)
    keys_b = np.asarray(keys_b)
    order = np.argsort(keys_b, kind="stable")
    kb_s = keys_b[order]
    left = np.searchsorted(kb_s, keys_a, side="left")
    right = np.searchsorted(kb_s, keys_a, side="right")
    counts = right - left
    total = int(counts.sum())
    idx_a = np.repeat(np.arange(len(keys_a)), counts)
    # position within each run: global arange minus each run's start
    run_starts = np.repeat(np.cumsum(counts) - counts, counts)
    idx_b_sorted = np.repeat(left, counts) + (np.arange(total) - run_starts)
    return idx_a, order[idx_b_sorted]
