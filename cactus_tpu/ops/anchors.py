"""MUM anchoring for the pecan pair-HMM path.

The reference cPecan path anchors big DP matrices on Maximal Unique
Matches before running the banded HMM (config useMumAnchors=1,
recursiveMums=1, splitMatrixBiggerThanThis=3000,
anchorMatrixBiggerThanThis=500; cactus_progressive_config.xml:276-285,
consumed at bar/impl/bar.c:32-33).  Anchors pin the alignment to its
high-confidence exact matches so the expensive posterior DP runs in
narrow bands around them instead of one huge band spanning the whole
matrix.

TPU-native formulation: unique-in-both k-mer matches (a MUM seed is by
definition unique in each sequence) found with the same sort +
searchsorted join as ops/seeds.py, chained by longest-increasing-
subsequence on the target coordinate, then used as split points so
every sub-matrix's DP span stays under `max_span` — each piece runs in
the batched banded kernel with a small band, and hit coordinates rebase
by the piece offsets.
"""

from __future__ import annotations

import numpy as np


def _kmer_codes(seq: np.ndarray, k: int) -> np.ndarray:
    """Packed 2-bit k-mer code per position (len(seq)-k+1,). Positions
    containing non-ACGT codes get code -1 (excluded)."""
    n = len(seq) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    s = seq.astype(np.int64)
    bad = s > 3
    code = np.zeros(n, dtype=np.int64)
    badrun = np.zeros(n, dtype=bool)
    for o in range(k):
        code = (code << 2) | s[o:o + n]
        badrun |= bad[o:o + n]
    return np.where(badrun, -1, code)


def unique_matches(q: np.ndarray, t: np.ndarray, k: int = 20) -> np.ndarray:
    """(n, 2) int64 array of (qpos, tpos) for k-mers occurring exactly
    once in q AND exactly once in t (MUM seeds)."""
    cq = _kmer_codes(q, k)
    ct = _kmer_codes(t, k)
    if not len(cq) or not len(ct):
        return np.empty((0, 2), dtype=np.int64)

    def uniques(c):
        order = np.argsort(c, kind="stable")
        sc = c[order]
        first = np.concatenate([[True], sc[1:] != sc[:-1]])
        last = np.concatenate([sc[1:] != sc[:-1], [True]])
        uniq = first & last & (sc >= 0)
        return sc[uniq], order[uniq]

    vq, pq = uniques(cq)
    vt, pt = uniques(ct)
    if not len(vt):
        return np.empty((0, 2), dtype=np.int64)
    ii = np.clip(np.searchsorted(vt, vq), 0, len(vt) - 1)
    ok = vt[ii] == vq
    out = np.stack([pq[ok], pt[ii[ok]]], axis=1)
    return out[np.argsort(out[:, 0], kind="stable")]


def chain_lis(matches: np.ndarray) -> np.ndarray:
    """Longest increasing subsequence on tpos (matches sorted by qpos):
    the maximal consistent anchor chain.  O(n log n)."""
    if not len(matches):
        return matches
    tails: list[int] = []          # tpos of smallest tail per LIS length
    tails_idx: list[int] = []
    prev = np.full(len(matches), -1, dtype=np.int64)
    import bisect
    for i, (_qp, tp) in enumerate(matches):
        pos = bisect.bisect_left(tails, tp)
        if pos == len(tails):
            tails.append(int(tp))
            tails_idx.append(i)
        else:
            tails[pos] = int(tp)
            tails_idx[pos] = i
        prev[i] = tails_idx[pos - 1] if pos > 0 else -1
    out = []
    i = tails_idx[-1]
    while i >= 0:
        out.append(i)
        i = int(prev[i])
    return matches[out[::-1]]


def split_points(q_len: int, t_len: int, anchors: np.ndarray,
                 max_span: int, k: int) -> list[tuple[int, int]]:
    """Pick (qcut, tcut) anchor midpoints so each piece's max dimension
    stays under max_span (reference splitMatrixBiggerThanThis).  Cuts
    land at anchor centers — positions the exact-match chain asserts are
    aligned, so splitting there cannot cross a true alignment path."""
    cuts = []
    last_q = 0
    for qp, tp in anchors:
        c_q, c_t = int(qp) + k // 2, int(tp) + k // 2
        if c_q - last_q >= max_span // 2 and c_q < q_len and c_t < t_len:
            cuts.append((c_q, c_t))
            last_q = c_q
    return cuts


def split_pair_by_mums(q: np.ndarray, t: np.ndarray, max_span: int = 3000,
                       k: int = 20, min_anchor_sep: int = 64,
                       recursive: bool = False):
    """[(q0, t0, qseg, tseg)] pieces covering q x t, split at MUM-chain
    anchor centers whenever a piece would exceed max_span.  Falls back
    to a single piece when no anchors exist.

    recursive: pieces still exceeding max_span (no long-k MUMs inside)
    re-split with a halved seed length, down to k=8 — the reference
    recursiveMums option (config XML :285, bar.c:33)."""
    if max(len(q), len(t)) <= max_span:
        return [(0, 0, q, t)]
    anchors = chain_lis(unique_matches(q, t, k))
    if len(anchors) > 1:
        keep = [0]
        for i in range(1, len(anchors)):
            if anchors[i, 0] - anchors[keep[-1], 0] >= min_anchor_sep:
                keep.append(i)
        anchors = anchors[keep]
    cuts = split_points(len(q), len(t), anchors, max_span, k)
    pieces = []
    q0 = t0 = 0
    for cq, ct in cuts + [(len(q), len(t))]:
        if cq > q0 and ct > t0:
            pieces.append((q0, t0, q[q0:cq], t[t0:ct]))
        q0, t0 = cq, ct
    pieces = pieces or [(0, 0, q, t)]
    if recursive and k > 8:
        out = []
        for p0, s0, qs, ts in pieces:
            if max(len(qs), len(ts)) > max_span:
                # halve the seed length (strictly decreasing -> k=8 floor
                # bounds the recursion depth)
                for sq0, st0, sqs, sts in split_pair_by_mums(
                        qs, ts, max_span=max_span, k=max(8, k // 2),
                        min_anchor_sep=min_anchor_sep, recursive=True):
                    out.append((p0 + sq0, s0 + st0, sqs, sts))
            else:
                out.append((p0, s0, qs, ts))
        pieces = out
    return pieces
