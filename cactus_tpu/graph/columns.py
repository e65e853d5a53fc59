"""Base-level homology columns and blocks (pinch-graph equivalent).

Replaces stPinchGraphs (reference: submodule pinchesAndCacti, consumed via
caf/inc/stCaf.h:12-14).  Where the reference incrementally splits/merges
segment linked-lists per pinch, this build is **batch-vectorized**: all
pinches (PAF match runs) become edges of a bidirected base graph, homology
columns are connected components (scipy CC — C speed), and blocks are
recovered by merging columns whose members advance in lockstep.  This fits
the TPU-first dataflow: alignments arrive as dense anchor tensors from the
device; the host does one vectorized graph pass instead of pointer-chasing.

Coordinates: every base of every sequence gets a global index; orientation
is tracked with a 2x node duplication (node 2p = base p forward, 2p+1 =
base p reverse), so reverse-strand homologies fold into the same column
with opposite orientation — the bidirected semantics of stPinch blocks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import connected_components

from ..io.paf import PafRecord


@dataclass
class SeqTable:
    """Global base-index space over a set of named sequences."""
    names: list[str]
    lengths: np.ndarray          # (S,) int64
    offsets: np.ndarray          # (S,) int64 start of each sequence
    index: dict[str, int]

    @classmethod
    def build(cls, seq_lengths: dict[str, int]) -> "SeqTable":
        names = list(seq_lengths)
        lengths = np.array([seq_lengths[n] for n in names], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        return cls(names=names, lengths=lengths, offsets=offsets,
                   index={n: i for i, n in enumerate(names)})

    @property
    def total(self) -> int:
        return int(self.lengths.sum())

    def glob(self, name: str, pos) -> np.ndarray:
        return self.offsets[self.index[name]] + pos

    def seq_of(self, gpos: np.ndarray) -> np.ndarray:
        """Sequence id for each global position."""
        return np.searchsorted(self.offsets, gpos, side="right") - 1

    def local(self, gpos: np.ndarray):
        sid = self.seq_of(gpos)
        return sid, gpos - self.offsets[sid]


def paf_match_runs(rec: PafRecord):
    """Vectorized M-run extraction: (q_fwd_start, t_start, length, strand).

    For '-' records the run covers query forward positions
    [q_fwd_start, q_fwd_start+len) pairing in reverse with
    [t_start, t_start+len).
    """
    runs = []
    t = rec.tstart
    if rec.strand == "+":
        q = rec.qstart
        for op, ln in rec.cigar:
            if op in "M=X":
                runs.append((q, t, ln, 1))
                q += ln
                t += ln
            elif op == "I":
                q += ln
            elif op in "DN":
                t += ln
    else:
        q = rec.qend  # exclusive; walk down
        for op, ln in rec.cigar:
            if op in "M=X":
                runs.append((q - ln, t, ln, -1))
                q -= ln
                t += ln
            elif op == "I":
                q -= ln
            elif op in "DN":
                t += ln
    return runs


def edges_from_pafs(records, table: SeqTable,
                    min_run: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Expand PAF match runs into bidirected edge arrays (u, v).

    Node encoding: 2*g + 0 forward, 2*g + 1 reverse for global base g.
    A forward homology (a+, b+) adds edge (2a, 2b); the mirror (2a+1, 2b+1)
    is implied by construction (we add both for CC symmetry).
    """
    us, vs = [], []
    for rec in records:
        qg0 = table.glob(rec.qname, 0)
        tg0 = table.glob(rec.tname, 0)
        for q0, t0, ln, strand in paf_match_runs(rec):
            if ln < min_run:
                continue
            qpos = qg0 + q0 + np.arange(ln, dtype=np.int64)
            if strand == 1:
                tpos = tg0 + t0 + np.arange(ln, dtype=np.int64)
                us.append(2 * qpos)
                vs.append(2 * tpos)
                us.append(2 * qpos + 1)
                vs.append(2 * tpos + 1)
            else:
                tpos = tg0 + t0 + np.arange(ln - 1, -1, -1, dtype=np.int64)
                us.append(2 * qpos)
                vs.append(2 * tpos + 1)
                us.append(2 * qpos + 1)
                vs.append(2 * tpos)
    if not us:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    return np.concatenate(us), np.concatenate(vs)


@dataclass
class PinchColumns:
    """Homology columns over the global base space."""
    table: SeqTable
    col: np.ndarray     # (N,) int64 canonical column id per base
    ori: np.ndarray     # (N,) int8 orientation of the base in its column
    sizes: np.ndarray   # (n_cols,) int64 members per column

    @property
    def n_bases(self) -> int:
        return len(self.col)


def edges_from_runs(runs, table: SeqTable) -> tuple[np.ndarray, np.ndarray]:
    """Bidirected edges from global-coordinate match runs.

    runs: iterable of (ga, gb, ln, strand) — global base ga..ga+ln-1 pairs
    with gb..gb+ln-1 (strand +1) or gb+ln-1..gb (strand -1).  This is the
    format of phases.caf.blocks_to_match_edges and the BAR MSA output.
    """
    us, vs = [], []
    for ga, gb, ln, strand in runs:
        apos = ga + np.arange(ln, dtype=np.int64)
        if strand == 1:
            bpos = gb + np.arange(ln, dtype=np.int64)
            us.append(2 * apos)
            vs.append(2 * bpos)
            us.append(2 * apos + 1)
            vs.append(2 * bpos + 1)
        else:
            bpos = gb + np.arange(ln - 1, -1, -1, dtype=np.int64)
            us.append(2 * apos)
            vs.append(2 * bpos + 1)
            us.append(2 * apos + 1)
            vs.append(2 * bpos)
    if not us:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    return np.concatenate(us), np.concatenate(vs)


def build_columns(records, table: SeqTable,
                  runs=None) -> PinchColumns:
    """Connected components over the bidirected base graph → columns.

    Evidence edges come from PAF records and/or raw match runs (both may
    be given; they are unioned — the CAF+BAR merge path).
    """
    N = table.total
    u, v = edges_from_pafs(records or [], table)
    if runs is not None:
        u2, v2 = edges_from_runs(runs, table)
        u = np.concatenate([u, u2])
        v = np.concatenate([v, v2])
    n_nodes = 2 * N
    from ..native.build import cc_edges
    comp = cc_edges(n_nodes, u, v)
    fwd = comp[0::2]
    rev = comp[1::2]
    # canonical column: the lexicographically smaller of the two mirror
    # components; orientation = +1 if the forward node is in the canonical
    canonical = np.minimum(fwd, rev)
    ori = np.where(fwd <= rev, 1, -1).astype(np.int8)
    # re-densify ids
    uniq, col = np.unique(canonical, return_inverse=True)
    sizes = np.bincount(col).astype(np.int64)
    return PinchColumns(table=table, col=col, ori=ori, sizes=sizes)


@dataclass
class Blocks:
    """Maximal aligned blocks: runs of columns advancing in lockstep.

    Segment-level representation (memory is O(segments), never O(bases)
    — the property that admits chromosome-scale inputs; reference
    equivalent: stPinchGraphs segment lists).
    """
    table: SeqTable
    # per block: arrays over segments
    seg_block: np.ndarray       # (G,) block id per segment
    seg_seq: np.ndarray         # (G,) sequence id
    seg_start: np.ndarray       # (G,) local start
    seg_len: np.ndarray         # (G,) length (same within a block)
    seg_strand: np.ndarray      # (G,) +1/-1
    n_blocks: int
    support: np.ndarray | None = None  # (n_blocks,) pinch-support count

    def block_degree(self) -> np.ndarray:
        return np.bincount(self.seg_block, minlength=self.n_blocks)

    def block_length(self) -> np.ndarray:
        out = np.zeros(self.n_blocks, dtype=np.int64)
        out[self.seg_block] = self.seg_len
        return out

    def segments_of(self, b: int):
        idx = np.flatnonzero(self.seg_block == b)
        return [(int(self.seg_seq[i]), int(self.seg_start[i]),
                 int(self.seg_len[i]), int(self.seg_strand[i])) for i in idx]

    def block_of_base(self) -> np.ndarray:
        """Dense (N,) block id per base (-1 unaligned).  O(total bases)
        memory — only for tests/small inputs, never on the main path."""
        out = np.full(self.table.total, -1, dtype=np.int64)
        g0 = self.table.offsets[self.seg_seq] + self.seg_start
        for i in range(len(self.seg_block)):
            out[g0[i]:g0[i] + self.seg_len[i]] = self.seg_block[i]
        return out


def columns_to_blocks(pc: PinchColumns, min_degree: int = 2) -> Blocks:
    """Merge lockstep columns into blocks and segment the sequences.

    A base whose column has degree < min_degree is unaligned (-1).
    Two neighbouring bases p, p+1 in the same sequence stay in the same
    block iff their columns have equal size and every member of col(p)
    advances (orientation-aware) into col(p+1) — checked in bulk.
    """
    table = pc.table
    N = pc.n_bases
    col = pc.col.copy()
    ori = pc.ori
    sizes = pc.sizes

    aligned = sizes[col] >= min_degree

    # successor column along column orientation: member at base p with
    # ori o advances to base p+o (within its sequence)
    seq_id = table.seq_of(np.arange(N, dtype=np.int64))
    nxt = np.arange(N, dtype=np.int64) + ori.astype(np.int64)
    valid_nxt = (nxt >= 0) & (nxt < N)
    valid_nxt &= np.where(valid_nxt, seq_id[np.clip(nxt, 0, N - 1)] == seq_id,
                          False)
    nxt_c = np.clip(nxt, 0, N - 1)
    succ_col = np.where(valid_nxt & aligned, col[nxt_c], -1)
    succ_ok = valid_nxt & aligned & (sizes[np.maximum(succ_col, 0)] == sizes[col])
    # orientation must be preserved: ori of successor relative to its column
    # must equal ori of p (so the block strand pattern continues)
    succ_ok &= np.where(valid_nxt, ori[nxt_c] == ori, False)
    succ_col = np.where(succ_ok, succ_col, -1)

    # group by column: all members must agree on succ_col (and be aligned)
    order = np.argsort(col, kind="stable")
    gcol = col[order]
    gsucc = succ_col[order]
    boundaries = np.flatnonzero(np.diff(gcol)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(gcol)]])
    n_cols = len(sizes)
    # per-column: unique successor or -1
    succ_of_col = np.full(n_cols, -1, dtype=np.int64)
    first = gsucc[starts]
    same = np.ones(len(starts), dtype=bool)
    # vectorized "all equal within group": compare with group min and max
    gmin = np.minimum.reduceat(gsucc, starts)
    gmax = np.maximum.reduceat(gsucc, starts)
    same = (gmin == gmax) & (first >= 0)
    succ_of_col[gcol[starts]] = np.where(same, first, -1)

    # self-successor guard (palindromic folds)
    ids = np.arange(n_cols)
    succ_of_col[succ_of_col == ids] = -1

    # merge columns into blocks along the successor path (union via CC on
    # the path graph)
    mask = succ_of_col >= 0
    u = ids[mask]
    v = succ_of_col[mask]
    from ..native.build import cc_edges
    col_block = cc_edges(n_cols, u, v)

    # base-level block labels (scratch only; not stored on Blocks)
    block_of_base = np.where(aligned, col_block[col], -1)

    # segment the sequences: runs of equal (block, ori) within a sequence
    brk = np.ones(N, dtype=bool)
    if N > 1:
        samern = ((block_of_base[1:] == block_of_base[:-1])
                  & (seq_id[1:] == seq_id[:-1])
                  & (ori[1:] == ori[:-1])
                  & (block_of_base[1:] >= 0))
        # additionally the columns must actually be merged as successors in
        # the right order; runs of the same block id that are NOT lockstep
        # (e.g. two visits of the block) are split by column-successor check:
        fwd_ok = succ_of_col[col[:-1]] == col[1:]
        rev_ok = succ_of_col[col[1:]] == col[:-1]
        lockstep = np.where(ori[:-1] == 1, fwd_ok, rev_ok)
        samern &= lockstep
        brk[1:] = ~samern
    seg_first = np.flatnonzero(brk)
    seg_last = np.concatenate([seg_first[1:], [N]]) - 1
    seg_blocks = block_of_base[seg_first]
    keep = seg_blocks >= 0
    seg_first, seg_last = seg_first[keep], seg_last[keep]
    seg_blocks = seg_blocks[keep]
    seg_seq = seq_id[seg_first]
    seg_start = seg_first - table.offsets[seg_seq]
    seg_len = seg_last - seg_first + 1
    seg_strand = ori[seg_first].astype(np.int8)

    # re-densify block ids over kept segments
    uniq, seg_block = np.unique(seg_blocks, return_inverse=True)

    return Blocks(table=table,
                  seg_block=seg_block, seg_seq=seg_seq,
                  seg_start=seg_start.astype(np.int64),
                  seg_len=seg_len.astype(np.int64), seg_strand=seg_strand,
                  n_blocks=len(uniq))
