"""Segment-level pinch graph driver (stPinchGraphs-equivalent path).

This replaces the per-base CC construction in graph/columns.py on the
main pipeline: match runs are pinched incrementally into the native
segment graph (native/pinchgraph.cpp), so memory is O(segments) instead
of O(32 bytes x homologous base).  The incremental model also gives the
reference's ORDER-DEPENDENT per-pinch alignment-filter policies their
exact semantics (caf/impl/caf.c:238-284, filtering.c) — something a
batch CC pass cannot express.

Outputs the same `Blocks` structure the rest of the pipeline consumes.
"""

from __future__ import annotations

import ctypes
import warnings

import numpy as np

from ..native import build as native
from ..io.paf import PafRecord
from .columns import Blocks, SeqTable, paf_match_runs

# Filter-policy names -> native FilterMode codes (pinchgraph.cpp).
# "singleCopyEvent:<event>" and "hgvm:<event>" carry an event argument
# (codes 7 / 11).
FILTER_CODES = {
    "none": 0,
    "filterSecondariesByMultipleSequences": 1,
    "filterSecondariesByMultipleSpecies": 2,
    "filterByMultipleSpecies": 2,
    "singleCopyOutgroup": 3,
    "singleCopy": 4,
    "relaxedSingleCopyOutgroup": 5,
    "relaxedSingleCopy": 6,
    "singleCopyChr": 8,
    "singleCopyIngroup": 9,
    "relaxedSingleCopyIngroup": 10,
}

# Policies where the PRIMARY alignments are filtered; otherwise the
# policy applies to secondaries only (caf.c:238-284:
# filterSecondariesBy* set secondaryFilterFn, the rest set filterFn and
# default the secondary filter to the same function).
PRIMARY_FILTERED = {"singleCopyOutgroup", "singleCopy",
                    "relaxedSingleCopyOutgroup", "relaxedSingleCopy",
                    "singleCopyChr", "singleCopyIngroup",
                    "relaxedSingleCopyIngroup",
                    "singleCopyEvent:", "hgvm:"}
# Policies with score-sorted application (sortAlignments=true in
# caf.c:238-284; note singleCopyEvent: filters primaries UNSORTED).
SORTED_FILTERS = {"singleCopyOutgroup", "singleCopy",
                  "relaxedSingleCopyOutgroup", "relaxedSingleCopy",
                  "singleCopyChr", "singleCopyIngroup",
                  "relaxedSingleCopyIngroup", "hgvm:"}


def _split_filter(name: str) -> tuple[str, str | None]:
    """Split an argument-carrying policy name into (base, arg)."""
    for prefix in ("singleCopyEvent:", "hgvm:"):
        if name.startswith(prefix):
            arg = name[len(prefix):]
            if not arg:
                raise ValueError(
                    f"alignmentFilter {prefix!r} needs an event argument, "
                    f"e.g. {prefix}human")
            return prefix, arg
    return name, None


def filter_code(name: str) -> int:
    """Resolve an alignmentFilter policy name, loudly rejecting the
    (parsed-but-unimplemented) ones so config knobs can't silently
    no-op (reference list: caf/impl/caf.c:238-284)."""
    base, arg = _split_filter(name)
    if base == "singleCopyEvent:":
        return 7
    if base == "hgvm:":
        return 11
    if base in FILTER_CODES:
        return FILTER_CODES[base]
    raise NotImplementedError(
        f"alignmentFilter policy {name!r} is not implemented; "
        f"supported: {sorted(FILTER_CODES)} + singleCopyEvent:<ev>, "
        f"hgvm:<ev>")


def records_to_runs(records: list[PafRecord], table: SeqTable):
    """PAF records -> flat pinch-run arrays (no per-base expansion).

    Returns dict of arrays: t1, p1 (thread-local), t2, p2, ln,
    strand (+1/-1 int8), score (record AS per run), rec (record index).
    """
    t1l, p1l, t2l, p2l, lnl, stl, scl, recl = ([] for _ in range(8))
    for ri, rec in enumerate(records):
        ti_q = table.index[rec.qname]
        ti_t = table.index[rec.tname]
        sc = rec.score
        for q0, t0, ln, strand in paf_match_runs(rec):
            t1l.append(ti_q)
            p1l.append(q0)
            t2l.append(ti_t)
            p2l.append(t0)
            lnl.append(ln)
            stl.append(strand)
            scl.append(sc)
            recl.append(ri)
    return dict(
        t1=np.array(t1l, np.int32), p1=np.array(p1l, np.int64),
        t2=np.array(t2l, np.int32), p2=np.array(p2l, np.int64),
        ln=np.array(lnl, np.int64), strand=np.array(stl, np.int8),
        score=np.array(scl, np.int64), rec=np.array(recl, np.int64))


def global_runs_to_thread_runs(runs, table: SeqTable):
    """(ga, gb, ln, strand) global-coordinate runs -> thread-run arrays."""
    if len(runs) == 0:
        z = np.zeros(0, np.int64)
        return dict(t1=z.astype(np.int32), p1=z, t2=z.astype(np.int32),
                    p2=z, ln=z, strand=z.astype(np.int8))
    arr = np.asarray(runs, dtype=np.int64)
    ga, gb, ln, strand = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]
    s1, l1 = table.local(ga)
    s2, l2 = table.local(gb)
    return dict(t1=s1.astype(np.int32), p1=l1, t2=s2.astype(np.int32),
                p2=l2, ln=ln, strand=strand.astype(np.int8))


class NativePinchGraph:
    """Thin RAII wrapper over the native incremental pinch graph."""

    def __init__(self, table: SeqTable, events: list[str],
                 outgroup_events: set[str] | frozenset = frozenset()):
        lib = native.load()
        if lib is None:
            raise RuntimeError("native pinch graph requires g++ (build.py)")
        self.lib = lib
        self.table = table
        self.events = list(events)        # per-sequence event names
        ev_names = sorted(set(events))
        self.event_index = {e: i for i, e in enumerate(ev_names)}
        ev_ids = np.array([self.event_index[e] for e in events], np.int32)
        og = np.array([e in outgroup_events for e in ev_names], np.uint8)
        lengths = np.ascontiguousarray(table.lengths, np.int64)
        self._h = lib.pg_create(
            len(lengths), lengths.ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(ev_ids).ctypes.data_as(ctypes.c_void_p),
            len(og), np.ascontiguousarray(og).ctypes.data_as(ctypes.c_void_p))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self.lib.pg_destroy(h)
            self._h = None

    def _configure_filter(self, filter_name: str) -> None:
        """Install per-event filter state for the argument-carrying
        policies (singleCopyEvent:<ev> sets the target event id — absent
        event leaves filtering off, the stCaf_setSingleCopyEvent
        fallback; hgvm:<ev> initializes the thread-component union-find
        with the event's non-"_alt" sequences as special threads,
        filtering.c:259-290)."""
        base, arg = _split_filter(filter_name)
        if arg is None:
            return
        if base == "singleCopyEvent:":
            self.lib.pg_set_filter_event(
                self._h, self.event_index.get(arg, -1))
        elif base == "hgvm:" and not getattr(self, "_hgvm_ready", False):
            special = np.array(
                [ev == arg and not name.endswith("_alt")
                 for ev, name in zip(self.events, self.table.names)],
                np.uint8)
            self.lib.pg_setup_hgvm(
                self._h,
                np.ascontiguousarray(special).ctypes.data_as(
                    ctypes.c_void_p))
            self._hgvm_ready = True

    def pinch(self, runs: dict, filter_name: str = "none",
              trim: int = 0, order: np.ndarray | None = None) -> None:
        """Apply a batch of runs in the given order (default: as-is)."""
        n = len(runs["ln"])
        if n == 0:
            return
        self._configure_filter(filter_name)
        idx = order if order is not None else np.arange(n)
        args = []
        for key, dt in (("t1", np.int32), ("p1", np.int64),
                        ("t2", np.int32), ("p2", np.int64),
                        ("ln", np.int64), ("strand", np.int8)):
            args.append(np.ascontiguousarray(runs[key][idx], dt))
        self.lib.pg_pinch_batch(
            self._h, len(idx),
            *[a.ctypes.data_as(ctypes.c_void_p) for a in args],
            filter_code(filter_name), trim)

    @property
    def n_conflicts(self) -> int:
        """Pinches dropped as orientation-contradictory (see pinchgraph.cpp)."""
        return int(self.lib.pg_n_conflicts(self._h))

    def export(self, min_degree: int = 2) -> Blocks:
        """Extract the live blocks as a `Blocks` (+ trivial-boundary join)."""
        ns = self.lib.pg_n_segments(self._h)
        nb = self.lib.pg_n_blocks(self._h)
        seg_thread = np.empty(ns, np.int64)
        seg_start = np.empty(ns, np.int64)
        seg_len = np.empty(ns, np.int64)
        seg_block = np.empty(ns, np.int64)
        seg_ori = np.empty(ns, np.int8)
        support = np.empty(max(nb, 1), np.int64)
        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        self.lib.pg_export(self._h, ptr(seg_thread), ptr(seg_start),
                           ptr(seg_len), ptr(seg_block), ptr(seg_ori),
                           ptr(support))
        keep = seg_block >= 0
        seg_thread, seg_start = seg_thread[keep], seg_start[keep]
        seg_len, seg_block = seg_len[keep], seg_block[keep]
        seg_ori = seg_ori[keep]
        # deterministic order + densified block ids
        order = np.lexsort((seg_start, seg_thread))
        seg_thread, seg_start = seg_thread[order], seg_start[order]
        seg_len, seg_block, seg_ori = (seg_len[order], seg_block[order],
                                       seg_ori[order])
        uniq, seg_block = np.unique(seg_block, return_inverse=True)
        support = support[uniq] if nb else np.zeros(0, np.int64)
        blocks = Blocks(table=self.table, seg_block=seg_block,
                        seg_seq=seg_thread, seg_start=seg_start,
                        seg_len=seg_len, seg_strand=seg_ori.astype(np.int8),
                        n_blocks=len(uniq), support=support)
        blocks = join_trivial(blocks)
        if min_degree > 2:
            deg = blocks.block_degree()
            blocks = drop_blocks(blocks, deg[blocks.seg_block] >= min_degree)
        return blocks


def drop_blocks(blocks: Blocks, seg_keep: np.ndarray) -> Blocks:
    """Subset to the segments where seg_keep is True, re-densifying
    block ids (a whole block is kept or dropped together)."""
    seg_block = blocks.seg_block[seg_keep]
    uniq, seg_block = np.unique(seg_block, return_inverse=True)
    support = (blocks.support[uniq] if blocks.support is not None
               and len(blocks.support) else None)
    return Blocks(table=blocks.table, seg_block=seg_block,
                  seg_seq=blocks.seg_seq[seg_keep],
                  seg_start=blocks.seg_start[seg_keep],
                  seg_len=blocks.seg_len[seg_keep],
                  seg_strand=blocks.seg_strand[seg_keep],
                  n_blocks=len(uniq), support=support)


def join_trivial(blocks: Blocks) -> Blocks:
    """Merge blocks that abut in lockstep across every member
    (stCaf_joinTrivialBoundaries semantics), vectorized over segments.

    Block A merges rightward into B iff deg(A)==deg(B), A!=B, and every
    member of A is physically followed (ori +1) / preceded (ori -1) by a
    contiguous segment of the SAME orientation in B.  The relation is a
    bijection, so merged blocks form simple paths.
    """
    G = len(blocks.seg_block)
    if G == 0:
        return blocks
    # assume segments sorted by (seq, start) — the export guarantees it
    seq, start, ln = blocks.seg_seq, blocks.seg_start, blocks.seg_len
    blk, ori = blocks.seg_block, blocks.seg_strand
    deg = blocks.block_degree()

    # physically-next contiguous segment (within the arrays)
    nxt_phys = np.arange(1, G + 1)
    contig = np.zeros(G, dtype=bool)
    contig[:-1] = (seq[1:] == seq[:-1]) & (start[:-1] + ln[:-1] == start[1:])
    # block-forward neighbor index per segment (-1 = none)
    fwd = np.full(G, -1, np.int64)
    plus = ori == 1
    sel = plus & contig
    fwd[sel] = np.flatnonzero(sel) + 1
    prev_contig = np.zeros(G, dtype=bool)
    prev_contig[1:] = contig[:-1]
    sel = (~plus) & prev_contig
    fwd[sel] = np.flatnonzero(sel) - 1

    ok = fwd >= 0
    fwd_c = np.where(ok, fwd, 0)
    ok &= np.where(ok, ori[fwd_c] == ori, False)
    nxt_blk = np.where(ok, blk[fwd_c], -1)

    # per block: unique successor block of all members, or -1
    order = np.argsort(blk, kind="stable")
    gb, gn = blk[order], nxt_blk[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(gb)) + 1])
    gmin = np.minimum.reduceat(gn, starts)
    gmax = np.maximum.reduceat(gn, starts)
    first = gn[starts]
    succ = np.full(blocks.n_blocks, -1, np.int64)
    same = (gmin == gmax) & (first >= 0)
    succ[gb[starts]] = np.where(same, first, -1)
    ids = np.arange(blocks.n_blocks)
    okb = succ >= 0
    okb &= succ != ids
    okb &= np.where(okb, deg[np.maximum(succ, 0)] == deg, False)
    succ = np.where(okb, succ, -1)
    # injectivity is implied (each segment has one physical predecessor),
    # but two different blocks could claim the same successor when the
    # successor's members are covered by both?  Impossible: a bijection
    # from A onto B uses ALL of B's members' predecessor slots.

    if not (succ >= 0).any():
        return blocks
    # merge along succ paths (succ is functional AND injective, and every
    # cycle is broken by some member's missing physical follower, so the
    # merge graph is simple paths): path id via CC, then rebuild segments
    u = ids[succ >= 0]
    v = succ[succ >= 0]
    path = native.cc_edges(blocks.n_blocks, u, v)
    new_blk = path[blk]

    # segment i glues to segment i+1 iff the fwd-link connects them and
    # their blocks merge in that direction (this excludes two separate
    # visits of the same merged block sitting adjacently)
    merge_next = np.zeros(G, dtype=bool)
    i = np.arange(G - 1)
    fwd_to_next = (fwd[:-1] == i + 1) & (succ[blk[:-1]] == blk[1:])
    next_fwd_to_me = (fwd[1:] == i) & (succ[blk[1:]] == blk[:-1])
    merge_next[:-1] = ((fwd_to_next | next_fwd_to_me)
                       & (new_blk[1:] == new_blk[:-1]))

    brk = np.ones(G, dtype=bool)
    brk[1:] = ~merge_next[:-1]
    seg_first = np.flatnonzero(brk)
    seg_last = np.concatenate([seg_first[1:], [G]]) - 1
    n_start = start[seg_first]
    n_len = start[seg_last] + ln[seg_last] - n_start
    n_seq = seq[seg_first]
    n_ori = ori[seg_first]
    n_blk = new_blk[seg_first]
    uniq, n_blk = np.unique(n_blk, return_inverse=True)
    new_support = None
    if blocks.support is not None:
        per_path = np.zeros(blocks.n_blocks, np.int64)
        np.add.at(per_path, path, blocks.support)
        new_support = per_path[uniq]
    return Blocks(table=blocks.table, seg_block=n_blk, seg_seq=n_seq,
                  seg_start=n_start, seg_len=n_len,
                  seg_strand=n_ori, n_blocks=len(uniq),
                  support=new_support)


def pinch_blocks(table: SeqTable, events: list[str],
                 primary_runs: dict | None = None,
                 secondary_runs: dict | None = None,
                 outgroup_events: set[str] | frozenset = frozenset(),
                 alignment_filter: str = "none",
                 trim: int = 0,
                 min_degree: int = 2) -> Blocks:
    """One-shot annealing: primaries (optionally score-sorted + filtered),
    then secondaries with the secondary policy (caf.c anneal semantics).

    events: event name per sequence in `table` order.
    """
    primary_filter = "none"
    secondary_filter = "none"
    sort_primaries = False
    if alignment_filter != "none":
        base, _ = _split_filter(alignment_filter)
        if base in PRIMARY_FILTERED:
            primary_filter = alignment_filter
            secondary_filter = alignment_filter
            sort_primaries = base in SORTED_FILTERS
        else:
            secondary_filter = alignment_filter
        filter_code(secondary_filter)  # validate loudly

    g = NativePinchGraph(table, events, outgroup_events)
    if primary_runs is not None and len(primary_runs["ln"]):
        order = None
        if sort_primaries and "score" in primary_runs:
            order = np.argsort(-primary_runs["score"], kind="stable")
        g.pinch(primary_runs, primary_filter, trim=trim, order=order)
    if secondary_runs is not None and len(secondary_runs["ln"]):
        order = None
        if sort_primaries and "score" in secondary_runs:
            order = np.argsort(-secondary_runs["score"], kind="stable")
        g.pinch(secondary_runs, secondary_filter, trim=trim, order=order)
    return g.export(min_degree=min_degree)
