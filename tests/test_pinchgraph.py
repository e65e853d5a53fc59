"""Native segment-level pinch graph vs the per-base CC oracle.

The native graph (graph/pinch.py + native/pinchgraph.cpp) is the scale
path: O(segments) memory.  On conflict-free inputs it must produce
EXACTLY the per-base connected-component homology columns of
graph/columns.py; on orientation-contradictory inputs it follows stPinch
semantics (same-block pinches no-op; reverse self-pinch centers drop)
and reports the count via n_conflicts.
"""

import numpy as np
import pytest

from cactus_tpu.graph.columns import (SeqTable, build_columns,
                                      columns_to_blocks)
from cactus_tpu.graph.pinch import (NativePinchGraph,
                                    global_runs_to_thread_runs,
                                    pinch_blocks, join_trivial)


def canon(blocks):
    """Orientation-canonicalized set of homology columns."""
    out = {}
    tbl = blocks.table
    for i in range(len(blocks.seg_block)):
        b = int(blocks.seg_block[i])
        g0 = int(tbl.offsets[blocks.seg_seq[i]] + blocks.seg_start[i])
        L = int(blocks.seg_len[i])
        s = int(blocks.seg_strand[i])
        for k in range(L):
            col = k if s == 1 else L - 1 - k
            out.setdefault((b, col), set()).add((g0 + k, s))
    cols = set()
    for members in out.values():
        m1 = frozenset(members)
        m2 = frozenset((p, -s) for p, s in members)
        cols.add(m1 if sorted(m1) <= sorted(m2) else m2)
    return cols


def fuzz_runs(n_seq, L, n_runs, seed):
    rng = np.random.default_rng(seed)
    table = SeqTable.build({f"s{i}": L for i in range(n_seq)})
    runs = []
    for _ in range(n_runs):
        a, b = rng.integers(0, n_seq, 2)
        ln = int(rng.integers(1, 12))
        pa = int(rng.integers(0, L - ln + 1))
        pb = int(rng.integers(0, L - ln + 1))
        strand = int(rng.choice([1, -1]))
        if a == b and pa == pb and strand == 1:
            continue
        runs.append((int(table.offsets[a]) + pa, int(table.offsets[b]) + pb,
                     ln, strand))
    return table, runs


def test_fuzz_matches_per_base_oracle():
    fails = checked = 0
    for seed in range(300):
        table, runs = fuzz_runs(3, 60, 8, seed)
        if not runs:
            continue
        g = NativePinchGraph(table, list(table.names))
        g.pinch(global_runs_to_thread_runs(runs, table))
        if g.n_conflicts:
            continue  # stPinch semantics intentionally diverge from CC
        checked += 1
        got = g.export()
        oracle = columns_to_blocks(build_columns([], table, runs=runs),
                                   min_degree=2)
        if canon(oracle) != canon(got):
            fails += 1
    assert checked > 200
    assert fails == 0


def test_forward_tandem_overlap_periodizes():
    # a[0:100] ~ a[50:150]: period-50 columns {i, i+50, i+100}
    table = SeqTable.build({"a": 150})
    blocks = pinch_blocks(table, ["a"], primary_runs=global_runs_to_thread_runs(
        [(0, 50, 100, 1)], table))
    cols = canon(blocks)
    assert (frozenset({(0, 1), (50, 1), (100, 1)}) in cols
            or frozenset({(0, -1), (50, -1), (100, -1)}) in cols)
    assert len(cols) == 50


def test_palindrome_center_dropped():
    # a[0:11] reverse onto itself: center base 5 pairs with itself -> drop
    table = SeqTable.build({"a": 11})
    g = NativePinchGraph(table, ["a"])
    g.pinch(global_runs_to_thread_runs([(0, 0, 11, -1)], table))
    assert g.n_conflicts >= 1
    blocks = g.export()
    cols = canon(blocks)
    # 5 palindromic columns {i, 10-i}, center unaligned
    assert len(cols) == 5
    members = {frozenset(p for p, _s in c) for c in cols}
    assert frozenset({0, 10}) in members
    assert all(5 not in m for m in members)


def test_contradictory_orientation_dropped():
    table = SeqTable.build({"a": 10, "b": 10})
    runs = [(0, 10, 4, 1),   # a[0:4] ~ b[0:4] forward
            (0, 10, 4, -1)]  # same intervals reversed: contradiction
    g = NativePinchGraph(table, ["a", "b"])
    g.pinch(global_runs_to_thread_runs(runs, table))
    assert g.n_conflicts >= 1
    blocks = g.export()
    # first-seen orientation kept
    assert blocks.n_blocks == 1
    assert (blocks.seg_len == 4).all()


def test_trivial_boundaries_joined():
    # two abutting pinches must export as ONE maximal block
    table = SeqTable.build({"a": 20, "b": 20})
    runs = [(0, 20, 5, 1), (5, 25, 5, 1)]
    blocks = pinch_blocks(table, ["a", "b"],
                          primary_runs=global_runs_to_thread_runs(runs, table))
    assert blocks.n_blocks == 1
    assert (blocks.seg_len == 10).all()
    # reversed abutment joins too (b side descends)
    runs = [(10, 35, 5, -1), (15, 30, 5, -1)]
    blocks = pinch_blocks(table, ["a", "b"],
                          primary_runs=global_runs_to_thread_runs(runs, table))
    assert blocks.n_blocks == 1
    assert (blocks.seg_len == 10).all()


def test_filter_secondaries_by_multiple_sequences():
    # default CAF policy: a secondary pinch is rejected iff BOTH pieces
    # are already aligned (filtering.c:133)
    table = SeqTable.build({"a": 30, "b": 30, "c": 30})
    primary = global_runs_to_thread_runs([(0, 30, 10, 1)], table)   # a~b
    # secondary 1: a~c (c unaligned -> accepted)
    # secondary 2: a[0:10]~b[40:50 local 10:20]: both in blocks? b[10:20]
    #   is unaligned -> accepted; then a[0:10]~b[10:20] both aligned now
    sec = global_runs_to_thread_runs(
        [(0, 60, 10, 1), (0, 40, 10, 1), (10, 70, 10, 1)], table)
    blocks = pinch_blocks(
        table, ["a", "b", "c"], primary_runs=primary, secondary_runs=sec,
        alignment_filter="filterSecondariesByMultipleSequences")
    cols = canon(blocks)
    members = {frozenset(p for p, _s in c) for c in cols}
    # third secondary a[10:20]~c[10:20]: a side aligned? a[10:20] was not
    # aligned before -> accepted
    assert frozenset({0, 30, 60, 40}) in members   # all four joined
    assert frozenset({10, 70}) in members


def test_single_copy_outgroup_filter():
    # og~og homology rejected once both sides carry outgroup evidence
    table = SeqTable.build({"A.s": 30, "B.s": 30, "OG.s": 30})
    runs = global_runs_to_thread_runs(
        [(0, 30, 10, 1),    # A~B accepted
         (0, 60, 10, 1),    # A~OG: only one side has outgroup -> accepted
         (10, 70, 10, 1),   # A[10:20]~OG[10:20]: accepted (A side no og yet)
         (70, 40, 10, 1),   # OG[10:20]~B[10:20]: OG-block has og, B bare
         ], table)
    blocks = pinch_blocks(table, ["A", "B", "OG"],
                          outgroup_events={"OG"},
                          primary_runs=runs,
                          alignment_filter="singleCopyOutgroup")
    cols = canon(blocks)
    members = {frozenset(p for p, _s in c) for c in cols}
    assert frozenset({0, 30, 60}) in members


def test_unknown_filter_raises():
    table = SeqTable.build({"a": 10})
    with pytest.raises(NotImplementedError):
        pinch_blocks(table, ["a"], alignment_filter="bogusPolicy")
    with pytest.raises(ValueError):
        pinch_blocks(table, ["a"], alignment_filter="hgvm:")


def test_single_copy_chr_filter():
    # singleCopyChr (filtering.c:214): reject a pinch whose two sides
    # share a SEQUENCE (thread) — per-chromosome single-copy.
    table = SeqTable.build({"a": 40, "b": 40, "c": 40})
    runs = global_runs_to_thread_runs(
        [(0, 10, 10, 1),     # a[0:10]~a[10:20] self-dup -> rejected
         (20, 60, 10, 1),    # a[20:30]~b[20:30] -> accepted
         (60, 100, 10, 1),   # b block ~ c -> sides {a,b},{c} -> accepted
         (30, 100, 10, 1)],  # a[30:40]~c[20:30]: c side block={a,b,c}
                             #   shares thread a -> rejected
        table)
    blocks = pinch_blocks(table, ["A", "B", "C"], primary_runs=runs,
                          alignment_filter="singleCopyChr")
    cols = canon(blocks)
    members = {frozenset(p for p, _s in c) for c in cols}
    assert frozenset({20, 60, 100}) in members
    assert not any({0, 10} <= m for m in members)
    assert not any({30, 100} <= m for m in members)


def test_single_copy_ingroup_filter():
    # singleCopyIngroup (filtering.c:239): intersection over INGROUP
    # events only — outgroup duplications are allowed.
    table = SeqTable.build({"A.1": 30, "A.2": 30, "OG.1": 30, "OG.2": 30})
    runs = global_runs_to_thread_runs(
        [(0, 30, 10, 1),    # A.1~A.2: ingroup event A on both -> rejected
         (60, 90, 10, 1),   # OG.1~OG.2: ingroup sets empty -> accepted
         (10, 70, 10, 1)],  # A.1~OG.1 -> accepted
        table)
    blocks = pinch_blocks(table, ["A", "A", "OG", "OG"],
                          outgroup_events={"OG"}, primary_runs=runs,
                          alignment_filter="singleCopyIngroup")
    members = {frozenset(p for p, _s in c) for c in canon(blocks)}
    assert frozenset({60, 90}) in members      # og dup kept
    assert frozenset({10, 70}) in members
    assert not any({0, 30} <= m for m in members)


def test_relaxed_single_copy_ingroup_filter():
    # relaxed variant (filtering.c:244): only rejects when BOTH sides
    # are already aligned.
    table = SeqTable.build({"A.1": 30, "A.2": 30, "A.3": 30})
    runs = global_runs_to_thread_runs(
        [(0, 30, 10, 1),    # both unaligned -> accepted despite event dup
         (10, 70, 10, 1),   # A.1[10:20]~A.3[10:20] one side fresh -> ok
         (0, 70, 10, 1)],   # block{A.1,A.2} ~ block{A.1,A.3}: both
                            #   aligned, share event A -> rejected
        table)
    blocks = pinch_blocks(table, ["A", "A", "A"], primary_runs=runs,
                          alignment_filter="relaxedSingleCopyIngroup")
    members = {frozenset(p for p, _s in c) for c in canon(blocks)}
    assert frozenset({0, 30}) in members
    assert frozenset({10, 70}) in members
    assert not any({0, 30, 70} <= m for m in members)


def test_single_copy_event_filter():
    # singleCopyEvent:A (filtering.c:181): reject iff BOTH sides already
    # carry event A; unknown event name leaves filtering off.
    table = SeqTable.build({"A.1": 30, "A.2": 30, "B.1": 30, "C.1": 30})
    runs = [(0, 60, 10, 1),    # A.1~B.1 -> accepted (B side has no A)
            (30, 90, 10, 1),   # A.2~C.1 -> accepted
            (60, 90, 10, 1)]   # block{A.1,B.1}~block{A.2,C.1}: both
                               #   sides contain A -> rejected
    blocks = pinch_blocks(table, ["A", "A", "B", "C"],
                          primary_runs=global_runs_to_thread_runs(runs, table),
                          alignment_filter="singleCopyEvent:A")
    members = {frozenset(p for p, _s in c) for c in canon(blocks)}
    assert frozenset({0, 60}) in members
    assert frozenset({30, 90}) in members
    assert not any({0, 90} <= m for m in members)
    # absent event: stCaf_setSingleCopyEvent fallback -> no filtering
    blocks = pinch_blocks(table, ["A", "A", "B", "C"],
                          primary_runs=global_runs_to_thread_runs(runs, table),
                          alignment_filter="singleCopyEvent:ZZZ")
    members = {frozenset(p for p, _s in c) for c in canon(blocks)}
    assert any({0, 60, 90} <= m for m in members)


def test_hgvm_filter():
    # hgvm:REF (filtering.c:255-359): the REF event's non-"_alt"
    # sequences must stay in separate, cycle-free components.
    table = SeqTable.build({"REF.chr1": 40, "REF.chr2": 40, "S.x": 40})
    events = ["REF", "REF", "S"]
    runs = global_runs_to_thread_runs(
        [(0, 40, 10, 1),     # chr1~chr2: bridges two specials -> rejected
         (10, 90, 10, 1),    # chr1~S.x: accepted (component now special)
         (90, 50, 10, 1),    # S.x~chr2: component(S.x) is special and
                             #   != component(chr2) -> rejected
         (20, 100, 10, 1)],  # chr1[20:30]~S.x[20:30]: same component,
                             #   sides are unaligned segs (S.x side not
                             #   special) -> accepted
        table)
    blocks = pinch_blocks(table, events, primary_runs=runs,
                          alignment_filter="hgvm:REF")
    members = {frozenset(p for p, _s in c) for c in canon(blocks)}
    assert frozenset({10, 90}) in members
    assert frozenset({20, 100}) in members
    assert not any({0, 40} <= m for m in members)
    assert not any({90, 50} <= m for m in members)


def test_hgvm_cycle_rejected():
    # A pinch whose two sides both already contain special threads of
    # the SAME component is a cycle -> rejected.
    table = SeqTable.build({"REF.chr1": 40, "S.x": 40})
    runs = global_runs_to_thread_runs(
        [(0, 40, 10, 1),     # chr1[0:10]~S.x[0:10] -> accepted
         (0, 20, 10, 1)],    # block{chr1,S.x} ~ chr1[20:30]: both sides
                             #   contain special chr1, same component
                             #   -> cycle, rejected
        table)
    blocks = pinch_blocks(table, ["REF", "S"], primary_runs=runs,
                          alignment_filter="hgvm:REF")
    members = {frozenset(p for p, _s in c) for c in canon(blocks)}
    assert frozenset({0, 40}) in members
    assert not any({0, 20} <= m or {40, 20} <= m for m in members)
    # alt contigs of the REF event are NOT special
    table2 = SeqTable.build({"REF.chr1": 40, "REF.chr1_alt": 40})
    runs2 = global_runs_to_thread_runs([(0, 40, 10, 1)], table2)
    blocks2 = pinch_blocks(table2, ["REF", "REF"], primary_runs=runs2,
                           alignment_filter="hgvm:REF")
    members2 = {frozenset(p for p, _s in c) for c in canon(blocks2)}
    assert frozenset({0, 40}) in members2


def test_segment_memory_scales_with_runs_not_bases():
    # 2 x 1 Mb threads, one 0.5 Mb pinch: a handful of segments
    table = SeqTable.build({"a": 1_000_000, "b": 1_000_000})
    g = NativePinchGraph(table, ["a", "b"])
    g.pinch(global_runs_to_thread_runs([(250_000, 1_300_000, 500_000, 1)],
                                       table))
    assert g.lib.pg_n_segments(g._h) <= 8
    blocks = g.export()
    assert blocks.n_blocks == 1
    assert blocks.seg_len[0] == 500_000
