import numpy as np

from cactus_tpu.config import CafParams
from cactus_tpu.graph.columns import (SeqTable, build_columns,
                                      columns_to_blocks)
from cactus_tpu.graph import chains as chain_graph
from cactus_tpu.io.paf import PafRecord
from cactus_tpu.phases.caf import run_caf, blocks_to_match_edges


def mk_rec(qname, qlen, qs, qe, strand, tname, tlen, ts, te, cigar):
    r = PafRecord(qname, qlen, qs, qe, strand, tname, tlen, ts, te, 0, 0)
    r.cigar = cigar
    r.set_tag("tp", "A", "P")
    return r


def test_single_block():
    table = SeqTable.build({"A.c": 10, "B.c": 10})
    rec = mk_rec("A.c", 10, 0, 10, "+", "B.c", 10, 0, 10, [("M", 10)])
    pc = build_columns([rec], table)
    blocks = columns_to_blocks(pc)
    assert blocks.n_blocks == 1
    segs = blocks.segments_of(0)
    assert len(segs) == 2
    assert all(ln == 10 for _s, _st, ln, _str in segs)
    assert all(st == 1 for *_x, st in segs)


def test_block_split_at_indel():
    # A[0:5] ~ B[0:5], A[5:10] ~ B[8:13]  (B has 3 inserted bases)
    table = SeqTable.build({"A.c": 10, "B.c": 13})
    rec = mk_rec("A.c", 10, 0, 10, "+", "B.c", 13, 0, 13,
                 [("M", 5), ("D", 3), ("M", 5)])
    pc = build_columns([rec], table)
    blocks = columns_to_blocks(pc)
    assert blocks.n_blocks == 2
    lens = sorted(blocks.block_length().tolist())
    assert lens == [5, 5]


def test_reverse_strand_block():
    from cactus_tpu.io.fasta import revcomp
    table = SeqTable.build({"A.c": 8, "B.c": 8})
    rec = mk_rec("B.c", 8, 0, 8, "-", "A.c", 8, 0, 8, [("M", 8)])
    pc = build_columns([rec], table)
    blocks = columns_to_blocks(pc)
    assert blocks.n_blocks == 1
    segs = blocks.segments_of(0)
    strands = sorted(st for *_x, st in segs)
    assert strands == [-1, 1]
    assert all(ln == 8 for _s, _st, ln, _str in segs)


def test_duplicate_alignment_degree3():
    # A aligns to both B and C at same region -> one block of degree 3
    table = SeqTable.build({"A.c": 6, "B.c": 6, "C.c": 6})
    r1 = mk_rec("A.c", 6, 0, 6, "+", "B.c", 6, 0, 6, [("M", 6)])
    r2 = mk_rec("A.c", 6, 0, 6, "+", "C.c", 6, 0, 6, [("M", 6)])
    pc = build_columns([r1, r2], table)
    blocks = columns_to_blocks(pc)
    assert blocks.n_blocks == 1
    assert blocks.block_degree()[0] == 3


def test_melt_short_chain():
    # two sequences: long block, tiny block, long block, with gaps so the
    # tiny one forms its own chain (inconsistent adjacency via third seq)
    table = SeqTable.build({"A.c": 300, "B.c": 300, "C.c": 40})
    recs = [
        mk_rec("A.c", 300, 0, 100, "+", "B.c", 300, 0, 100, [("M", 100)]),
        # tiny middle block between A and C only (breaks exclusive links)
        mk_rec("A.c", 300, 120, 130, "+", "C.c", 40, 10, 20, [("M", 10)]),
        mk_rec("A.c", 300, 200, 300, "+", "B.c", 300, 200, 300, [("M", 100)]),
    ]
    pc = build_columns(recs, table)
    blocks = columns_to_blocks(pc)
    assert blocks.n_blocks == 3
    alive = chain_graph.melt(blocks, np.ones(3, dtype=bool),
                             min_chain_length=32)
    lens = blocks.block_length()
    # the 10bp A-C block must melt; the two 100bp A-B blocks survive
    assert sorted(lens[alive].tolist()) == [100, 100]


def test_adjacency_groups_gaps():
    table = SeqTable.build({"A.c": 100, "B.c": 100})
    recs = [
        mk_rec("A.c", 100, 0, 30, "+", "B.c", 100, 0, 30, [("M", 30)]),
        mk_rec("A.c", 100, 60, 100, "+", "B.c", 100, 70, 100,
               [("M", 30), ("I", 10)]),
    ]
    pc = build_columns(recs, table)
    blocks = columns_to_blocks(pc)
    alive = np.ones(blocks.n_blocks, dtype=bool)
    adj, groups = chain_graph.adjacency_groups(blocks, alive)
    # find the group holding the middle gaps (A 30..60, B 30..70)
    mid = None
    for g in groups:
        spans = {(int(adj.seq[i]), int(adj.gap_start[i]), int(adj.gap_end[i]))
                 for i in g.adj_idx}
        if (0, 30, 60) in spans:
            mid = spans
    assert mid is not None
    assert (1, 30, 70) in mid


def test_run_caf_end_to_end():
    from cactus_tpu.phases import blast
    from cactus_tpu.config import BlastParams
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick

    tree = parse_newick("(a:0.03,b:0.03)root;")
    sim = evolver.simulate(tree, root_len=8000, seed=11)
    ga, gb = sim.genomes["a"], sim.genomes["b"]
    recs = blast.align_contig_pair(Sequence("c", ga.codes),
                                   Sequence("c", gb.codes),
                                   "a.c", "b.c", BlastParams())
    caf = run_caf(recs, {"a.c": len(ga.codes), "b.c": len(gb.codes)},
                  CafParams(), preset="one", min_chain_override=64)
    assert caf.blocks.n_blocks > 0
    assert caf.alive.any()
    # recovered homology pairs from blocks
    pred = set()
    for ga_, gb_, ln, s in blocks_to_match_edges(caf.blocks, caf.alive):
        sa, pa = caf.table.local(np.array([ga_]))
        sb, pb = caf.table.local(np.array([gb_]))
        for k in range(ln):
            qp = int(pa[0]) + k
            tp = int(pb[0]) + (k if s == 1 else ln - 1 - k)
            if sa[0] == 0:
                pred.add((qp, tp))
            else:
                pred.add((tp, qp))
    truth = {(p, q) for p, q, _ in sim.truth_pairs("a", "b")}
    inter = len(truth & pred)
    assert inter / len(truth) > 0.85
    assert inter / len(pred) > 0.95
