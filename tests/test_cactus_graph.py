"""Cactus chain decomposition (XOR-label 2-cut classes)."""

import numpy as np

from cactus_tpu.graph import cactus
from cactus_tpu.graph.columns import SeqTable, build_columns, columns_to_blocks
from cactus_tpu.io.paf import PafRecord


def mk_rec(qname, qlen, qs, qe, strand, tname, tlen, ts, te, cigar):
    r = PafRecord(qname, qlen, qs, qe, strand, tname, tlen, ts, te, 0, 0)
    r.cigar = cigar
    r.set_tag("tp", "A", "P")
    return r


def _blocks(table_lengths, recs):
    table = SeqTable.build(table_lengths)
    pc = build_columns(recs, table)
    return columns_to_blocks(pc)


def test_simple_chain_two_blocks():
    """Indel-split alignment → two blocks in ONE chain."""
    r = mk_rec("A.c", 100, 0, 80, "+", "B.c", 100, 0, 90,
               [("M", 40), ("D", 10), ("M", 40)])
    blocks = _blocks({"A.c": 100, "B.c": 100}, [r])
    assert blocks.n_blocks == 2
    cid, lens = cactus.cactus_chains(blocks, np.ones(2, bool))
    assert cid[0] == cid[1]
    assert lens[cid[0]] == 80


def test_parallel_threads_form_one_chain():
    """Three genomes running through the same two blocks = one chain
    (degree-3 blocks; the common case after transitive column merging)."""
    recs = [
        mk_rec("A.c", 100, 0, 80, "+", "B.c", 100, 0, 90,
               [("M", 40), ("D", 10), ("M", 40)]),
        mk_rec("A.c", 100, 0, 80, "+", "C.c", 100, 0, 85,
               [("M", 40), ("D", 5), ("M", 40)]),
    ]
    blocks = _blocks({"A.c": 100, "B.c": 100, "C.c": 100}, recs)
    assert blocks.n_blocks == 2
    cid, lens = cactus.cactus_chains(blocks, np.ones(2, bool))
    assert cid[0] == cid[1]
    assert lens[cid[0]] == 80
    assert cactus.melt(blocks, np.ones(2, bool), 64).all()


def test_nested_self_loop_is_singleton_chain():
    """A block whose both ends glue into one adjacency node (nested
    tangle) is its own chain and melts independently of its flanks."""
    recs = [
        mk_rec("A.c", 100, 0, 40, "+", "B.c", 100, 0, 40, [("M", 40)]),
        mk_rec("A.c", 100, 45, 55, "+", "C.c", 20, 5, 15, [("M", 10)]),
        mk_rec("A.c", 100, 60, 100, "+", "B.c", 100, 60, 100, [("M", 40)]),
    ]
    blocks = _blocks({"A.c": 100, "B.c": 100, "C.c": 20}, recs)
    assert blocks.n_blocks == 3
    cid, _lens = cactus.cactus_chains(blocks, np.ones(3, bool))
    lens_of = blocks.block_length()
    small = [b for b in range(3) if lens_of[b] == 10][0]
    big = [b for b in range(3) if lens_of[b] == 40]
    # the tiny nested block never joins the flanking blocks' chain
    assert cid[small] != cid[big[0]] and cid[small] != cid[big[1]]


def test_bridge_blocks_are_singleton_chains():
    """Blocks on different sequence pairs with no cycle = own chains."""
    recs = [
        mk_rec("A.c", 50, 0, 20, "+", "B.c", 50, 0, 20, [("M", 20)]),
        mk_rec("C.c", 50, 0, 30, "+", "D.c", 50, 0, 30, [("M", 30)]),
    ]
    blocks = _blocks({"A.c": 50, "B.c": 50, "C.c": 50, "D.c": 50}, recs)
    assert blocks.n_blocks == 2
    cid, lens = cactus.cactus_chains(blocks, np.ones(2, bool))
    assert cid[0] != cid[1]
    assert sorted(lens.tolist()) == [20, 30]


def test_staged_melting_rescues_merged_chain():
    """Why deannealing is staged (config deannealingRounds='2 32 256'):
    melting the tiny nested block at a low threshold first merges the
    flanking blocks into one chain long enough to survive the higher
    threshold; a single high-threshold melt would kill everything."""
    # A-B: 30bp, then a 5bp A-C block, then 30bp A-B again
    recs = [
        mk_rec("A.c", 100, 0, 30, "+", "B.c", 100, 0, 30, [("M", 30)]),
        mk_rec("A.c", 100, 40, 45, "+", "C.c", 10, 2, 7, [("M", 5)]),
        mk_rec("A.c", 100, 50, 80, "+", "B.c", 100, 50, 80, [("M", 30)]),
    ]
    blocks = _blocks({"A.c": 100, "B.c": 100, "C.c": 10}, recs)
    lens = blocks.block_length()
    # one-shot high threshold: all three are singleton chains -> all die
    alive = cactus.melt(blocks, np.ones(blocks.n_blocks, bool), 50)
    assert not alive.any()
    # staged: 10 kills only the 5bp block; flanks then chain (60bp) and
    # survive the 50 threshold
    alive = cactus.melt(blocks, np.ones(blocks.n_blocks, bool), 10)
    alive = cactus.melt(blocks, alive, 50)
    assert sorted(lens[alive].tolist()) == [30, 30]
