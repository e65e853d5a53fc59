"""Flower hierarchy view: decomposition + recursive checks."""

import numpy as np
import pytest

from cactus_tpu.config import Config
from cactus_tpu.graph.flowers import (flower_check_recursive,
                                      flower_decomposition)
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.phases.caf import run_caf
from cactus_tpu.phases import blast
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


@pytest.fixture(scope="module")
def caf_result():
    tree = parse_newick("(a:0.03,b:0.03)r;")
    sim = evolver.simulate(tree, root_len=12_000, seed=19)
    qa = Sequence("a.c", sim.genomes["a"].codes)
    tb = Sequence("b.c", sim.genomes["b"].codes)
    cfg = Config.default()
    recs = blast.align_contig_pair(qa, tb, "a.c", "b.c", cfg.blast)
    from cactus_tpu.phases.blast import mark_primaries
    recs = mark_primaries(recs)
    return run_caf(recs, {"a.c": len(qa), "b.c": len(tb)}, cfg.caf,
                   ingroup_events={"a", "b"}, min_chain_override=64)


def test_flower_decomposition_covers_blocks(caf_result):
    root = flower_decomposition(caf_result)
    n_live = int(caf_result.alive.sum())
    assert root.total_blocks() == n_live
    assert root.chains, "no chains at the root flower"
    # ordered chains: each chain's blocks are distinct
    for fl in root.recursive_flowers():
        for ch in fl.chains:
            assert len(set(ch.blocks)) == len(ch.blocks)
            assert ch.outer_ends[0] != ch.outer_ends[1]


def test_flower_check_recursive_clean(caf_result):
    root = flower_decomposition(caf_result)
    assert flower_check_recursive(root, caf_result) == []


def test_flower_check_catches_corruption(caf_result):
    root = flower_decomposition(caf_result)
    # corrupt: duplicate a block into another chain
    donors = [c for f in root.recursive_flowers() for c in f.chains]
    if len(donors) >= 2:
        donors[1].blocks.append(donors[0].blocks[0])
        errs = flower_check_recursive(root, caf_result)
        assert any("two chains" in e for e in errs)


def test_multi_block_chains_are_ordered(caf_result):
    root = flower_decomposition(caf_result)
    multi = [c for f in root.recursive_flowers() for c in f.chains
             if len(c.blocks) > 1]
    assert multi, "expected at least one multi-block chain"
    for ch in multi:
        assert len(ch.links) == len(ch.blocks) - 1 or ch.is_cycle
