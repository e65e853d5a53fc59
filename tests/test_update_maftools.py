"""Update flows (add/replace/remove) + MAF tooling."""

import numpy as np
import pytest

from cactus_tpu import progressive, update
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.io.maf import MafBlock, MafRow
from cactus_tpu.maf_tools import (coverage_stats, dup_filter,
                                  merge_adjacent_blocks)
from cactus_tpu.store import AlignmentStore
from cactus_tpu.testutil import evolver
from cactus_tpu.testutil.comparator import score_pairs
from cactus_tpu.utils.trees import parse_newick


@pytest.fixture()
def aligned_store(tmp_path):
    tree = parse_newick("((a:0.04,b:0.04)ab:0.04,c:0.08)root;")
    sim = evolver.simulate(tree, root_len=5_000, seed=61)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ["a", "b", "c"]}
    store = AlignmentStore(str(tmp_path / "store"))
    progressive.ProgressiveAligner(tree, genomes, min_chain_override=64,
                                   store=store).run()
    return sim, store


def test_add_genome(aligned_store):
    sim, store = aligned_store
    # evolve a sibling of c from c's genome (a new leaf under root)
    rng = np.random.default_rng(0)
    codes = sim.genomes["c"].codes.copy()
    idx = rng.random(len(codes)) < 0.02
    codes[idx] = (codes[idx] + 1) % 4
    res = update.add_genome(store, "cnew",
                            {"cnew.c": Sequence("cnew.c", codes)},
                            parent_event="root", branch_length=0.02,
                            min_chain_override=64)
    assert "cnew" in res.tree.leaf_names()
    pairs = progressive.leaf_pairs(res, "c", "cnew")
    assert len(pairs) > 4000
    # old siblings still aligned (their step was resumed, not recomputed)
    s = score_pairs({(p, q, s_) for p, q, s_ in sim.truth_pairs("a", "b")},
                    progressive.leaf_pairs(res, "a", "b"))
    assert s.recall > 0.9


def test_replace_genome(aligned_store):
    sim, store = aligned_store
    rng = np.random.default_rng(1)
    codes = sim.genomes["b"].codes.copy()
    idx = rng.random(len(codes)) < 0.01
    codes[idx] = (codes[idx] + 1) % 4
    res = update.replace_genome(store, "b",
                                {"b.c": Sequence("b.c", codes)},
                                min_chain_override=64)
    pairs = progressive.leaf_pairs(res, "a", "b")
    assert len(pairs) > 4000


def test_remove_genome(aligned_store):
    _sim, store = aligned_store
    res = update.remove_genome(store, "b", min_chain_override=64)
    assert "b" not in res.tree.leaf_names()
    # degree-2 ab collapsed into a
    assert res.tree.find("ab") is None
    assert set(res.tree.leaf_names()) == {"a", "c"}
    assert progressive.leaf_pairs(res, "a", "c")


def _mk_block(rows):
    return MafBlock(rows=[MafRow(*r) for r in rows])


def test_dup_filter_single():
    b = _mk_block([
        ("ref.c", 0, 4, "+", 10, "ACGT"),
        ("x.c", 0, 4, "+", 10, "ACGT"),
        ("x.d", 2, 4, "+", 10, "AGGT"),
    ])
    out = dup_filter([b], mode="single")
    srcs = [r.src for r in out[0].rows]
    assert srcs == ["ref.c", "x.c"]  # the consensus-closest x row wins
    out2 = dup_filter([b], mode="consensus")
    assert len(out2[0].rows) == 2
    x = [r for r in out2[0].rows if r.src.startswith("x")][0]
    assert x.text == "ACGT"  # column-majority of the two x rows


def test_merge_adjacent_blocks():
    b1 = _mk_block([("a.c", 0, 4, "+", 20, "ACGT"),
                    ("b.c", 5, 4, "+", 20, "ACGA")])
    b2 = _mk_block([("a.c", 4, 3, "+", 20, "TTT"),
                    ("b.c", 9, 3, "+", 20, "TTC")])
    b3 = _mk_block([("a.c", 10, 2, "+", 20, "GG"),
                    ("b.c", 15, 2, "+", 20, "GG")])  # gap: not mergeable
    out = merge_adjacent_blocks([b1, b2, b3])
    assert len(out) == 2
    assert out[0].rows[0].text == "ACGTTTT"
    assert out[0].rows[0].size == 7
    assert out[0].rows[1].start == 5 and out[0].rows[1].size == 7


def test_coverage_stats():
    b = _mk_block([("ref.c", 0, 4, "+", 10, "ACGT"),
                   ("x.c", 0, 4, "+", 10, "ACGT"),
                   ("x.d", 0, 4, "+", 10, "ACGT")])
    cov = coverage_stats([b], "ref")
    assert cov["x"][2] == 4  # every ref site covered twice by genome x
