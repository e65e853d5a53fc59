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


def test_add_genome_to_branch(aligned_store):
    """halAddToBranch analog: a new ancestor splits the branch above c
    and the new genome attaches there; topology and accuracy hold."""
    sim, store = aligned_store
    rng = np.random.default_rng(2)
    codes = sim.genomes["c"].codes.copy()
    idx = rng.random(len(codes)) < 0.02
    codes[idx] = (codes[idx] + 1) % 4
    res = update.add_genome_to_branch(
        store, "cnew", {"cnew.c": Sequence("cnew.c", codes)},
        sibling_event="c", branch_length=0.02, min_chain_override=64)
    tree = res.tree
    anc = tree.find("anc_cnew")
    assert anc is not None and not anc.is_leaf()
    assert {ch.name for ch in anc.children} == {"c", "cnew"}
    assert anc.parent.name == "root"
    # split preserves total path length root->c
    c = tree.find("c")
    assert abs((c.length or 0) + (anc.length or 0) - 0.08) < 1e-9
    pairs = progressive.leaf_pairs(res, "c", "cnew")
    assert len(pairs) > 4000
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


def test_remove_root_child_collapses_root(aligned_store):
    """Removing a direct child of the root promotes the surviving
    subtree to be the whole alignment (halRemoveGenome semantics)."""
    _sim, store = aligned_store
    res = update.remove_genome(store, "c", min_chain_override=64)
    assert res.tree.name == "ab"
    assert set(res.tree.leaf_names()) == {"a", "b"}
    assert res.tree.length is None
    # further ops against the new root still work
    pairs = progressive.leaf_pairs(res, "a", "b")
    assert len(pairs) > 3000
    # refusing to shrink below two genomes
    import pytest as _pytest
    with _pytest.raises(ValueError):
        update.remove_genome(store, "a", min_chain_override=64)


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


def test_update_refreshes_archive(tmp_path):
    """cactus-tpu update --hal rewrites the durable archive after an
    add (halAppendSubtree/halReplaceGenome role)."""
    import os
    from cactus_tpu import cli
    from cactus_tpu.hal_archive import HalArchive
    from cactus_tpu.io.fasta import write_fasta, Sequence
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick
    tree = parse_newick("((a:0.03,b:0.03)ab:0.03,c:0.06)root;")
    sim = evolver.simulate(tree, root_len=4_000, seed=61)
    d = tmp_path
    from cactus_tpu.io.fasta import write_fasta as _wf
    pa, pb = str(d / "a.fa"), str(d / "b.fa")
    _wf(pa, {"a": Sequence("a", sim.genomes["a"].codes)})
    _wf(pb, {"b": Sequence("b", sim.genomes["b"].codes)})
    seqfile = str(d / "seqfile.txt")
    with open(seqfile, "w") as fh:
        fh.write("(a:0.03,b:0.03)root;\n")
        fh.write(f"a {pa}\nb {pb}\n")
    out = str(d / "aln")
    hal = str(d / "aln.hal")
    assert cli.main(["align", seqfile, out, "--hal", hal,
                     "--min-chain", "64"]) == 0
    arc0 = HalArchive.open(hal)
    assert set(arc0.genomes()) >= {"a", "b"}
    cfa = str(d / "c.fa")
    write_fasta(cfa, {"c": Sequence("c", sim.genomes["c"].codes)})
    assert cli.main(["update", "add", out, "c", "--fasta", cfa,
                     "--parent", "root", "--min-chain", "64",
                     "--hal", hal]) == 0
    arc = HalArchive.open(hal)
    assert "c" in arc.genomes()
    assert arc.validate() == []


def test_write_bigmaf(tmp_path):
    from cactus_tpu.io.maf import MafBlock, MafRow
    from cactus_tpu.maf_tools import write_bigmaf
    blocks = [MafBlock(rows=[
        MafRow("anc.c", 10, 5, "+", 100, "ACGTA"),
        MafRow("a.c", 0, 5, "+", 50, "ACGTA")])]
    p = str(tmp_path / "out.bigmaf.txt")
    assert write_bigmaf(p, blocks, "anc") == 1
    text = open(p).read()
    assert text.startswith("anc.c\t10\t15\t")
    assert "s anc.c 10 5 + 100 ACGTA;" in text
    import os
    assert os.path.exists(p + ".as")
    assert "mafBlock" in open(p + ".as").read()
