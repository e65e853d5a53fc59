import numpy as np

from cactus_tpu.testutil import evolver
from cactus_tpu.testutil.comparator import (maf_pairs, score_pairs,
                                            score_maf_vs_sim)
from cactus_tpu.io.maf import MafBlock, MafRow
from cactus_tpu.utils.trees import parse_newick


def test_simulate_identity():
    tree = parse_newick("(a:0.0,b:0.0)root;")
    sim = evolver.simulate(tree, root_len=1000, seed=1, indel_rate=0.0)
    a, b = sim.genomes["a"], sim.genomes["b"]
    assert np.array_equal(a.codes, b.codes)
    pairs = sim.truth_pairs("a", "b")
    assert len(pairs) == 1000
    assert (0, 0, 1) in pairs


def test_simulate_divergence():
    tree = parse_newick("(a:0.1,b:0.1)root;")
    sim = evolver.simulate(tree, root_len=5000, seed=2)
    a, b = sim.genomes["a"], sim.genomes["b"]
    # lengths should differ somewhat due to indels but stay in the ballpark
    assert abs(len(a.codes) - 5000) < 500
    pairs = sim.truth_pairs("a", "b")
    assert len(pairs) > 4000
    # identity measured over truly homologous pairs: ~(1-p_sub)^2 + noise
    same = sum(1 for p, q, _ in pairs if a.codes[p] == b.codes[q])
    frac_same = same / len(pairs)
    assert 0.7 < frac_same < 0.95


def test_truth_pairs_with_inversion():
    tree = parse_newick("(a:0.0,b:0.05)root;")
    sim = evolver.simulate(tree, root_len=2000, seed=3, indel_rate=0.0,
                           inversion_rate=0.05)
    pairs = sim.truth_pairs("a", "b")
    strands = {s for _, _, s in pairs}
    assert len(pairs) == 2000  # inversions preserve homology
    # seed 3 at this rate should produce at least one inversion
    assert strands == {1, -1} or strands == {1}


def test_comparator_perfect():
    tree = parse_newick("(a:0.0,b:0.0)root;")
    sim = evolver.simulate(tree, root_len=50, seed=4, indel_rate=0.0)
    text_a = sim.genomes["a"].to_sequence().to_string()
    text_b = sim.genomes["b"].to_sequence().to_string()
    block = MafBlock(rows=[
        MafRow("a.a_chr0", 0, 50, "+", 50, text_a),
        MafRow("b.b_chr0", 0, 50, "+", 50, text_b)])
    per_pair, overall = score_maf_vs_sim([block], sim)
    assert overall.recall == 1.0 and overall.precision == 1.0


def test_comparator_partial():
    truth = {(i, i, 1) for i in range(100)}
    pred = {(i, i, 1) for i in range(50)} | {(i, i + 1, 1) for i in range(50, 60)}
    s = score_pairs(truth, pred)
    assert s.recall == 0.5
    assert abs(s.precision - 50 / 60) < 1e-9


def test_maf_pairs_reverse_strand():
    # b row on '-' strand: text positions count down from src_size-start-1
    block = MafBlock(rows=[
        MafRow("a.c", 0, 4, "+", 10, "ACGT"),
        MafRow("b.c", 2, 4, "-", 10, "ACGT")])
    pairs = maf_pairs([block], "a", "b")
    assert (0, 7, -1) in pairs and (3, 4, -1) in pairs
