"""Evolver-scale accuracy gate (the evolverMammals regression analog).

The reference pins mafComparator accuracy on the 5-genome ~600 kb
evolverMammals fixture at 0.894622 with tolerance (0.05, 0.13)
(test/evolverTest.py:1208-1269, test/evolverMammals-default.comp.xml:4)
plus halStats structural bounds (:1133-1143).  The real fixture data is
remote; this gate simulates genomes of the same scale on the SAME tree
(examples/evolverMammals.txt branch lengths) and enforces the same
bar: average pairwise accuracy ≥ 0.89.

Slow (tens of minutes on one chip; CPU-only runs are not meaningful):

    RUN_SLOW=1 CACTUS_TEST_TPU=1 python -m pytest tests/test_evolver_gate.py -q

Last pinned run (2026-08-17, one v5e chip via relay, cold compile
cache): mean recall 0.9259, precision 0.9566, average 0.9413,
align wall 1671 s.
"""

import os

import numpy as np
import pytest

from cactus_tpu.config import Config
from cactus_tpu.io.fasta import Sequence
from cactus_tpu import progressive
from cactus_tpu.testutil import evolver
from cactus_tpu.testutil.comparator import score_pairs
from cactus_tpu.utils.trees import parse_newick

EVOLVER_MAMMALS_NEWICK = (
    "((simHuman_chr6:0.144018,(simMouse_chr6:0.084509,"
    "simRat_chr6:0.091589)mr:0.271974)anc1:0.020593,"
    "(simCow_chr6:0.18908,simDog_chr6:0.16303)anc2:0.032898)root;")

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="evolver-scale gate: set RUN_SLOW=1 (and CACTUS_TEST_TPU=1)")


def test_evolver_mammals_scale_gate():
    tree = parse_newick(EVOLVER_MAMMALS_NEWICK)
    sim = evolver.simulate(tree, root_len=600_000, seed=41)
    leaves = tree.leaf_names()
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c",
                                        sim.genomes[ev].codes)}
               for ev in leaves}
    result = progressive.ProgressiveAligner(
        tree, genomes, tree_workers=2).run()

    # --- mafComparator-style accuracy gate ---
    recalls, precisions = [], []
    for i in range(len(leaves)):
        for j in range(i + 1, len(leaves)):
            a, b = leaves[i], leaves[j]
            truth = sim.truth_pairs_arr(a, b)
            s = score_pairs(truth,
                            progressive.leaf_pairs_arr(result, a, b))
            recalls.append(s.recall)
            precisions.append(s.precision)
            # every pair individually above the floor
            assert s.recall > 0.80 and s.precision > 0.85, (a, b, s)
    avg = (float(np.mean(recalls)) + float(np.mean(precisions))) / 2
    assert avg >= 0.89, (avg, recalls, precisions)

    # --- halStats structural bounds (evolverTest.py:1130-1174) ---
    from cactus_tpu.phases.hal import hal_stats, hal_validate
    assert hal_validate(result) == []
    rows = {r["genome"]: r for r in hal_stats(result)}
    for anc in ["mr", "anc1", "anc2", "root"]:
        # ancestor lengths within 20% of the root scale
        assert 0.8 * 600_000 < rows[anc]["length"] < 1.2 * 600_000, anc
        assert rows[anc]["n_bottom_segments"] > 0
    for lf in leaves:
        assert rows[lf]["n_top_segments"] > 100, lf


EVOLVER_PRIMATES_NEWICK = (
    "((simGorilla:0.008964,(simHuman:0.0067,simChimp:0.006667)"
    "anc1:0.00225)anc2:0.009693,simOrang:0.01831)root;")


def test_evolver_primates_scale_gate():
    """The primates fixture analog: shallow divergence, near-perfect
    accuracy expected (reference pins 0.998757 on evolverPrimates;
    test/evolverPrimates-default.comp.xml:4)."""
    tree = parse_newick(EVOLVER_PRIMATES_NEWICK)
    sim = evolver.simulate(tree, root_len=600_000, seed=43)
    leaves = tree.leaf_names()
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c",
                                        sim.genomes[ev].codes)}
               for ev in leaves}
    result = progressive.ProgressiveAligner(
        tree, genomes, tree_workers=2).run()
    recalls, precisions = [], []
    for i in range(len(leaves)):
        for j in range(i + 1, len(leaves)):
            a, b = leaves[i], leaves[j]
            truth = sim.truth_pairs_arr(a, b)
            s = score_pairs(truth,
                            progressive.leaf_pairs_arr(result, a, b))
            recalls.append(s.recall)
            precisions.append(s.precision)
            assert s.recall > 0.95 and s.precision > 0.95, (a, b, s)
    avg = (float(np.mean(recalls)) + float(np.mean(precisions))) / 2
    assert avg >= 0.97, (avg, recalls, precisions)
