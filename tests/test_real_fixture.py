"""Real-fixture oracle: the ACTUAL evolverMammals data vs the pinned
reference baseline (VERDICT r2 missing #5).

The reference pins mafComparator accuracy of its own output against the
downloaded evolver truth MAF (test/evolverTest.py:1208-1269):

    precision-direction (ours -> truth) baseline 0.894622, delta 0.05
    recall-direction   (truth -> ours) baseline 0.706771, delta 0.13
    (test/evolverMammals-default.comp.xml homologyTests averages)

This environment has no egress, so the gate is opt-in: point
CACTUS_TEST_DATA at a local clone of
ComparativeGenomicsToolkit/cactusTestData (or any directory containing
evolver/mammals/loci1/{simCow.chr6,simDog.chr6,simHuman.chr6,
simMouse.chr6,simRat.chr6,all.maf}) and run:

    CACTUS_TEST_DATA=/path/to/cactusTestData RUN_SLOW=1 \
        python -m pytest tests/test_real_fixture.py -q -s

Skipped cleanly when the data is absent.
"""

import os

import numpy as np
import pytest

DATA = os.environ.get("CACTUS_TEST_DATA", "")
LOCI = os.path.join(DATA, "evolver", "mammals", "loci1")
GENOMES = {
    # event name (examples/evolverMammals.txt) -> fixture fasta
    "simCow_chr6": "simCow.chr6",
    "simDog_chr6": "simDog.chr6",
    "simHuman_chr6": "simHuman.chr6",
    "simMouse_chr6": "simMouse.chr6",
    "simRat_chr6": "simRat.chr6",
}
TRUTH_MAF = os.path.join(LOCI, "all.maf")
NEWICK = ("((simHuman_chr6:0.144018,(simMouse_chr6:0.084509,"
          "simRat_chr6:0.091589)mr:0.271974)anc1:0.020593,"
          "(simCow_chr6:0.18908,simDog_chr6:0.16303)anc2:0.032898)root;")

# reference-pinned baselines + deltas (evolverTest.py:1415 passes
# delta=(0.05, 0.13); assertGreaterEqual(acc + delta, baseline))
BASELINE_PRECISION = 0.894622      # fileB == truth direction
BASELINE_RECALL = 0.706771         # fileA == truth direction
DELTA = (0.05, 0.13)

_have = DATA and all(
    os.path.exists(os.path.join(LOCI, f))
    for f in list(GENOMES.values()) + ["all.maf"])

needs_fixture = pytest.mark.skipif(
    not _have, reason="CACTUS_TEST_DATA with evolver/mammals/loci1 "
    "fixtures not available (no-egress environment)")


def _truth_genome(event: str) -> str:
    """Truth-MAF src names are 'simCow.chr6'-style; the comparator's
    genome key is the part before the first dot."""
    return GENOMES[event].split(".", 1)[0]


@needs_fixture
def test_evolver_mammals_real_fixture():
    from cactus_tpu.io.fasta import read_fasta
    from cactus_tpu import progressive
    from cactus_tpu.testutil.comparator import maf_pairs_arr, score_pairs
    from cactus_tpu.utils import pairs as pk
    from cactus_tpu.utils.trees import parse_newick

    tree = parse_newick(NEWICK)
    genomes = {}
    for ev, fname in GENOMES.items():
        seqs = read_fasta(os.path.join(LOCI, fname))
        assert len(seqs) == 1, (ev, list(seqs))
        (name, seq), = seqs.items()
        genomes[ev] = {f"{ev}.c": type(seq)(f"{ev}.c", seq.codes)}

    result = progressive.ProgressiveAligner(
        tree, genomes, tree_workers=2).run()

    events = list(GENOMES)
    tot_t = tot_p = hit_t = hit_p = 0
    for i, a in enumerate(events):
        for b in events[i + 1:]:
            truth = maf_pairs_arr(TRUTH_MAF, _truth_genome(a),
                                  _truth_genome(b))
            pred = progressive.leaf_pairs_arr(result, a, b)
            s = score_pairs(truth, pred)
            print(f"{a} vs {b}: recall {s.recall:.4f} "
                  f"precision {s.precision:.4f} "
                  f"({s.n_truth} truth / {s.n_pred} pred)")
            tot_t += s.n_truth
            tot_p += s.n_pred
            hit_t += s.recall * s.n_truth
            hit_p += s.precision * s.n_pred
    recall = hit_t / tot_t
    precision = hit_p / tot_p
    print(f"AGGREGATE recall {recall:.6f} precision {precision:.6f} "
          f"(baselines {BASELINE_RECALL}/{BASELINE_PRECISION}, "
          f"deltas {DELTA})")
    assert precision + DELTA[0] >= BASELINE_PRECISION, precision
    assert recall + DELTA[1] >= BASELINE_RECALL, recall


def test_external_truth_maf_parsing(tmp_path):
    """The oracle's fragile part — parsing an EXTERNAL evolver-style
    truth MAF (src names like 'simCow.chr6', mixed strands) into pair
    keys — runs in CI against a hand-built fixture with known pairs."""
    from cactus_tpu.testutil.comparator import maf_pairs, score_pairs

    maf = tmp_path / "all.maf"
    maf.write_text("""##maf version=1
a score=0
s simCow.chr6 10 5 + 100 ACGGT
s simDog.chr6 20 4 + 200 AC-GT

a score=0
s simCow.chr6 50 3 + 100 TTT
s simDog.chr6 97 3 - 200 TTT
""")
    got = maf_pairs(str(maf), "simCow", "simDog")
    # block 1: cow consumes 10..14; dog gap at col 2 leaves cow 12
    # unpaired; cols (0,1,3,4) pair up
    assert {(10, 20, 1), (11, 21, 1), (13, 22, 1), (14, 23, 1)} <= got
    assert not any(p[0] == 12 for p in got)
    # block 2: dog '-' strand: start 97 size 3 of srcSize 200 →
    # forward positions 102,101,100 paired with cow 50,51,52
    assert (50, 102, -1) in got and (52, 100, -1) in got
    s = score_pairs(got, got)
    assert s.recall == 1.0 and s.precision == 1.0
