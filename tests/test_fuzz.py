"""Randomized end-to-end fuzz tiers (RUN_FUZZ=1; slow).

These harnesses found three round-2 bugs: the degree-2-root crash in
remove_genome, the --target dependency-closure crash, and the 20 Mb
anchor-table coverage collapse.  Each run draws fresh cases from a
seeded generator; failures print the case parameters for replay.
"""

import os
import tempfile

import numpy as np
import pytest

from cactus_tpu.io.fasta import Sequence
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick

pytestmark = pytest.mark.skipif(not os.environ.get("RUN_FUZZ"),
                                reason="fuzz tier: set RUN_FUZZ=1")


def test_fuzz_progressive_accuracy():
    """Random trees/divergences/rearrangements: accuracy floors hold."""
    from cactus_tpu import progressive
    from cactus_tpu.testutil.comparator import score_pairs
    rng = np.random.default_rng(99)
    trees = ["(a:{d},b:{d})root;",
             "((a:{d},b:{d})ab:{d},c:{d})root;",
             "((a:{d},b:{d})ab:{h},(c:{d},d2:{d})cd:{h})root;"]
    for it in range(6):
        d = float(rng.choice([0.01, 0.05, 0.12, 0.2]))
        nwk = trees[int(rng.integers(len(trees)))].format(d=d, h=d / 2)
        kw = {}
        r = rng.random()
        if r < 0.3:
            kw = dict(duplication_rate=0.003, duplication_mean=120.0)
        elif r < 0.5:
            kw = dict(inversion_rate=0.002, inversion_mean=200.0)
        seed = int(rng.integers(1e6))
        tree = parse_newick(nwk)
        sim = evolver.simulate(tree, root_len=int(rng.choice([3000, 9000])),
                               seed=seed, **kw)
        leaves = tree.leaf_names()
        genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c",
                                            sim.genomes[ev].codes)}
                   for ev in leaves}
        res = progressive.ProgressiveAligner(
            tree, genomes, min_chain_override=64).run()
        a, b = leaves[0], leaves[1]
        truth = {(p, q, s) for p, q, s in sim.truth_pairs(a, b)}
        s = score_pairs(truth, progressive.leaf_pairs(res, a, b))
        assert s.recall > 0.55 and s.precision > 0.8, (nwk, d, kw, seed, s)


def test_fuzz_update_flows():
    """Random add/add-to-branch/replace/remove sequences keep the tree
    and archive invariants."""
    from cactus_tpu import progressive, update
    from cactus_tpu.phases.hal import hal_validate
    from cactus_tpu.store import AlignmentStore
    rng = np.random.default_rng(123)
    for trial in range(3):
        tree = parse_newick("((a:0.03,b:0.03)ab:0.03,c:0.06)root;")
        sim = evolver.simulate(tree, root_len=4000,
                               seed=int(rng.integers(1e6)))
        genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c",
                                            sim.genomes[ev].codes)}
                   for ev in ["a", "b", "c"]}
        store = AlignmentStore(tempfile.mkdtemp())
        progressive.ProgressiveAligner(tree, genomes, min_chain_override=64,
                                       store=store).run()
        known = {"a", "b", "c"}
        counter = 0
        for step in range(4):
            op = str(rng.choice(["add", "branch", "replace", "remove"]))
            if op in ("add", "branch") or len(known) <= 2:
                counter += 1
                newev = f"g{trial}_{counter}"
                src = str(rng.choice(sorted(known)))
                gsrc = store.load_genome(src)
                codes = gsrc[list(gsrc)[0]].codes.copy()
                idx = rng.random(len(codes)) < 0.02
                codes[idx] = (codes[idx] + 1) % 4
                g = {f"{newev}.c": Sequence(f"{newev}.c", codes)}
                if op == "branch":
                    res = update.add_genome_to_branch(
                        store, newev, g, sibling_event=src,
                        branch_length=0.02, min_chain_override=64)
                else:
                    res = update.add_genome(
                        store, newev, g,
                        parent_event=store.load_tree().name,
                        branch_length=0.02, min_chain_override=64)
                known.add(newev)
            elif op == "replace":
                ev = str(rng.choice(sorted(known)))
                gsrc = store.load_genome(ev)
                name = list(gsrc)[0]
                codes = gsrc[name].codes.copy()
                idx = rng.random(len(codes)) < 0.01
                codes[idx] = (codes[idx] + 1) % 4
                res = update.replace_genome(store, ev,
                                            {name: Sequence(name, codes)},
                                            min_chain_override=64)
            else:
                ev = str(rng.choice(sorted(known)))
                res = update.remove_genome(store, ev, min_chain_override=64)
                known.discard(ev)
            assert set(res.tree.leaf_names()) == known
            assert hal_validate(res) == []


def test_fuzz_staged_order_equality():
    """Any --target request order equals the one-shot MAF byte-wise."""
    from cactus_tpu import cli
    rng = np.random.default_rng(5)
    tree = parse_newick(
        "((a:0.03,b:0.03)ab:0.02,(c:0.03,d2:0.03)cd:0.02)root;")
    for trial in range(2):
        sim = evolver.simulate(tree, root_len=3000,
                               seed=int(rng.integers(1e6)))
        td = tempfile.mkdtemp()
        seqfile = evolver.write_seqfile(sim, os.path.join(td, "in"))
        mono = os.path.join(td, "mono")
        mmaf = os.path.join(td, "mono.maf")
        assert cli.main(["align", seqfile, mono, "--maf", mmaf,
                         "--min-chain", "64"]) == 0
        order = ["ab", "cd", "root"]
        rng.shuffle(order)
        st = os.path.join(td, "staged")
        for t in order:
            assert cli.main(["align", seqfile, st, "--target", t,
                             "--min-chain", "64"]) == 0
        smaf = os.path.join(td, "staged.maf")
        assert cli.main(["align", seqfile, st, "--maf", smaf,
                         "--min-chain", "64"]) == 0
        assert open(mmaf).read() == open(smaf).read(), order
