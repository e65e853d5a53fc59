"""Reference phase: ordering, matching, and ML ancestral reconstruction."""

import numpy as np

from cactus_tpu.config import BarParams, BlastParams, CafParams, ReferenceParams
from cactus_tpu.io.fasta import Sequence, complement
from cactus_tpu.phases import bar, blast, reference
from cactus_tpu.phases.caf import run_caf
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick, Tree


def test_jc_matrix_stochastic():
    for t in (0.0, 0.05, 0.5, 5.0):
        m = reference.jc_matrix(t)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-9)
        assert (m >= 0).all()
    # long branch → uniform
    np.testing.assert_allclose(reference.jc_matrix(100.0), 0.25, atol=1e-3)


def test_felsenstein_majority():
    """Three leaves observing A,A,C at one column → root A."""
    tree = parse_newick("(a:0.1,b:0.1,c:0.1)root;")
    events = [n.name for n in tree.preorder()]
    E = len(events)
    obs = np.ones((2, E, 4), dtype=np.float32)

    def put(col, ev, base):
        i = events.index(ev)
        obs[col, i, :] *= 1e-3
        obs[col, i, base] *= 1e3

    put(0, "a", 0); put(0, "b", 0); put(0, "c", 1)
    put(1, "a", 3); put(1, "b", 3); put(1, "c", 3)
    out = reference.felsenstein_ml(obs, np.zeros((2, E), np.int32), tree,
                                   events)
    assert out.tolist() == [0, 3]


def _mk_caf(table_lengths, recs):
    from cactus_tpu.graph.columns import SeqTable, build_columns, columns_to_blocks
    from cactus_tpu.phases.caf import CafResult
    table = SeqTable.build(table_lengths)
    pc = build_columns(recs, table)
    blocks = columns_to_blocks(pc)
    return CafResult(table=table, blocks=blocks,
                     alive=np.ones(blocks.n_blocks, bool),
                     events_of_seq=[n.split(".")[0] for n in table.names])


def test_order_blocks_path():
    """Two blocks adjacent on both threads chain into one ancestor thread."""
    from cactus_tpu.io.paf import PafRecord

    def rec(qs, qe, ts, te):
        r = PafRecord("A.c", 100, qs, qe, "+", "B.c", 100, ts, te, 0, 0)
        r.cigar = [("M", qe - qs)]
        r.set_tag("tp", "A", "P")
        return r

    # one alignment with an insert in B splits into two lockstep blocks
    r = PafRecord("A.c", 100, 0, 80, "+", "B.c", 100, 0, 90, 0, 0)
    r.cigar = [("M", 40), ("D", 10), ("M", 40)]
    r.set_tag("tp", "A", "P")
    caf = _mk_caf({"A.c": 100, "B.c": 100}, [r])
    assert caf.blocks.n_blocks == 2
    threads = reference.order_blocks(caf, ReferenceParams())
    assert len(threads) == 1
    assert len(threads[0]) == 2


def test_chain_units_freeze_unanimous_order():
    """Blocks joined by unanimous direct adjacencies form one chain unit,
    so Z matching cannot reorder them (getChainNodes semantics,
    buildReference.c:413-476)."""
    from cactus_tpu.io.paf import PafRecord

    r = PafRecord("A.c", 300, 0, 280, "+", "B.c", 300, 0, 290, 0, 0)
    r.cigar = [("M", 100), ("D", 10), ("M", 80), ("I", 5), ("M", 100)]
    r.set_tag("tp", "A", "P")
    caf = _mk_caf({"A.c": 300, "B.c": 300}, [r])
    assert caf.blocks.n_blocks == 3
    units, unit_of, orient_in = reference.build_chain_units(caf)
    assert len(units) == 1 and len(units[0]) == 3
    # matching at unit level keeps the proven order for every algorithm
    for algo in ("greedy", "maxWeight"):
        threads = reference.order_blocks(
            caf, ReferenceParams(matching_algorithm=algo))
        assert len(threads) == 1 and len(threads[0]) == 3


def test_z_score_matches_brute_force():
    """Closed form == sum over base pairs of (1-theta)^(gap+i+j)."""
    theta = 0.1
    beta = 1 - theta
    for m, n, gap in [(3, 4, 2), (1, 1, 1), (7, 2, 5)]:
        brute = sum(beta ** (gap + i + j)
                    for i in range(m) for j in range(n))
        np.testing.assert_allclose(
            reference.z_score(m, n, gap, theta), brute, rtol=1e-12)
    # theta=0 degenerates to m*n
    assert reference.z_score(6, 7, 3, 0.0) == 42.0


def test_event_weighting_multiplicity():
    """Shared branches are discounted by multiplicity
    (buildReference.c:256-282 independence weight)."""
    tree = parse_newick("((a:1,b:1)ab:1,c:2)root;")
    w0 = reference.event_weighting(tree, phi=0.0)
    # a: branches ab(len 1, mult 2) + a(len 1, mult 1):
    #    adjusted = 1/2 + 1 = 1.5, path = 2 -> 0.75
    np.testing.assert_allclose(w0["a"], 0.75)
    np.testing.assert_allclose(w0["b"], 0.75)
    # c: single branch, no sharing -> 1.0
    np.testing.assert_allclose(w0["c"], 1.0)
    w1 = reference.event_weighting(tree, phi=1.0)
    np.testing.assert_allclose(w1["a"], np.exp(-2.0) * 0.75)
    np.testing.assert_allclose(w1["c"], np.exp(-2.0) * 1.0)


def test_max_weight_matching_beats_greedy():
    """Greedy takes the single 10-edge and strands two 9-edges; blossom
    matches both 9s (VERDICT r1 item 4: fewer ancestor threads)."""
    live = [0, 1, 2, 3]
    # ends: block b -> 2b (L), 2b+1 (R)
    weights = {(1, 2): 10.0,    # 0R ~ 1L
               (1, 4): 9.0,     # 0R ~ 2L
               (2, 6): 9.0}     # 1L ~ 3L
    g = reference.match_ends(live, weights, "greedy")
    assert g == {1: 2, 2: 1}
    m = reference.match_ends(live, weights, "maxWeight")
    assert m == {1: 4, 4: 1, 2: 6, 6: 2}
    # fewer threads under the exact matching
    assert len(reference.walk_threads(live, m)) \
        < len(reference.walk_threads(live, g))


def test_blossom_matching_breaks_cycles():
    """A perfect matching that would close a cycle drops its weakest
    edge so the walk yields a linear thread."""
    live = [0, 1]
    weights = {(1, 2): 10.0,    # 0R ~ 1L
               (0, 3): 1.0}     # 0L ~ 1R (closes the cycle)
    m = reference.match_ends(live, weights, "maxWeight")
    assert m == {1: 2, 2: 1}
    threads = reference.walk_threads(live, m)
    assert len(threads) == 1 and len(threads[0]) == 2


def test_nudge_relocates_block():
    """A misplaced block moves to the insertion point that maximizes
    summed adjacency Z (nudgeGreedily semantics)."""
    threads = [[(0, 1), (2, 1), (1, 1)]]
    z = {(1, 2): 10.0,   # 0R ~ 1L
         (3, 4): 10.0}   # 1R ~ 2L
    out = reference.nudge_threads(threads, z, permutations=5)
    assert out == [[(0, 1), (1, 1), (2, 1)]]
    # no permutations -> untouched
    out0 = reference.nudge_threads(threads, z, permutations=0)
    assert out0 == threads


def test_reference_reconstruction_accuracy():
    """Reconstructed ancestor matches the simulated root genome."""
    tree = parse_newick("(a:0.05,b:0.05,c:0.05)root;")
    sim = evolver.simulate(tree, root_len=8000, seed=13)
    leaves = ["a", "b", "c"]
    recs = []
    for i, x in enumerate(leaves):
        for y in leaves[i + 1:]:
            recs.extend(blast.align_contig_pair(
                Sequence("c", sim.genomes[x].codes),
                Sequence("c", sim.genomes[y].codes),
                f"{x}.c", f"{y}.c", BlastParams()))
    lengths = {f"{g}.c": len(sim.genomes[g].codes) for g in leaves}
    caf = run_caf(recs, lengths, CafParams(), preset="one",
                  min_chain_override=64)
    seqs = {f"{g}.c": Sequence(f"{g}.c", sim.genomes[g].codes)
            for g in leaves}
    caf = bar.run_bar(caf, seqs, BarParams())
    gcodes = bar.global_codes(caf.table, seqs)
    ref = reference.run_reference(caf, gcodes, tree, "root",
                                  ReferenceParams())
    # ancestor length in the ballpark of the true root
    total = ref.total_length()
    assert 0.8 * 8000 < total < 1.25 * 8000, total

    # base-level identity vs the true simulated root at aligned columns
    root = sim.genomes["root"]
    blocks = caf.blocks
    n = same = 0
    leaf_gen = {f"{g}.c": sim.genomes[g] for g in leaves}
    for i in range(len(blocks.seg_block)):
        b = int(blocks.seg_block[i])
        if not caf.alive[b] or int(blocks.seg_strand[i]) != 1:
            continue
        if b not in ref.block_codes:
            continue
        name = caf.table.names[int(blocks.seg_seq[i])]
        g = leaf_gen[name]
        st = int(blocks.seg_start[i])
        codes_b = ref.block_codes[b]
        for k in range(int(blocks.seg_len[i])):
            r = int(g.anc_idx[st + k])
            if r < 0:
                continue
            expected = int(root.codes[r])
            if int(g.anc_strand[st + k]) == -1:
                expected = int(complement(np.array([expected],
                                                  dtype=np.uint8))[0])
            n += 1
            same += int(codes_b[k]) == expected
        if n > 20000:
            break
    assert n > 1000
    identity = same / n
    assert identity > 0.97, f"ancestor identity {identity:.4f}"


def test_streamed_felsenstein_window_invariance():
    """run_reference's streamed reconstruction must be window-size
    invariant: a tiny felsenstein window (many chunks) reproduces the
    single-window ancestor exactly (bases, coords, threads)."""
    import dataclasses

    from cactus_tpu.config import Config
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu import progressive
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick

    tree = parse_newick("((a:0.05,b:0.06)ab:0.03,c:0.09)root;")
    sim = evolver.simulate(tree, root_len=30_000, seed=5)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in tree.leaf_names()}

    outs = []
    for window in (1 << 60, 1000):
        cfg = Config.default()
        cfg.reference.felsenstein_window_columns = window
        res = progressive.ProgressiveAligner(
            tree, genomes, config=cfg, check_tree=False).run()
        outs.append(res)
    for anc in ("ab", "root"):
        a = outs[0].steps[anc].ref
        b = outs[1].steps[anc].ref
        assert list(a.sequences) == list(b.sequences)
        for n in a.sequences:
            assert (a.sequences[n].codes == b.sequences[n].codes).all(), n
        assert a.block_coord == b.block_coord
