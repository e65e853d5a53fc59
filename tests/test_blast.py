import numpy as np
import pytest

from cactus_tpu.config import BlastParams
from cactus_tpu.io.fasta import Sequence, revcomp
from cactus_tpu.ops import seeds as seed_ops
from cactus_tpu.ops import chain as chain_ops
from cactus_tpu.phases import blast
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


def test_kmer_hashes():
    import jax.numpy as jnp
    codes = jnp.array([0, 1, 2, 3, 0, 1], dtype=jnp.uint8)
    valid = jnp.ones(6, dtype=bool)
    h, pos = seed_ops.kmer_hashes(codes, valid, k=3, step=1)
    assert list(pos) == [0, 1, 2, 3]
    # hash of [0,1,2] = 0b000110 = 6
    assert int(h[0]) == 0b000110
    # invalid (N) kills overlapping kmers
    codes2 = codes.at[2].set(4)
    h2, _ = seed_ops.kmer_hashes(codes2, valid, k=3, step=1)
    assert int(h2[0]) == seed_ops.INVALID_Q and int(h2[3]) != seed_ops.INVALID_Q


def test_seed_join_exact():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, 256).astype(np.uint8)
    q = t[50:114].copy()  # exact 64bp substring
    qpos, tpos = blast.find_anchors(q, t, k=15, step=1, max_occ=8)
    # every query kmer should hit its true position
    true_hits = {(i, 50 + i) for i in range(64 - 15 + 1)}
    got = set(zip(qpos.tolist(), tpos.tolist()))
    assert true_hits <= got


def test_merge_diagonal_runs():
    qpos = np.array([0, 1, 2, 10, 50])
    tpos = np.array([5, 6, 7, 15, 70])
    runs = seed_ops.merge_diagonal_runs(qpos, tpos, k=4, max_gap=6)
    # first four all on diag 5 with gaps <= 10 -> one run; last separate
    runs_set = {tuple(r) for r in runs.tolist()}
    assert (0, 5, 14) in runs_set
    assert (50, 70, 4) in runs_set


def test_chain_anchors_collinear():
    runs = np.array([
        [0, 0, 20],
        [30, 32, 20],    # small diag shift
        [60, 62, 20],
        [500, 100, 20],  # off-chain (target jumps backwards relative)
    ], dtype=np.int64)
    order, scores, preds = chain_ops.chain_anchors(runs, gap_open=10,
                                                   gap_extend=1, max_gap=1000)
    chains = chain_ops.extract_chains(runs, order, scores, preds)
    assert len(chains) >= 1
    best = chains[0]
    assert len(best["runs"]) == 3
    assert best["score"] > 40


def test_trim_chain_overlaps():
    runs = np.array([[0, 0, 20], [10, 10, 20], [40, 40, 5]], dtype=np.int64)
    out = chain_ops.trim_chain_overlaps(runs)
    assert out[0].tolist() == [0, 0, 20]
    assert out[1].tolist() == [20, 20, 10]
    assert out[2].tolist() == [40, 40, 5]


def _identity_of(rec, q, t):
    n = same = 0
    qf = q
    for qp, tp in rec.aligned_pairs():
        n += 1
        same += int(qf[qp] == t[tp]) if rec.strand == "+" else 0
    return n


def test_align_contig_pair_identical():
    rng = np.random.default_rng(1)
    s = rng.integers(0, 4, 2000).astype(np.uint8)
    cfg = BlastParams()
    recs = blast.align_contig_pair(Sequence("a", s), Sequence("b", s.copy()),
                                   "A.a", "B.b", cfg)
    primary = [r for r in recs if r.strand == "+"]
    assert primary
    best = max(primary, key=lambda r: r.nmatch)
    assert best.nmatch >= 1990
    assert best.cigar[0][0] == "M"


def test_align_contig_pair_revcomp():
    rng = np.random.default_rng(2)
    s = rng.integers(0, 4, 1500).astype(np.uint8)
    q = revcomp(s)
    cfg = BlastParams()
    recs = blast.align_contig_pair(Sequence("a", q), Sequence("b", s),
                                   "A.a", "B.b", cfg)
    minus = [r for r in recs if r.strand == "-"]
    assert minus
    best = max(minus, key=lambda r: r.nmatch)
    assert best.nmatch >= 1490
    # verify aligned pairs are true homologies: q[i] == revcomp base of t
    from cactus_tpu.io.fasta import complement
    for qp, tp in list(best.aligned_pairs())[:100]:
        assert q[qp] == complement(s[tp:tp + 1])[0]


def test_pairwise_accuracy_on_sim():
    """End-to-end pairwise anchoring accuracy vs simulator truth."""
    tree = parse_newick("(a:0.05,b:0.05)root;")
    sim = evolver.simulate(tree, root_len=20_000, seed=5)
    ga, gb = sim.genomes["a"], sim.genomes["b"]
    cfg = BlastParams()
    recs = blast.align_contig_pair(Sequence("c", ga.codes),
                                   Sequence("c", gb.codes), "a.c", "b.c", cfg)
    pred = set()
    for r in recs:
        if r.is_primary:
            for qp, tp in r.aligned_pairs():
                pred.add((qp, tp))
    truth = {(p, q) for p, q, _s in sim.truth_pairs("a", "b")}
    inter = len(truth & pred)
    recall = inter / len(truth)
    precision = inter / len(pred)
    assert recall > 0.90, f"recall {recall:.3f}"
    assert precision > 0.90, f"precision {precision:.3f}"


def test_filter_primary_chains_demotes_orphans():
    """A colinear run of primaries sums over the threshold and stays
    primary; an isolated low-score primary is demoted to secondary
    (local_alignment.py:711-727 rechain + minChainScore)."""
    from cactus_tpu.io.paf import PafRecord

    def rec(qs, qe, ts, te, score):
        r = PafRecord("q", 100_000, qs, qe, "+", "t", 100_000, ts, te,
                      qe - qs, 0)
        r.set_tag("AS", "i", score)
        r.set_tag("tp", "A", "P")
        return r

    # chain sums 16000 minus the join gap cost (chainGapOpen 5000 +
    # extend 1 * 500) = 10500 >= threshold
    chain = [rec(0, 1000, 0, 1000, 8000), rec(1500, 2500, 1500, 2500, 8000)]
    # target coords jump BACKWARDS -> not colinear with the chain
    orphan = rec(90_000, 90_100, 500, 600, 900)
    out = blast.filter_primary_chains(chain + [orphan],
                                      min_chain_score=10_000,
                                      max_gap=1_000_000)
    assert [r.get_tag("tp") for r in out] == ["P", "P", "S"]
    # threshold 0 disables the filter
    orphan.set_tag("tp", "A", "P")
    out0 = blast.filter_primary_chains([orphan], 0, 1_000_000)
    assert out0[0].get_tag("tp") == "P"


def test_fastga_mode_close_genomes():
    """The --fastga aligner mode (adaptamer-style unique seeding,
    local_alignment.py:120-241): near-identical genomes align with high
    accuracy from a much sparser anchor set."""
    import dataclasses
    from cactus_tpu.config import Config
    from cactus_tpu.testutil import evolver
    from cactus_tpu.testutil.comparator import score_pairs
    from cactus_tpu.utils.trees import parse_newick

    tree = parse_newick("(a:0.01,b:0.01)r;")
    sim = evolver.simulate(tree, root_len=40_000, seed=13)
    qa = Sequence("a.c", sim.genomes["a"].codes)
    tb = Sequence("b.c", sim.genomes["b"].codes)
    cfg = dataclasses.replace(Config.default().blast, aligner="fastga")
    recs = blast.align_contig_pair(qa, tb, "a.c", "b.c", cfg)
    assert recs
    pred = set()
    for r in recs:
        rel = 1 if r.strand == "+" else -1
        for qp, tp in r.aligned_pairs():
            pred.add((qp, tp, rel))
    truth = {(p, q, s) for p, q, s in sim.truth_pairs("a", "b")}
    s = score_pairs(truth, pred)
    assert s.recall > 0.95 and s.precision > 0.95, s


def test_trim_outgroup_sequences():
    """Outgroup-side trimming (trimOutgroups): og records rebase onto
    covered+flank fragments; og codes shrink to the covered slices."""
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu.io.paf import PafRecord
    from cactus_tpu.phases.blast import trim_outgroup_sequences

    rng = np.random.default_rng(3)
    og = Sequence("OG.c", rng.integers(0, 4, 10_000).astype(np.uint8))
    recs = [
        PafRecord("A.c", 500, 10, 110, "+", "OG.c", 10_000, 1000, 1100,
                  90, 100),
        PafRecord("OG.c", 10_000, 1150, 1250, "-", "A.c", 500, 200, 300,
                  90, 100),
        PafRecord("A.c", 500, 300, 400, "+", "OG.c", 10_000, 8000, 8100,
                  90, 100),
    ]
    out, og_codes = trim_outgroup_sequences(recs, {"OG.c": og}, flank=50)
    # two fragments: [950, 1300) and [7950, 8150)
    assert set(og_codes) == {"OG.c|og:950", "OG.c|og:7950"}
    assert len(og_codes["OG.c|og:950"]) == 350
    assert np.array_equal(og_codes["OG.c|og:950"], og.codes[950:1300])
    r0, r1, r2 = out
    assert r0.tname == "OG.c|og:950" and r0.tstart == 50 and r0.tend == 150
    assert r0.tlen == 350
    assert r1.qname == "OG.c|og:950" and r1.qstart == 200
    assert r2.tname == "OG.c|og:7950" and r2.tstart == 50
    # ingroup side untouched
    assert r0.qname == "A.c" and r0.qstart == 10


def test_primary_selection_tile_trim_mode():
    """The reference paffy chain→tile→trim→filter pipeline
    (primary_selection="tile-trim") holds accuracy end-to-end."""
    import dataclasses
    from cactus_tpu.config import Config
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu import progressive
    from cactus_tpu.testutil import evolver
    from cactus_tpu.testutil.comparator import score_pairs
    from cactus_tpu.utils.trees import parse_newick

    cfg = Config.default()
    cfg.blast.primary_selection = "tile-trim"
    tree = parse_newick("((a:0.03,b:0.03)ab:0.03,c:0.06)root;")
    sim = evolver.simulate(tree, root_len=10_000, seed=21)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ["a", "b", "c"]}
    res = progressive.ProgressiveAligner(
        tree, genomes, min_chain_override=64, config=cfg).run()
    for x, y in [("a", "b"), ("a", "c")]:
        truth = {(p, q, s) for p, q, s in sim.truth_pairs(x, y)}
        s = score_pairs(truth, progressive.leaf_pairs(res, x, y))
        assert s.precision > 0.97 and s.recall > 0.97, (x, y, s)
    # chainTrimFraction != 1 is implemented (central-fraction trim,
    # paffy chain --trimFraction): records shrink, nothing raises
    from cactus_tpu.io.paf import PafRecord
    from cactus_tpu.phases.blast import finalize_records
    frac = dataclasses.replace(cfg.blast, chain_trim_fraction=0.5)
    rec = PafRecord(qname="q.c", qlen=200, qstart=0, qend=200,
                    strand="+", tname="t.c", tlen=200, tstart=0,
                    tend=200, nmatch=200, alnlen=200, mapq=60)
    rec.cigar = [("M", 200)]
    rec.set_tag("AS", "i", 2000)
    out = finalize_records([rec], frac)
    assert len(out) == 1
    assert out[0].qend - out[0].qstart == 100


def test_finalize_drops_secondaries_when_configured():
    """outputSecondaryAlignments=0 drops coverage-demoted records in
    BOTH selection modes (reference: filter --maxTileLevel 1 discards
    them entirely, local_alignment.py:679-688)."""
    import dataclasses
    from cactus_tpu.config import Config
    from cactus_tpu.io.paf import PafRecord

    def rec(qs, qe, score):
        r = PafRecord("A.q", 100_000, qs, qe, "+", "B.t", 100_000,
                      qs, qe, qe - qs, qe - qs,
                      tags={"cg": ("Z", f"{qe-qs}M")})
        r.set_tag("AS", "i", score)
        return r

    best = rec(0, 1000, 50_000)
    shadowed = rec(100, 900, 40_000)
    for mode in ("coverage", "tile-trim"):
        cfg = dataclasses.replace(Config.default().blast,
                                  primary_selection=mode,
                                  output_secondary_alignments=False)
        out = blast.finalize([rec(0, 1000, 50_000), rec(100, 900, 40_000)],
                             cfg)
        assert all(r.is_primary for r in out), mode
        assert len(out) == 1, (mode, [str(r)[:60] for r in out])
        cfg2 = dataclasses.replace(cfg, output_secondary_alignments=True)
        out2 = blast.finalize([rec(0, 1000, 50_000), rec(100, 900, 40_000)],
                              cfg2)
        assert sum(not r.is_primary for r in out2) == 1, mode


def test_minimap2_mode_divergent_genomes():
    """The --minimap2 aligner mode (reference `minimap2 -c -x asm20`,
    local_alignment.py:99-118): minimizer-sampled contiguous seeds feed
    the same chain/extend stack; accuracy holds at asm-scale divergence
    with a sampled (sparser) anchor set."""
    import dataclasses
    from cactus_tpu.config import Config
    from cactus_tpu.testutil import evolver
    from cactus_tpu.testutil.comparator import score_pairs
    from cactus_tpu.utils.trees import parse_newick

    tree = parse_newick("(a:0.05,b:0.05)r;")
    sim = evolver.simulate(tree, root_len=40_000, seed=29)
    qa = Sequence("a.c", sim.genomes["a"].codes)
    tb = Sequence("b.c", sim.genomes["b"].codes)
    cfg = dataclasses.replace(Config.default().blast, aligner="minimap2")
    recs = blast.align_contig_pair(qa, tb, "a.c", "b.c", cfg)
    assert recs
    pred = set()
    for r in recs:
        rel = 1 if r.strand == "+" else -1
        for qp, tp in r.aligned_pairs():
            pred.add((qp, tp, rel))
    truth = {(p, q, s) for p, q, s in sim.truth_pairs("a", "b")}
    s = score_pairs(truth, pred)
    assert s.recall > 0.9 and s.precision > 0.9, s


def test_minimizer_sampling_density():
    """(k, w) window minimizers sample ~2/(w+1) of seeds and every
    w-window keeps at least one seed (coverage guarantee)."""
    import numpy as np
    from cactus_tpu.ops import seeds_host

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 50_000).astype(np.uint8)
    h_all, p_all = seeds_host.hash_kmers(codes, None, 15, 1)
    h_min, p_min = seeds_host.hash_kmers(codes, None, 15, 1,
                                         minimizer_w=10)
    assert 0 < len(p_min) < 0.35 * len(p_all)
    # window coverage: gaps between kept positions never exceed w
    assert int(np.diff(p_min).max()) <= 10
    # sampled set is deterministic and position-consistent
    assert set(p_min) <= set(p_all)
