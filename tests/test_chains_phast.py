"""Chains export + conservation scoring."""

import io

import numpy as np
import pytest

from cactus_tpu import chains_export, phast, progressive
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.io.maf import MafBlock, MafRow
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


@pytest.fixture(scope="module")
def small_result():
    tree = parse_newick("((a:0.04,b:0.04)ab:0.04,c:0.08)root;")
    sim = evolver.simulate(tree, root_len=6_000, seed=81)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ["a", "b", "c"]}
    res = progressive.ProgressiveAligner(tree, genomes,
                                         min_chain_override=64).run()
    return sim, res


def test_chain_export_roundtrip(small_result):
    sim, res = small_result
    buf = io.StringIO()
    n = chains_export.write_chains(buf, res, "a", "b")
    assert n >= 1
    text = buf.getvalue()
    lines = [l for l in text.splitlines() if l]
    headers = [l for l in lines if l.startswith("chain ")]
    assert len(headers) == n
    # parse one chain and verify the block arithmetic is consistent
    for hi, h in enumerate(headers):
        f = h.split()
        t_start, t_end = int(f[5]), int(f[6])
        q_start, q_end = int(f[10]), int(f[11])
        # collect its block lines
        idx = lines.index(h)
        blks = []
        for l in lines[idx + 1:]:
            if l.startswith("chain "):
                break
            blks.append([int(x) for x in l.split()])
        t_sum = sum(b[0] for b in blks) + sum(b[1] for b in blks[:-1])
        q_sum = sum(b[0] for b in blks) + sum(b[2] for b in blks[:-1])
        assert t_start + t_sum == t_end, h
        assert q_start + q_sum == q_end, h


def test_chain_pairs_are_true(small_result):
    """Chain blocks encode the same pairs as leaf_pairs (spot check)."""
    sim, res = small_result
    truth = {(p, q) for p, q, _s in sim.truth_pairs("a", "b")}
    runs = list(chains_export._joined_runs(res, "a", "b"))
    good = total = 0
    for _rn, rs, _qn, qs, st, n in runs:
        for k in range(n):
            total += 1
            pair = (rs + k, qs + k * st)
            good += pair in truth
    assert total > 4000
    assert good / total > 0.9


def _mk_blocks(texts_by_src, start=0):
    rows = []
    for src, text in texts_by_src.items():
        size = len(text.replace("-", ""))
        rows.append(MafRow(src=src, start=start, size=size, strand="+",
                           src_size=1000, text=text))
    return [MafBlock(rows=rows)]


def test_phylo_fit_recovers_rate():
    """Fitted scale tracks the true divergence of simulated columns."""
    tree = parse_newick("(a:0.1,b:0.1,c:0.1)root;")
    rng = np.random.default_rng(0)
    for factor in (0.5, 2.0):
        scaled = parse_newick(
            f"(a:{0.1*factor},b:{0.1*factor},c:{0.1*factor})root;")
        sim = evolver.simulate(scaled, root_len=3000, seed=3,
                               indel_rate=0.0)
        texts = {f"{g}.c": "".join("ACGT"[c] for c in sim.genomes[g].codes)
                 for g in ["a", "b", "c"]}
        blocks = _mk_blocks(texts)
        fit = phast.phylo_fit(blocks, tree)
        assert abs(fit - factor) / factor < 0.3, (factor, fit)


def test_phylo_p_scores_conserved_region():
    """Columns forced identical score higher than diverged columns."""
    tree = parse_newick("(a:0.2,b:0.2,c:0.2)root;")
    sim = evolver.simulate(tree, root_len=2000, seed=5, indel_rate=0.0)
    codes = {g: sim.genomes[g].codes.copy() for g in ["a", "b", "c"]}
    # conserve the middle third exactly
    lo, hi = 700, 1300
    for g in ("b", "c"):
        codes[g][lo:hi] = codes["a"][lo:hi]
    texts = {f"{g}.c": "".join("ACGT"[c] for c in codes[g])
             for g in ["a", "b", "c"]}
    blocks = _mk_blocks(texts)
    scores, meta = phast.phylo_p(blocks, tree)
    assert len(scores) == 2000
    assert scores[lo:hi].mean() > scores[:lo].mean() + 0.1
    # wig output round-trip
    import tempfile, os
    p = tempfile.mktemp(suffix=".wig")
    phast.write_wig(p, scores, meta)
    assert os.path.getsize(p) > 0
    os.remove(p)


def test_four_d_sites_hand_case(tmp_path):
    """4d extraction: GGx codons are 4-fold degenerate, ATG/TAx are not;
    minus-strand genes read through revcomp."""
    from cactus_tpu.io.fasta import Sequence, _CODE_OF
    from cactus_tpu.phast import four_d_sites, gff_cds_transcripts

    def codes(s):
        return np.array([_CODE_OF[ord(c)] for c in s], dtype=np.uint8)

    #            0123456789012345678
    # + gene:    ATG GGA CTT TAA      codons: ATG GGA(4d@5) CTT(4d@8) TAA
    seq = "ATGGGACTTTAA" + "CCC" + "TTACAGCCCCAT"
    # - gene on the last 12 bases: revcomp = ATG GGG CTG TAA
    #   genome coords of that CDS: [15, 27); third codon bases on the
    #   coding strand map to genome positions 27-1-5=21 (GGG), 27-1-8=18
    seqs = {"s": Sequence("s", codes(seq))}
    gff = tmp_path / "g.gff"
    gff.write_text(
        "s\tx\tCDS\t1\t12\t.\t+\t0\ttranscript_id t1\n"
        "s\tx\tCDS\t16\t27\t.\t-\t0\ttranscript_id t2\n")
    tx = gff_cds_transcripts(str(gff))
    sites = four_d_sites(seqs, tx)
    assert set(sites["s"].tolist()) == {5, 8, 21, 18}


def test_phylo_fit_on_4d_sites(tmp_path):
    """phyloFit restricted to 4d sites still returns a sane scale."""
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu import progressive, phast
    from cactus_tpu.phases import hal as hal_mod
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick
    tree = parse_newick("(a:0.05,b:0.05)root;")
    sim = evolver.simulate(tree, root_len=6000, seed=9)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ["a", "b"]}
    result = progressive.ProgressiveAligner(
        tree, genomes, min_chain_override=64).run()
    blocks = hal_mod.hal2maf(result, "root", include_ancestor=False)
    ref_seq_name = blocks[0].rows[0].src
    # fake annotation: one long CDS across the first 3000 ref bases
    # (frame 0, + strand) on the MAF reference genome
    ref_ev = "a" if ref_seq_name.startswith("a.") else "root"
    gff = tmp_path / "genes.gff"
    gff.write_text(f"{ref_seq_name}\tx\tCDS\t1\t3000\t.\t+\t0\tt1\n")
    tx = phast.gff_cds_transcripts(str(gff))
    sites = phast.four_d_sites(
        {n: s for n, s in result.genomes[ref_ev].items()}, tx)
    n_sites = sum(len(v) for v in sites.values())
    assert 200 < n_sites < 1001  # ~(8/16) of 1000 codons are 4d-prefixed
    s_all = phast.phylo_fit(blocks, result.tree)
    s_4d = phast.phylo_fit(blocks, result.tree, sites=sites)
    assert 0.1 < s_4d < 8.0
    assert abs(s_4d - s_all) < 2.0


def test_phylo_p_lrt_and_score_methods():
    """LRT and SCORE tracks (cactus_phast.py:158 --method) separate a
    conserved run from neutral background; CONACC signs agree."""
    tree = parse_newick("(a:0.2,b:0.2,c:0.2)root;")
    sim = evolver.simulate(tree, root_len=1500, seed=5, indel_rate=0.0)
    codes = {g: sim.genomes[g].codes.copy() for g in ["a", "b", "c"]}
    lo, hi = 500, 1000
    for g in ("b", "c"):
        codes[g][lo:hi] = codes["a"][lo:hi]
    texts = {f"{g}.c": "".join("ACGT"[c] for c in codes[g])
             for g in ["a", "b", "c"]}
    blocks = _mk_blocks(texts)
    for method in ("LRT", "SCORE"):
        scores, meta = phast.phylo_p(blocks, tree, method=method)
        assert len(scores) == 1500, method
        assert scores[lo:hi].mean() > scores[:lo].mean() + 0.1, method
        # CONACC: conserved columns sign positive on average
        assert scores[lo:hi].mean() > 0, method
        # CON clamps accelerations at zero; NNEUT is non-negative
        con, _ = phast.phylo_p(blocks, tree, method=method, mode="CON")
        assert (con >= 0).all(), method
        nn, _ = phast.phylo_p(blocks, tree, method=method, mode="NNEUT")
        assert (nn >= 0).all(), method


def test_phylo_p_subtree_track():
    """--subtree lineage track: acceleration ONLY on the named subtree
    shows in its track, not (or much less) in the complement's."""
    tree = parse_newick("((a:0.1,b:0.1)ab:0.1,(c:0.1,d:0.1)cd:0.1)root;")
    sim = evolver.simulate(tree, root_len=1200, seed=9, indel_rate=0.0)
    codes = {g: sim.genomes[g].codes.copy() for g in "abcd"}
    # conserve a,b on [400,800) (the ab lineage slows down there)
    lo, hi = 400, 800
    codes["b"][lo:hi] = codes["a"][lo:hi]
    texts = {f"{g}.c": "".join("ACGT"[c] for c in codes[g])
             for g in "abcd"}
    blocks = _mk_blocks(texts)
    s_ab, _ = phast.phylo_p(blocks, tree, method="LRT", subtree="ab")
    s_cd, _ = phast.phylo_p(blocks, tree, method="LRT", subtree="cd")
    d_ab = s_ab[lo:hi].mean() - s_ab[:lo].mean()
    d_cd = s_cd[lo:hi].mean() - s_cd[:lo].mean()
    assert d_ab > d_cd + 0.05, (d_ab, d_cd)
    import pytest
    with pytest.raises(ValueError):
        phast.phylo_p(blocks, tree, subtree="nope")


def test_bigwig_roundtrip(tmp_path):
    """Native bbi writer round-trips through its reader, incl. a
    two-level R-tree (many sections)."""
    from cactus_tpu.io.bigwig import read_bigwig, write_bigwig
    rng = np.random.default_rng(3)
    starts = np.sort(rng.choice(2_000_000, size=300_000, replace=False))
    vals = rng.normal(size=starts.size).astype(np.float32)
    data = {"chr1": (starts, vals),
            "chr2": (np.arange(50, dtype=np.uint32),
                     np.ones(50, np.float32))}
    sizes = {"chr1": 2_000_000, "chr2": 1000}
    p = str(tmp_path / "t.bw")
    write_bigwig(p, data, sizes)
    got, gsizes = read_bigwig(p)
    assert gsizes == sizes
    for c in data:
        np.testing.assert_array_equal(got[c][0], data[c][0])
        np.testing.assert_array_equal(got[c][1], data[c][1])
    # header sanity: magic + version
    import struct
    magic, version = struct.unpack_from("<IH", open(p, "rb").read(6))
    assert magic == 0x888FFC26 and version == 4
