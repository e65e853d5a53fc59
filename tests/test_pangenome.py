"""Pangenome graph: exact path spelling, GFA/VCF export, variant calls."""

import os

import numpy as np
import pytest

from cactus_tpu.io.fasta import Sequence
from cactus_tpu.pangenome import graph as pgraph
from cactus_tpu.pangenome import vcf as pvcf
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


def _star_caf(seq_dict, min_chain=32):
    from cactus_tpu.config import BarParams, BlastParams, CafParams
    from cactus_tpu.phases import bar, blast
    from cactus_tpu.phases.caf import run_caf
    names = list(seq_dict)
    recs = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            recs.extend(blast.align_contig_pair(
                seq_dict[a], seq_dict[b], a, b, BlastParams()))
    recs = blast.mark_primaries(recs)
    lengths = {n: len(s) for n, s in seq_dict.items()}
    caf = run_caf(recs, lengths, CafParams(), preset="one",
                  min_chain_override=min_chain)
    return bar.run_bar(caf, seq_dict, BarParams())


@pytest.fixture(scope="module")
def small_graph():
    tree = parse_newick("(a:0.02,b:0.02,c:0.02)root;")
    sim = evolver.simulate(tree, root_len=6000, seed=17)
    seqs = {f"{g}.c": Sequence(f"{g}.c", sim.genomes[g].codes)
            for g in ["a", "b", "c"]}
    caf = _star_caf(seqs)
    g = pgraph.build_graph(caf, seqs)
    return sim, seqs, g


def test_walks_spell_sequences(small_graph):
    _sim, seqs, g = small_graph
    g.validate(seqs)  # raises on any mismatch


def test_graph_structure(small_graph):
    _sim, _seqs, g = small_graph
    st = pgraph.graph_stats(g)
    assert st["n_nodes"] > 2
    assert st["n_edges"] >= st["n_nodes"] - len(g.walks)
    assert st["n_paths"] == 3


def test_gfa_roundtrip(small_graph, tmp_path):
    _sim, seqs, g = small_graph
    p = str(tmp_path / "g.gfa")
    pgraph.write_gfa(p, g, ref_name="a.c")
    nodes = pgraph.read_gfa_nodes(p)
    assert len(nodes) == g.n_nodes
    lines = open(p).read().splitlines()
    kinds = {l.split("\t")[0] for l in lines}
    assert kinds >= {"H", "S", "L", "P", "W"}
    # total path length equals total input length
    total_in = sum(len(s) for s in seqs.values())
    w_lines = [l.split("\t") for l in lines if l.startswith("W\t")]
    assert sum(int(w[5]) for w in w_lines) == total_in


def test_vcf_calls_snp():
    """Hand-built case: one SNP between two haplotypes."""
    rng = np.random.default_rng(4)
    base = rng.integers(0, 4, 2000).astype(np.uint8)
    alt = base.copy()
    alt[1000] = (alt[1000] + 1) % 4
    seqs = {"ref.c": Sequence("ref.c", base),
            "alt.c": Sequence("alt.c", alt)}
    caf = _star_caf(seqs)
    g = pgraph.build_graph(caf, seqs)
    g.validate(seqs)
    recs = pvcf.vcf_records(g, "ref.c")
    snp = [r for r in recs if len(r.ref) == len(r.alts[0])]
    assert snp, "no substitution records"
    # the SNP position must be covered by exactly one record
    cov = [r for r in snp if r.pos <= 1001 <= r.pos + len(r.ref) - 1]
    assert len(cov) == 1
    r = cov[0]
    off = 1001 - r.pos
    from cactus_tpu.io.fasta import _BASE_OF
    assert r.ref[off] == chr(_BASE_OF[base[1000]])
    assert r.alts[0][off] == chr(_BASE_OF[alt[1000]])
    assert r.genotypes["alt.c"] == 1


def test_vcf_calls_insertion_deletion():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 4, 3000).astype(np.uint8)
    ins = np.concatenate([base[:1500],
                          rng.integers(0, 4, 40).astype(np.uint8),
                          base[1500:]])
    seqs = {"ref.c": Sequence("ref.c", base),
            "smp.c": Sequence("smp.c", ins)}
    caf = _star_caf(seqs)
    g = pgraph.build_graph(caf, seqs)
    recs = pvcf.vcf_records(g, "ref.c")
    ins_recs = [r for r in recs if len(r.alts[0]) > len(r.ref)]
    assert any(len(r.alts[0]) - len(r.ref) >= 35 for r in ins_recs)

    dele = np.concatenate([base[:1200], base[1260:]])
    seqs2 = {"ref.c": Sequence("ref.c", base),
             "smp.c": Sequence("smp.c", dele)}
    caf2 = _star_caf(seqs2)
    g2 = pgraph.build_graph(caf2, seqs2)
    recs2 = pvcf.vcf_records(g2, "ref.c")
    del_recs = [r for r in recs2 if len(r.ref) > len(r.alts[0])]
    assert any(len(r.ref) - len(r.alts[0]) >= 50 for r in del_recs)


def test_cli_pangenome(tmp_path):
    from cactus_tpu import cli
    tree = parse_newick("(a:0.02,b:0.02,c:0.02)root;")
    sim = evolver.simulate(tree, root_len=4000, seed=23)
    seqfile = evolver.write_seqfile(sim, str(tmp_path / "in"))
    out = str(tmp_path / "pan")
    assert cli.main(["pangenome", seqfile, out, "--reference", "a"]) == 0
    assert os.path.getsize(out + "/pangenome.gfa") > 0
    vcf_lines = open(out + "/pangenome.vcf").read().splitlines()
    assert vcf_lines[0].startswith("##fileformat")
    assert any(not l.startswith("#") for l in vcf_lines)
