"""Minigraph-equivalent SV graph + graphmap + sv-tier pangenome."""

import os

import numpy as np
import pytest

from cactus_tpu.io.fasta import Sequence
from cactus_tpu.pangenome import minigraph as mg
from cactus_tpu.pangenome.driver import run_pangenome_sv


def _seq(ev, name, codes):
    return Sequence(f"{ev}.{name}", np.asarray(codes, np.uint8))


@pytest.fixture(scope="module")
def sv_genomes():
    """Three haplotypes: hap1 = ref + 400bp insertion, hap2 = ref with a
    300bp deletion.  SNP noise so mapping is non-trivial."""
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, 12_000).astype(np.uint8)

    def mutate(codes, rate=0.01, seed=0):
        r = np.random.default_rng(seed)
        out = codes.copy()
        hit = r.random(len(out)) < rate
        out[hit] = (out[hit] + r.integers(1, 4, int(hit.sum()))) % 4
        return out

    ins = rng.integers(0, 4, 400).astype(np.uint8)
    hap1 = np.concatenate([mutate(ref[:6000], seed=1), ins,
                           mutate(ref[6000:], seed=2)])
    hap2 = np.concatenate([mutate(ref[:3000], seed=3),
                           mutate(ref[3300:], seed=4)])
    return {
        "ref": {"ref.c": _seq("ref", "c", ref)},
        "hap1": {"hap1.c": _seq("hap1", "c", hap1)},
        "hap2": {"hap2.c": _seq("hap2", "c", hap2)},
    }


def test_mash_order(sv_genomes):
    order = mg.mash_order(sv_genomes, "ref")
    assert order[0] == "ref"
    assert set(order) == {"ref", "hap1", "hap2"}
    # both haplotypes are measurably diverged but clearly related
    d1 = mg.mash_distance(mg.mash_sketch(sv_genomes["ref"]),
                          mg.mash_sketch(sv_genomes["hap1"]))
    d2 = mg.mash_distance(mg.mash_sketch(sv_genomes["ref"]),
                          mg.mash_sketch(sv_genomes["hap2"]))
    assert 0 < d1 < 0.2 and 0 < d2 < 0.2
    # identical genomes are at distance ~0
    assert mg.mash_distance(mg.mash_sketch(sv_genomes["ref"]),
                            mg.mash_sketch(sv_genomes["ref"])) == 0.0


def test_build_sv_graph_captures_insertion(sv_genomes):
    graph, order = mg.build_sv_graph(sv_genomes, "ref")
    assert order[0] == "ref"
    # backbone + at least the 400bp insertion node
    assert graph.n_nodes >= 2
    ranks = [r for (_sn, _so, r) in graph.node_stable]
    assert ranks[0] == 0
    new_nodes = [v for v in range(graph.n_nodes)
                 if graph.node_stable[v][2] > 0]
    assert new_nodes, "no SV nodes inserted"
    # the insertion allele (~400bp from hap1) is present
    sizes = [len(graph.node_seq[v]) for v in new_nodes]
    assert any(300 <= s <= 500 for s in sizes), sizes
    # small SNPs did NOT become nodes
    assert all(len(graph.node_seq[v]) >= 50 for v in new_nodes)
    # insertion node is wired to the backbone
    assert graph.edges


def test_rgfa_roundtrip(sv_genomes, tmp_path):
    graph, _ = mg.build_sv_graph(sv_genomes, "ref")
    p = str(tmp_path / "g.rgfa")
    graph.write_rgfa(p)
    lines = open(p).read().splitlines()
    s_lines = [l for l in lines if l.startswith("S\t")]
    assert len(s_lines) == graph.n_nodes
    assert all("SN:Z:" in l and "SO:i:" in l and "SR:i:" in l
               for l in s_lines)
    assert any(l.startswith("L\t") for l in lines)


def test_graphmap_covers_assemblies(sv_genomes):
    graph, _ = mg.build_sv_graph(sv_genomes, "ref")
    records = mg.graphmap(graph, sv_genomes)
    assert records
    by_event: dict[str, int] = {}
    for r in records:
        if not r.is_primary:
            continue
        assert r.tname.startswith("_MINIGRAPH_.s")
        ev = r.qname.split(".", 1)[0]
        by_event[ev] = by_event.get(ev, 0) + (r.qend - r.qstart)
    # every haplotype maps most of its length onto the graph
    for ev, genome in sv_genomes.items():
        total = sum(len(s) for s in genome.values())
        assert by_event.get(ev, 0) > 0.85 * total, (ev, by_event)


def test_del_filter():
    def rec(qs, qe, ts, te, score):
        r = mg.PafRecord("q", 100_000, qs, qe, "+", "_MINIGRAPH_.s1",
                         10**9, ts, te, qe - qs, qe - qs)
        r.set_tag("tp", "A", "P")
        r.set_tag("AS", "i", score)
        return r
    a = rec(0, 1000, 0, 1000, 5000)
    b = rec(1000, 1100, 50_000_000, 50_000_100, 90)
    kept = mg._apply_del_filter([a, b], del_filter=1_000_000)
    assert a in kept and b not in kept


def test_run_pangenome_sv_end_to_end(sv_genomes, tmp_path):
    out = str(tmp_path / "pan")
    stats = run_pangenome_sv(sv_genomes, "ref", out)
    assert stats["sv_graph"]["n_nodes"] >= 2
    for f in ["sv_graph.rgfa", "graphmap.paf", "pangenome.gfa",
              "pangenome.vcf", "graph_stats.json"]:
        assert os.path.exists(os.path.join(out, f)), f
    # the final base graph has bubbles (SNPs) and paths for haplotypes
    assert stats["n_paths"] == 3
    assert stats["n_nodes"] > 3


def test_sv_staged_equals_monolithic(sv_genomes, tmp_path):
    """Stage-decomposed sv runs (minigraph → graphmap → align → join as
    separate invocations over disk artifacts) are byte-identical to the
    monolithic run — the reference's step-by-step-vs-end-to-end
    yeastPangenome oracle (evolverTest.py:1404-1850)."""
    from cactus_tpu.pangenome.driver import (sv_stage_align,
                                             sv_stage_graphmap,
                                             sv_stage_join,
                                             sv_stage_minigraph)
    mono = str(tmp_path / "mono")
    run_pangenome_sv(sv_genomes, "ref", mono)
    staged = str(tmp_path / "staged")
    sv_stage_minigraph(sv_genomes, "ref", staged)
    sv_stage_graphmap(sv_genomes, staged)
    sv_stage_align(sv_genomes, staged)
    sv_stage_join(sv_genomes, "ref", staged)
    for f in ["sv_graph.rgfa", "graphmap.paf", "pangenome.raw.gfa",
              "pangenome.gfa", "pangenome.vcf", "pangenome.bub.vcf"]:
        a = open(os.path.join(mono, f), "rb").read()
        b = open(os.path.join(staged, f), "rb").read()
        assert a == b, f"{f} differs between staged and monolithic"
