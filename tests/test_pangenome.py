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


def test_cli_pangenome_modes(tmp_path):
    """--mode sv / refmap are CLI-reachable and emit the tier set."""
    from cactus_tpu import cli
    tree = parse_newick("(a:0.02,b:0.02,c:0.02)root;")
    sim = evolver.simulate(tree, root_len=3000, seed=29)
    seqfile = evolver.write_seqfile(sim, str(tmp_path / "in"))
    out = str(tmp_path / "rm")
    assert cli.main(["pangenome", seqfile, out, "--reference", "a",
                     "--mode", "refmap", "--no-viz"]) == 0
    assert os.path.getsize(out + "/pangenome.gfa") > 0
    assert os.path.getsize(out + "/pangenome.gbz") > 0


def test_normalize_collapses_shared_affixes(small_graph):
    """Shared-affix collapse shrinks total node bases and preserves every
    walk's spelling (GFAffix analog; vg validate invariant)."""
    import copy
    from cactus_tpu.pangenome.normalize import collapse_shared_affixes
    _sim, seqs, g = small_graph
    g2 = copy.deepcopy(g)
    before = sum(g2.node_len(v) for v in range(g2.n_nodes))
    collapse_shared_affixes(g2)
    after = sum(g2.node_len(v) for v in range(g2.n_nodes))
    g2.validate(seqs)
    assert after <= before


def test_normalize_handcrafted_bubble():
    """Two bubble arms GATTC / GATTA share the GATT prefix: after
    normalization it lives in ONE node and the arms shrink to SNP-size."""
    from cactus_tpu.io.fasta import _CODE_OF
    from cactus_tpu.pangenome.graph import PanGraph
    from cactus_tpu.pangenome.normalize import collapse_shared_affixes

    def codes(s):
        return np.array([_CODE_OF[ord(c)] for c in s], dtype=np.uint8)

    node_seq = [codes("CC"), codes("GATTC"), codes("GATTA"), codes("TT")]
    walks = {"x": [(0, 1), (1, 1), (3, 1)],
             "y": [(0, 1), (2, 1), (3, 1)]}
    g = PanGraph(node_seq=node_seq, walks=walks,
                 node_block=[-1, 0, 0, -1])
    seqs = {"x": Sequence("x", codes("CCGATTCTT")),
            "y": Sequence("y", codes("CCGATTATT"))}
    g.validate(seqs)
    collapse_shared_affixes(g)
    g.validate(seqs)
    lens = sorted(g.node_len(v) for v in range(g.n_nodes))
    # CC, GATT, C, A, TT
    assert lens == [1, 1, 2, 2, 4], lens


def test_clip_tier_closure(small_graph):
    """Clip removes long private insert nodes; fragments + bed tile every
    input base (the exclusion-report closure invariant)."""
    from cactus_tpu.pangenome.graph import clip_graph
    _sim, seqs, g = small_graph
    clipped, bed = clip_graph(g, max_unaligned=50)
    for name, seq in seqs.items():
        frag_bp = sum(
            sum(clipped.node_len(v) for v, _o in w)
            for n, w in clipped.walks.items()
            if n == name or n.startswith(name + ":"))
        bed_bp = sum(b - a for a, b in bed.get(name, []))
        assert frag_bp + bed_bp == len(seq), name


def test_nested_vcf_lv_levels():
    """A SNP inside a region one haplotype deletes gets LV=1; the
    deletion stays LV=0 (vg deconstruct nesting)."""
    from cactus_tpu.io.fasta import _CODE_OF
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 3000).astype(np.uint8)
    snp = ref.copy()
    snp[1500] = (snp[1500] + 1) % 4          # SNP mid-region
    dele = np.concatenate([ref[:1200], ref[1800:]])  # deletes [1200,1800)
    seq_dict = {
        "ref.c": Sequence("ref.c", ref),
        "snp.c": Sequence("snp.c", snp),
        "del.c": Sequence("del.c", dele),
    }
    caf = _star_caf(seq_dict)
    g = pgraph.build_graph(caf, seq_dict)
    g.validate(seq_dict)
    # deconstruct runs on the NORMALIZED graph (as graphmap-join does):
    # un-normalized bubbles hide SNPs inside long parallel arms
    from cactus_tpu.pangenome.normalize import collapse_shared_affixes
    collapse_shared_affixes(g)
    g.validate(seq_dict)
    recs = pvcf.vcf_records_nested(g, "ref.c")
    snps = [r for r in recs if len(r.ref) == len(r.alts[0])
            and r.genotypes.get("snp.c")]
    dels = [r for r in recs if len(r.ref) - max(len(a) for a in r.alts) > 500]
    assert dels, recs
    assert dels[0].lv == 0
    assert snps, recs
    inside = [r for r in snps if dels[0].pos <= r.pos
              < dels[0].pos + len(dels[0].ref)]
    assert inside and all(r.lv >= 1 for r in inside), snps


def test_pangenome_split_by_chromosome(tmp_path):
    """Two reference chromosomes: contigs route to the right chromosome
    and per-chromosome graphs build (graphmap-split + align --batch)."""
    from cactus_tpu.pangenome.driver import run_pangenome_split
    rng = np.random.default_rng(9)
    chr1 = rng.integers(0, 4, 8000).astype(np.uint8)
    chr2 = rng.integers(0, 4, 8000).astype(np.uint8)

    def mutate(x, seed):
        r = np.random.default_rng(seed)
        m = r.random(len(x)) < 0.02
        return np.where(m, (x + 1) % 4, x).astype(np.uint8)

    genomes = {
        "ref": {"ref.chr1": Sequence("ref.chr1", chr1),
                "ref.chr2": Sequence("ref.chr2", chr2)},
        "s1": {"s1.tig1": Sequence("s1.tig1", mutate(chr1, 1)),
               "s1.tig2": Sequence("s1.tig2", mutate(chr2, 2))},
        "s2": {"s2.tig1": Sequence("s2.tig1", mutate(chr1, 3)),
               "s2.junk": Sequence("s2.junk",
                                   rng.integers(0, 4, 3000).astype(np.uint8))},
    }
    out = str(tmp_path / "pan")
    stats = run_pangenome_split(genomes, "ref", out)
    assign = dict(l.split("\t") for l in
                  open(out + "/contig_assignment.tsv").read().splitlines())
    assert assign["s1.tig1"] == "ref.chr1"
    assert assign["s1.tig2"] == "ref.chr2"
    assert assign["s2.tig1"] == "ref.chr1"
    assert assign["s2.junk"] == "_AMBIGUOUS_"
    assert set(stats["chromosomes"]) == {"ref.chr1", "ref.chr2"}
    assert os.path.exists(out + "/ref.chr1/pangenome.gfa")
    assert os.path.exists(out + "/ref.chr2/pangenome.vcf")


def test_vcfbub_pops_giant_sites():
    from cactus_tpu.pangenome.vcf import VcfRecord, vcfbub
    giant = VcfRecord("ref", 100, "A" * 2000, ["A"], {"h1": 1}, lv=0)
    nested = VcfRecord("ref", 500, "ACG", ["A"], {"h2": 1}, lv=1)
    small = VcfRecord("ref", 5000, "AT", ["A"], {"h1": 1}, lv=0)
    deep_orphan = VcfRecord("ref", 9000, "AC", ["A"], {"h2": 1}, lv=1)
    out = vcfbub([giant, nested, small, deep_orphan],
                 max_level=0, max_ref_length=1000)
    assert small in out
    assert giant not in out          # popped: too long
    assert nested in out             # kept in place of its parent
    assert deep_orphan not in out    # nested without popped parent
    # no length limit: top-level only
    out2 = vcfbub([giant, nested, small, deep_orphan], max_level=0)
    assert giant in out2 and nested not in out2


def test_merge_duplicates_fuses_same_site():
    from cactus_tpu.pangenome.vcf import VcfRecord, merge_duplicates
    a = VcfRecord("ref", 10, "AC", ["A"], {"h1": 1})
    b = VcfRecord("ref", 10, "AC", ["ATC"], {"h2": 1})
    c = VcfRecord("ref", 10, "AC", ["A"], {"h3": 1})
    out = merge_duplicates([a, b, c])
    assert len(out) == 1
    m = out[0]
    assert m.alts == ["A", "ATC"]
    assert m.genotypes == {"h1": 1, "h2": 2, "h3": 1}


def test_build_graph_chop_shares_nodes():
    """chop=True yields vg-granularity nodes: haplotypes share the
    agreeing runs, and the walk-spelling invariant still holds."""
    import numpy as np
    from cactus_tpu.config import Config
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu.pangenome.graph import build_graph
    from cactus_tpu.phases.blast import align_genomes
    from cactus_tpu.phases.caf import run_caf
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, 6_000).astype(np.uint8)
    alt = base.copy()
    alt[::500] = (alt[::500] + 1) % 4        # sparse SNPs
    seqs = {"a.c": Sequence("a.c", base), "b.c": Sequence("b.c", alt)}
    cfg = Config.default()
    records = align_genomes({"c": seqs["a.c"]}, {"c": seqs["b.c"]},
                            "a", "b", cfg.blast)
    caf = run_caf(records, {n: len(s) for n, s in seqs.items()},
                  cfg.caf, ingroup_events={"a", "b"},
                  min_chain_override=64)
    coarse = build_graph(caf, seqs)
    fine = build_graph(caf, seqs, chop=True)
    fine.validate(seqs)
    shared_fine = set(v for v, _o in fine.walks["a.c"]) & \
        set(v for v, _o in fine.walks["b.c"])
    shared_coarse = set(v for v, _o in coarse.walks["a.c"]) & \
        set(v for v, _o in coarse.walks["b.c"])
    assert len(shared_fine) > len(shared_coarse)
    assert len(shared_fine) >= 5


def test_run_pangenome_refmap(tmp_path):
    """refmap tier: star-to-reference records only; bubbles still
    resolve transitively through the shared reference columns."""
    import os
    import numpy as np
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu.pangenome.driver import run_pangenome_refmap
    rng = np.random.default_rng(23)
    ref = rng.integers(0, 4, 8_000).astype(np.uint8)

    def hap(seed):
        r = np.random.default_rng(seed)
        out = ref.copy()
        hit = r.random(len(out)) < 0.01
        out[hit] = (out[hit] + r.integers(1, 4, int(hit.sum()))) % 4
        return out

    genomes = {
        "ref": {"ref.c": Sequence("ref.c", ref)},
        "h1": {"h1.c": Sequence("h1.c", hap(1))},
        "h2": {"h2.c": Sequence("h2.c", hap(2))},
    }
    out = str(tmp_path / "refmap")
    stats = run_pangenome_refmap(genomes, "ref", out)
    assert stats["n_paths"] == 3
    assert os.path.exists(os.path.join(out, "pangenome.gfa"))
    assert os.path.exists(os.path.join(out, "pangenome.vcf"))
    # SNP bubbles present: h1/h2 SNPs become sites in the VCF
    vcf = open(os.path.join(out, "pangenome.vcf")).read().splitlines()
    sites = [l for l in vcf if l and not l.startswith("#")]
    assert len(sites) > 20


def test_vcfwave_decomposes_complex_site():
    """A complex replacement realigns into primitive SNP + indel records
    with genotypes carried over (vcfwave analog)."""
    from cactus_tpu.pangenome.vcf import VcfRecord, vcfwave
    # REF ACGTACGT vs ALT ACCTACT: one SNP (G>C at pos+2) and one
    # deletion (G dropped near the tail)
    rec = VcfRecord("ref", 10, "ACGTACGT", ["ACCTACT"],
                    {"h1": 1, "h2": 0, "h3": None})
    out = vcfwave([rec])
    assert all(len(r.ref) == 1 or len(r.alts[0]) == 1 or
               len(r.ref) == len(r.alts[0]) == 1 for r in out)
    snps = [r for r in out if len(r.ref) == 1 and len(r.alts[0]) == 1]
    indels = [r for r in out if len(r.ref) != len(r.alts[0])]
    assert any(r.pos == 12 and r.ref == "G" and r.alts == ["C"]
               for r in snps)
    assert len(indels) == 1 and len(indels[0].ref) - \
        len(indels[0].alts[0]) == 1
    for r in out:
        assert r.genotypes["h1"] == 1
        assert r.genotypes["h2"] == 0
        assert r.genotypes["h3"] is None


def test_vcfwave_multiallelic_shared_primitive():
    """Two ALTs sharing a primitive map both samples to one allele."""
    from cactus_tpu.pangenome.vcf import VcfRecord, vcfwave
    # both alts carry the same A>T SNP at pos 20; alt2 adds a C>G at 22
    rec = VcfRecord("ref", 20, "AGCGG", ["TGCGG", "TGGGG"],
                    {"s1": 1, "s2": 2})
    out = vcfwave([rec])
    snp_at_20 = [r for r in out if r.pos == 20]
    assert len(snp_at_20) == 1
    r = snp_at_20[0]
    assert r.alts == ["T"] and r.genotypes == {"s1": 1, "s2": 1}
    snp_at_22 = [r for r in out if r.pos == 22]
    assert len(snp_at_22) == 1
    assert snp_at_22[0].genotypes == {"s1": 0, "s2": 1}


def test_vcfwave_leaves_primitives_and_left_shifts():
    from cactus_tpu.pangenome.vcf import VcfRecord, vcfwave
    snp = VcfRecord("ref", 5, "A", ["G"], {"s": 1})
    ins = VcfRecord("ref", 9, "T", ["TAC"], {"s": 1})
    out = vcfwave([snp, ins])
    assert [(r.pos, r.ref, tuple(r.alts)) for r in out] == \
        [(5, "A", ("G",)), (9, "T", ("TAC",))]


def test_filter_tier():
    """Allele-frequency filter (vg clip -d / --filter 2): nodes on <2
    samples drop unless on the reference backbone; walks fragment with
    absolute offsets; closure holds."""
    from cactus_tpu.io.fasta import _CODE_OF
    from cactus_tpu.pangenome.graph import PanGraph, filter_graph

    def codes(s):
        return np.array([_CODE_OF[ord(c)] for c in s], dtype=np.uint8)

    # shared CC -- private-to-y GAT -- shared TT; ref has private AA
    node_seq = [codes("CC"), codes("GAT"), codes("TT"), codes("AA")]
    walks = {"ref.c": [(0, 1), (3, 1), (2, 1)],
             "x.c":   [(0, 1), (2, 1)],
             "y.c":   [(0, 1), (1, 1), (2, 1)]}
    g = PanGraph(node_seq=node_seq, walks=walks,
                 node_block=[0, -1, 0, -1])
    filt, bed = filter_graph(g, min_depth=2, ref_sample="ref")
    # y's private GAT dropped, ref's private AA kept (backbone)
    assert bed == {"y.c": [(2, 5)]}
    assert "ref.c" in filt.walks and len(filt.walks["ref.c"]) == 3
    assert set(filt.walks) == {"ref.c", "x.c", "y.c:0-2", "y.c:5-7"}
    total = {n: sum(filt.node_len(v) for v, _o in w)
             for n, w in filt.walks.items()}
    assert total["y.c:0-2"] == 2 and total["y.c:5-7"] == 2


def test_clip_then_filter_absolute_offsets():
    """Filtering an already-clipped fragment composes offsets back to
    the ORIGINAL coordinate system."""
    from cactus_tpu.io.fasta import _CODE_OF
    from cactus_tpu.pangenome.graph import PanGraph, filter_graph

    def codes(s):
        return np.array([_CODE_OF[ord(c)] for c in s], dtype=np.uint8)

    # a clip-tier fragment starting at original offset 100
    node_seq = [codes("CC"), codes("GGG"), codes("TT")]
    walks = {"s.c:100-107": [(0, 1), (1, 1), (2, 1)],
             "t.c": [(0, 1), (2, 1)]}
    g = PanGraph(node_seq=node_seq, walks=walks, node_block=[0, -1, 0])
    filt, bed = filter_graph(g, min_depth=2)
    assert bed == {"s.c": [(102, 105)]}
    assert set(filt.walks) == {"s.c:100-102", "s.c:105-107", "t.c"}


def test_exclusions_report(small_graph):
    """Closure-checked per-sample exclusions table over clip+filter."""
    from cactus_tpu.pangenome.exclusions import (exclusions_report,
                                                 write_exclusions)
    from cactus_tpu.pangenome.graph import clip_graph, filter_graph
    import tempfile
    _sim, seqs, g = small_graph
    clipped, bed = clip_graph(g, max_unaligned=50)
    filt, fbed = filter_graph(clipped, min_depth=2, ref_sample="a")
    rep = exclusions_report(seqs, {"clip": (clipped, bed),
                                   "filter": (filt, fbed)})
    assert rep["totals"]["input_bp"] == sum(len(s) for s in seqs.values())
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ex.tsv")
        write_exclusions(p, rep)
        lines = open(p).read().splitlines()
        assert lines[0].startswith("#sample")
        assert len(lines) == 1 + len(seqs)


def test_viz_png(small_graph, tmp_path):
    """odgi-viz analog emits a structurally valid PNG."""
    import struct
    import zlib
    from cactus_tpu.pangenome.viz import render_1d, write_png
    _sim, _seqs, g = small_graph
    img = render_1d(g, ref_name="a.c", width=256)
    assert img.ndim == 3 and img.shape[2] == 3
    p = str(tmp_path / "g.png")
    write_png(p, img)
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    assert (h, w) == img.shape[:2]
    # IDAT decompresses to h*(1+3w) filtered bytes
    i = raw.index(b"IDAT")
    ln = struct.unpack(">I", raw[i - 4:i])[0]
    assert len(zlib.decompress(raw[i + 4:i + 4 + ln])) == h * (1 + 3 * w)


def test_layout2d_sgd(small_graph, tmp_path):
    """odgi layout analog: SGD layout beats the jittered init on
    sampled path-distance stress and roundtrips through .lay."""
    import numpy as np
    from cactus_tpu.pangenome.layout2d import (layout_2d, layout_stress,
                                               write_lay, read_lay, draw)
    _sim, _seqs, g = small_graph
    X = layout_2d(g, ref_name="a.c", iters=200, batch=1024, seed=3)
    assert X.shape == (2 * g.n_nodes, 2)
    assert np.isfinite(X).all()
    s = layout_stress(g, X, ref_name="a.c")
    assert s < 0.5, s
    # deterministic under a fixed seed
    X2 = layout_2d(g, ref_name="a.c", iters=200, batch=1024, seed=3)
    assert np.allclose(X, X2)
    lay = str(tmp_path / "g.lay.tsv")
    write_lay(lay, g, X)
    R = read_lay(lay)
    assert np.allclose(R, X, atol=5e-3)
    png = str(tmp_path / "g.draw.png")
    draw(g, X, png)
    assert open(png, "rb").read(8) == b"\x89PNG\r\n\x1a\n"


def test_sgd_sort(small_graph):
    """odgi sort analog: SGD 1D order is a permutation tracking the
    reference walk's visit order."""
    import numpy as np
    from cactus_tpu.pangenome.layout2d import sgd_sort
    _sim, _seqs, g = small_graph
    order = sgd_sort(g, ref_name="a.c", seed=0)
    assert sorted(order.tolist()) == list(range(g.n_nodes))
    rank = np.empty(g.n_nodes)
    rank[order] = np.arange(g.n_nodes)
    seen: set[int] = set()
    visit = [v for v, _o in g.walks["a.c"]
             if not (v in seen or seen.add(v))]
    r = np.corrcoef(np.arange(len(visit)), rank[visit])[0, 1]
    assert abs(r) > 0.8, r


def test_gfa_read_roundtrip(small_graph, tmp_path):
    """write_gfa → read_gfa reproduces node seqs and walks exactly, and
    the loaded graph spells the inputs (vg-consumption analog)."""
    from cactus_tpu.pangenome.graph import read_gfa, write_gfa
    _sim, seqs, g = small_graph
    p = str(tmp_path / "g.gfa")
    write_gfa(p, g, ref_name="a.c")
    g2 = read_gfa(p)
    assert g2.n_nodes == g.n_nodes
    for v in range(g.n_nodes):
        assert np.array_equal(g2.node_seq[v], g.node_seq[v])
    assert set(g2.walks) == set(g.walks)
    for name in g.walks:
        assert g2.walks[name] == list(g.walks[name])
    g2.validate(seqs)
    # the loaded graph feeds the index/viz tooling
    from cactus_tpu.pangenome.indexes import snarls
    assert isinstance(snarls(g2, "a.c"), list)
