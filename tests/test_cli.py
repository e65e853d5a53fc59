"""CLI + store: seqfile → align → resume → hal2maf/stats round trip."""

import json
import os

import numpy as np
import pytest

from cactus_tpu import cli
from cactus_tpu.store import AlignmentStore
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


@pytest.fixture(scope="module")
def sim_dir(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("sim")
    tree = parse_newick("((a:0.04,b:0.04)ab:0.04,c:0.08)root;")
    sim = evolver.simulate(tree, root_len=6_000, seed=41)
    seqfile = evolver.write_seqfile(sim, str(outdir))
    return sim, seqfile, outdir


def test_cli_align_and_artifacts(sim_dir, tmp_path):
    sim, seqfile, _d = sim_dir
    out = str(tmp_path / "aln")
    maf = str(tmp_path / "out.maf")
    rc = cli.main(["align", seqfile, out, "--maf", maf,
                   "--min-chain", "64"])
    assert rc == 0
    assert os.path.exists(out + "/stats.json")
    assert os.path.exists(maf)
    stats = {r["genome"]: r for r in json.load(open(out + "/stats.json"))}
    assert stats["root"]["n_bottom_segments"] > 0
    c2h = os.listdir(out + "/c2h")
    assert any(f.endswith(".c2h") for f in c2h)
    assert any(f.endswith(".hal.fa") for f in c2h)

    # MAF quality straight from the file
    from cactus_tpu.testutil.comparator import maf_pairs, score_pairs
    from cactus_tpu.io.maf import read_maf
    blocks = list(read_maf(maf))
    truth = {(p, q, s) for p, q, s in sim.truth_pairs("a", "b")}
    s = score_pairs(truth, maf_pairs(blocks, "a", "b"))
    assert s.recall > 0.85 and s.precision > 0.85, s

    # store round-trip: hal2maf + stats commands work off the store
    maf2 = str(tmp_path / "out2.maf")
    assert cli.main(["hal2maf", out, maf2]) == 0
    assert os.path.getsize(maf2) > 0
    assert cli.main(["stats", out]) == 0


def test_cli_align_resume(sim_dir, tmp_path, capsys):
    _sim, seqfile, _d = sim_dir
    out = str(tmp_path / "aln")
    assert cli.main(["align", seqfile, out, "--min-chain", "64"]) == 0
    # second run must resume every ancestor from the store
    assert cli.main(["align", seqfile, out, "--min-chain", "64"]) == 0
    err = capsys.readouterr().err
    assert err.count("resumed from store") >= 2


def test_cli_blast_paf(sim_dir, tmp_path):
    _sim, seqfile, _d = sim_dir
    out = str(tmp_path / "out.paf")
    assert cli.main(["blast", seqfile, out, "--events", "a,b",
                     "--preset", "one"]) == 0
    from cactus_tpu.io.paf import read_paf
    recs = read_paf(out)
    assert recs
    assert any(r.is_primary for r in recs)


def test_store_roundtrip_equivalence(sim_dir, tmp_path):
    """Loaded result reproduces the same leaf pairs as the in-memory one."""
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu import progressive
    sim, _seqfile, _d = sim_dir
    leaves = ["a", "b", "c"]
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in leaves}
    tree = parse_newick("((a:0.04,b:0.04)ab:0.04,c:0.08)root;")
    store = AlignmentStore(str(tmp_path / "store"))
    res = progressive.ProgressiveAligner(
        tree, genomes, min_chain_override=64, store=store).run()
    res2 = store.load_result()
    for x, y in [("a", "b"), ("a", "c")]:
        p1 = progressive.leaf_pairs(res, x, y)
        p2 = progressive.leaf_pairs(res2, x, y)
        assert p1 == p2


def test_cli_hal_archive_tools(sim_dir, tmp_path, capsys):
    _sim, seqfile, _d = sim_dir
    out = str(tmp_path / "aln")
    hal = str(tmp_path / "aln.hal")
    assert cli.main(["align", seqfile, out, "--hal", hal,
                     "--min-chain", "64"]) == 0
    assert os.path.getsize(hal) > 0
    assert cli.main(["hal", "validate", hal]) == 0
    assert cli.main(["hal", "stats", hal]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l]
    assert any(l.startswith("root\t") for l in lines)
    fa = str(tmp_path / "a.fa")
    assert cli.main(["hal", "fasta", hal, "--genome", "a",
                     "--out", fa]) == 0
    assert os.path.getsize(fa) > 0
    maf = str(tmp_path / "arc.maf")
    assert cli.main(["hal", "maf", hal, "--genome", "root",
                     "--out", maf]) == 0
    assert os.path.getsize(maf) > 0
    assert cli.main(["hal", "removeDupes", hal, "--genome", "a"]) == 0
    assert cli.main(["hal", "validate", hal]) == 0


def test_align_root_subtree(tmp_path):
    """`align --root ab` computes only the ab subtree (cactus --root)."""
    import os
    from cactus_tpu import cli
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick
    tree = parse_newick("((a:0.03,b:0.03)ab:0.03,c:0.06)root;")
    sim = evolver.simulate(tree, root_len=3000, seed=13)
    seqfile = evolver.write_seqfile(sim, str(tmp_path / "in"))
    out = str(tmp_path / "sub")
    maf = str(tmp_path / "sub.maf")
    assert cli.main(["align", seqfile, out, "--root", "ab",
                     "--maf", maf, "--min-chain", "64"]) == 0
    assert os.path.exists(os.path.join(out, "steps", "ab.npz"))
    assert not os.path.exists(os.path.join(out, "steps", "root.npz"))
    text = open(maf).read()
    assert "ab." in text and "c.c" not in text


def test_cli_new_entrypoint_verbs(sim_dir, tmp_path):
    """maf2bigmaf / hal2seqfile / hal append / patch — the remaining
    reference console entry points (setup.py:41-65) as CLI verbs."""
    sim, seqfile, _d = sim_dir
    out = str(tmp_path / "aln")
    maf = str(tmp_path / "o.maf")
    assert cli.main(["align", seqfile, out, "--maf", maf,
                     "--min-chain", "64"]) == 0

    # maf2bigmaf
    big = str(tmp_path / "o.bigmaf.txt")
    assert cli.main(["maf2bigmaf", maf, big, "--ref-genome", "root"]) == 0
    assert os.path.getsize(big) > 0 and os.path.exists(big + ".as")

    # hal2seqfile
    sfdir = str(tmp_path / "sf")
    assert cli.main(["hal2seqfile", out, sfdir, "--leaves-only"]) == 0
    lines = open(os.path.join(sfdir, "seqfile.txt")).read().splitlines()
    assert lines[0].endswith(";")                     # newick
    names = {l.split()[0] for l in lines[1:]}
    assert names == {"a", "b", "c"}
    for l in lines[1:]:
        assert os.path.exists(l.split()[1])

    # hal append: start an empty archive, append the root subtree
    from cactus_tpu.hal_archive import HalArchive
    store = AlignmentStore(out)
    result = store.load_result()
    arc_path = str(tmp_path / "t.hal")
    HalArchive.create(arc_path, newick=result.tree.to_newick())
    assert cli.main(["hal", "append", arc_path, "--store", out,
                     "--genome", "root"]) == 0
    arc = HalArchive.open(arc_path)
    assert "root" in arc.genomes()

    # patch: pangenome graph, then patch one haplotype along another
    pan = str(tmp_path / "pan")
    assert cli.main(["pangenome", seqfile, pan, "--min-chain", "64"]) == 0
    pdir = str(tmp_path / "patched")
    assert cli.main(["patch", os.path.join(pan, "pangenome.gfa"),
                     "a", pdir, "--donors", "b"]) == 0
    assert os.path.exists(os.path.join(pdir, "a.patched.fa"))
    assert os.path.exists(os.path.join(pdir, "patch_report.json"))


def test_cli_pangenome_staged(sim_dir, tmp_path):
    """--mode sv --stage X runs one stage per invocation; final
    artifacts match the monolithic sv run byte-for-byte."""
    _sim, seqfile, _d = sim_dir
    mono = str(tmp_path / "mono")
    assert cli.main(["pangenome", seqfile, mono, "--mode", "sv",
                     "--min-chain", "64"]) == 0
    staged = str(tmp_path / "staged")
    for st in ["minigraph", "graphmap", "align", "join"]:
        assert cli.main(["pangenome", seqfile, staged, "--mode", "sv",
                         "--min-chain", "64", "--stage", st]) == 0
    for f in ["pangenome.gfa", "pangenome.vcf"]:
        assert (open(os.path.join(mono, f), "rb").read()
                == open(os.path.join(staged, f), "rb").read()), f


def test_cli_conservation_tracks(sim_dir, tmp_path):
    """conservation verb: LRT method, per---subtree tracks, bigwig out
    (cactus_phast.py:81,158-165 parity surface)."""
    sim, seqfile, outdir = sim_dir
    store = str(tmp_path / "cons.store")
    assert cli.main(["align", seqfile, store, "--min-chain", "64"]) == 0
    wig = str(tmp_path / "cons.wig")
    rc = cli.main(["conservation", store, wig,
                   "--method", "LRT", "--mode", "CONACC",
                   "--subtree", "ab", "root", "--bigwig"])
    assert rc == 0
    import os
    assert os.path.getsize(wig) > 0                  # root track
    assert os.path.getsize(wig + ".ab.wig") > 0      # lineage track
    assert os.path.getsize(wig + ".bw") > 0
    from cactus_tpu.io.bigwig import read_bigwig
    data, sizes = read_bigwig(wig + ".bw")
    assert data and all(len(v[0]) for v in data.values())
