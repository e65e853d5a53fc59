"""Durable HAL archive: roundtrip, stats, validate, dupes, maf walk."""

import numpy as np
import pytest

from cactus_tpu import progressive
from cactus_tpu.hal_archive import HalArchive
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.phases import hal as hal_mod
from cactus_tpu.testutil import evolver
from cactus_tpu.testutil.comparator import maf_pairs_arr
from cactus_tpu.utils.trees import parse_newick


@pytest.fixture(scope="module")
def aligned():
    tree = parse_newick("((a:0.03,b:0.03)ab:0.03,c:0.06)root;")
    sim = evolver.simulate(tree, root_len=8_000, seed=33,
                           duplication_rate=0.0003)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ["a", "b", "c"]}
    result = progressive.ProgressiveAligner(
        tree, genomes, min_chain_override=64).run()
    return sim, result


@pytest.fixture()
def archive(aligned, tmp_path):
    _sim, result = aligned
    path = str(tmp_path / "aln.hal")
    HalArchive.from_result(path, result)
    return HalArchive.open(path), result


def test_dna_roundtrip(archive):
    arc, result = archive
    for ev, genome in result.genomes.items():
        got = arc.dna(ev)
        assert set(got) == set(genome)
        for name, seq in genome.items():
            assert np.array_equal(got[name].codes % 4 + 4 *
                                  (got[name].codes >= 4),
                                  seq.codes % 4 + 4 * (seq.codes >= 4))


def test_hierarchy_and_stats(archive):
    arc, result = archive
    assert set(arc.genomes()) == set(result.genomes)
    assert arc.parent("a") == "ab"
    assert arc.parent("ab") == "root"
    assert arc.parent("root") is None
    assert set(arc.children("root")) == {"ab", "c"}
    rows = {r["genome"]: r for r in arc.stats()}
    mem = {r["genome"]: r for r in hal_mod.hal_stats(result)}
    for ev in result.genomes:
        assert rows[ev]["length"] == mem[ev]["length"]
        assert rows[ev]["n_sequences"] == mem[ev]["n_sequences"]
        assert rows[ev]["n_bottom_segments"] == mem[ev]["n_bottom_segments"]
    # every non-root genome has top segments
    for ev in ["a", "b", "c", "ab"]:
        assert rows[ev]["n_top_segments"] > 0


def test_validate_clean(archive):
    arc, _ = archive
    assert arc.validate() == []


def test_validate_catches_corruption(archive, tmp_path):
    arc, _ = archive
    # corrupt: shrink a sequence length in the TOC
    arc.toc["genomes"]["a"]["sequences"][0][1] -= 50
    assert any("out of bounds" in e or "tile" in e
               for e in arc.validate())


def test_hal2maf_matches_memory_walk(archive):
    arc, result = archive
    blocks_arc = arc.hal2maf(ref_genome="root")
    blocks_mem = hal_mod.hal2maf(result, ref_genome="root")
    for x, y in [("a", "b"), ("a", "c"), ("root", "a")]:
        pa = np.sort(maf_pairs_arr(blocks_arc, x, y))
        pm = np.sort(maf_pairs_arr(blocks_mem, x, y))
        assert np.array_equal(pa, pm), (x, y, len(pa), len(pm))


def test_hal2maf_subrange(archive):
    arc, result = archive
    name = next(iter(result.genomes["root"]))
    full = arc.hal2maf(ref_genome="root")
    sub = arc.hal2maf(ref_genome="root", ref_seq=name,
                      ref_start=1000, ref_end=3000)
    assert sub
    for blk in sub:
        r = blk.rows[0]
        assert r.src == name
        assert r.start >= 1000 and r.start + r.size <= 3000
    # pairs in the subrange are a subset of the full walk
    pa = set(maf_pairs_arr(sub, "a", "b").tolist())
    pf = set(maf_pairs_arr(full, "a", "b").tolist())
    assert pa <= pf


def test_remove_dupes(archive):
    arc, _ = archive
    # duplicate every aligned top segment of 'a' by hand, then dedupe
    tp = np.asarray(arc._load("a", "top_parent"))
    n_aligned = int((tp >= 0).sum())
    demoted = arc.remove_dupes("a")
    assert demoted == 0          # archive already one-to-one or dupes real
    # now fabricate a duplicate: point every segment at the first block
    si = np.asarray(arc._load("a", "top_seq"))
    st = np.asarray(arc._load("a", "top_start"))
    ln = np.asarray(arc._load("a", "top_len"))
    orient = np.asarray(arc._load("a", "top_orient"))
    tp2 = tp.copy()
    first = tp2[tp2 >= 0][0]
    tp2[tp2 >= 0] = first
    arc.set_top("a", si, st, ln, tp2, orient)
    assert arc.remove_dupes("a") == n_aligned - 1
    tp3 = np.asarray(arc._load("a", "top_parent"))
    assert int((tp3 >= 0).sum()) == 1


def test_append_is_durable(aligned, tmp_path):
    _sim, result = aligned
    path = str(tmp_path / "grow.hal")
    arc = HalArchive.create(path, newick=result.tree.to_newick())
    # append root subtree only, reopen, then append ab's subtree
    root_step = result.steps["root"]
    arc.append_subtree(root_step, result.genomes["root"],
                       {"ab": result.genomes["ab"],
                        "c": result.genomes["c"]})
    arc2 = HalArchive.open(path)
    assert set(arc2.genomes()) == {"root", "ab", "c"}
    arc2.append_subtree(result.steps["ab"], result.genomes["ab"],
                        {"a": result.genomes["a"],
                         "b": result.genomes["b"]})
    arc3 = HalArchive.open(path)
    assert set(arc3.genomes()) == {"root", "ab", "c", "a", "b"}
    assert arc3.validate() == []
    assert arc3.parent("a") == "ab"


def test_metadata_roundtrip(archive):
    arc, _ = archive
    arc.set_metadata("commit", "abc123")
    arc.set_metadata("config", {"preset": "four"})
    from cactus_tpu.hal_archive import HalArchive
    arc2 = HalArchive.open(arc.path)
    assert arc2.get_metadata("commit") == "abc123"
    assert arc2.get_metadata("config") == {"preset": "four"}
    assert "commit" in arc2.get_metadata()
    # archive still valid after TOC rewrites
    assert arc2.validate() == []


def test_resource_model():
    from cactus_tpu.utils.resources import (estimate_consolidated_memory,
                                            estimate_disk)
    gb = 1 << 30
    assert estimate_consolidated_memory(10_000_000) == 16 * gb
    assert estimate_consolidated_memory(50_000_000) == 64 * gb
    # interpolation between 10Mb and 50Mb
    mid = estimate_consolidated_memory(30_000_000)
    assert 16 * gb < mid < 64 * gb
    # extrapolation beyond the table grows
    assert estimate_consolidated_memory(25_000_000_000) > \
        estimate_consolidated_memory(20_000_000_000)
    # core scaling
    assert estimate_consolidated_memory(10_000_000, cores=2) > 16 * gb
    assert estimate_disk(100, 10) == 520


def test_liftover_matches_truth(archive, aligned):
    """halLiftover analog: a→b runs agree with the simulator's truth
    base map on most mapped positions."""
    sim, _result = aligned
    arc, _ = archive
    runs = arc.liftover("a", [("a.c", 1000, 3000)], "b")
    assert runs, "no liftover runs produced"
    truth = {(int(p), int(q)) for p, q, _s in sim.truth_pairs("a", "b")}
    good = total = 0
    for sname, s0, dname, d0, L, strand in runs:
        assert sname == "a.c" and dname == "b.c"
        for k in range(L):
            dpos = d0 + k if strand == 1 else d0 + L - 1 - k
            total += 1
            good += (s0 + k, dpos) in truth
    assert total > 1000
    assert good / total > 0.9, (good, total)


def test_liftover_roundtrip(archive):
    """a→b→a maps back onto the original interval."""
    arc, _ = archive
    fwd = arc.liftover("a", [("a.c", 2000, 2500)], "b")
    back_ivals = [(d, d0, d0 + L) for _s, _s0, d, d0, L, _o in fwd]
    back = arc.liftover("b", back_ivals, "a")
    covered = np.zeros(9000, bool)
    for _sn, _s0, dn, d0, L, _o in back:
        assert dn == "a.c"
        covered[d0:d0 + L] = True
    frac = covered[2000:2500].mean()
    assert frac > 0.9, frac


def test_liftover_to_ancestor_and_snps(archive, aligned):
    """Liftover to the ancestor works (up-only path) and halSnps finds
    the right order of magnitude of substitutions."""
    sim, _result = aligned
    arc, _ = archive
    runs = arc.liftover("a", [("a.c", 0, 4000)], "ab")
    assert sum(r[4] for r in runs) > 3000
    snp = arc.snps("a", "b", intervals=[("a.c", 0, 8000)])
    # ~2*0.03 divergence on ~8kb: expect hundreds, not zero / not all
    assert 50 < len(snp) < 2000, len(snp)
    # reported bases must really differ in the inputs
    for sname, spos, sbase, dname, dpos, dbase in snp[:50]:
        assert sbase != dbase


def test_summarize_mutations(archive, aligned):
    """halSummarizeMutations analog: branch rows with plausible counts
    (subs scale with branch length; indel bp nonzero on sim branches)."""
    sim, _result = aligned
    arc, _ = archive
    rows = {r["genome"]: r for r in arc.summarize_mutations()}
    assert set(rows) >= {"a", "b", "c", "ab"}
    for ev in ("a", "b"):
        r = rows[ev]
        assert r["parent"] == "ab"
        assert r["aligned_bp"] > 6000
        # JC 0.03 on ~8kb: expect roughly 100-400 substitutions
        assert 50 < r["subs"] < 700, r
        assert r["ins_bp"] >= 0 and r["del_bp"] >= 0
    # c is twice as divergent from root as a is from ab
    assert rows["c"]["subs"] > rows["a"]["subs"]


def test_liftover_agrees_with_maf_walk(archive):
    """Every liftover pair appears in the hal2maf column pairing — the
    two independent hierarchy walks must describe the same alignment."""
    from cactus_tpu.testutil.comparator import maf_pairs
    arc, _ = archive
    blocks = arc.hal2maf(ref_genome="root")
    maf_ab = {(p, q) for p, q, _s in maf_pairs(blocks, "a", "b")}
    runs = arc.liftover("a", [("a.c", 500, 3500)], "b")
    tot = good = 0
    for _sn, s0, _dn, d0, L, strand in runs:
        for k in range(L):
            dp = d0 + k if strand == 1 else d0 + L - 1 - k
            tot += 1
            good += (s0 + k, dp) in maf_ab
    assert tot > 1500
    assert good / tot > 0.98, (good, tot)
