"""Preprocessor: k-mer repeat masking, header hygiene, assembly stats."""

import numpy as np
import pytest

from cactus_tpu.io.fasta import Sequence
from cactus_tpu.preprocessor import masking, headers, stats


def test_kmer_mask_finds_repeats():
    rng = np.random.default_rng(0)
    background = rng.integers(0, 4, 5000).astype(np.uint8)
    repeat = rng.integers(0, 4, 100).astype(np.uint8)
    # plant the repeat 20 times
    codes = background.copy()
    positions = np.arange(20) * 220
    for p in positions:
        codes[p:p + 100] = repeat
    mask = masking.kmer_counts_mask(codes, k=13, max_count=8)
    # repeat copies must be masked, unique background mostly not
    in_repeat = np.zeros(len(codes), bool)
    for p in positions:
        in_repeat[p:p + 100] = True
    assert mask[in_repeat].mean() > 0.9
    assert mask[~in_repeat].mean() < 0.2


def test_mask_respected_by_seeding():
    """Masked positions produce no seeds but can still be aligned over."""
    from cactus_tpu.config import BlastParams
    from cactus_tpu.phases import blast
    rng = np.random.default_rng(1)
    s = rng.integers(0, 4, 3000).astype(np.uint8)
    full = Sequence("a", s)
    # mask everything → no anchors at all
    masked = Sequence("a", s, mask=np.ones(len(s), bool))
    recs = blast.align_contig_pair(masked, Sequence("b", s.copy()),
                                   "A.a", "B.b", BlastParams())
    assert not recs
    recs2 = blast.align_contig_pair(full, Sequence("b", s.copy()),
                                    "A.a", "B.b", BlastParams())
    assert recs2


def test_hardmask_and_unmask():
    s = Sequence("x", np.array([0, 1, 2, 3], np.uint8),
                 mask=np.array([True, False, True, False]))
    h = masking.hardmask(s)
    assert h.codes.tolist() == [4, 1, 4, 3]
    over = Sequence("y", np.zeros(10, np.uint8), mask=np.ones(10, bool))
    rescued = masking.unmask_if_overmasked(over)
    assert not rescued.mask.any()


def test_sanitize_genome():
    g = {"chr1": Sequence.from_string("chr1", "ACGT",
                                      header="chr1 some description"),
         "chr2": Sequence.from_string("chr2", "GGCC")}
    out = headers.sanitize_genome("ev", g)
    assert set(out) == {"ev.chr1", "ev.chr2"}
    dup = {"a": Sequence.from_string("a", "AC", header="x"),
           "b": Sequence.from_string("b", "GT", header="x")}
    with pytest.raises(ValueError, match="duplicate"):
        headers.sanitize_genome("ev", dup)


def test_assembly_stats():
    g = {"a": Sequence("a", np.zeros(100, np.uint8)),
         "b": Sequence("b", np.zeros(50, np.uint8),
                       mask=np.ones(50, bool)),
         "c": Sequence("c", np.full(10, 4, np.uint8))}
    st = stats.assembly_stats(g)
    assert st["n_sequences"] == 3
    assert st["total_length"] == 160
    assert st["n50"] == 100
    assert st["masked_bases"] == 50
    assert st["n_bases"] == 10


def test_cli_preprocess(tmp_path):
    from cactus_tpu import cli
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick
    tree = parse_newick("(a:0.02,b:0.02)root;")
    sim = evolver.simulate(tree, root_len=2000, seed=9)
    seqfile = evolver.write_seqfile(sim, str(tmp_path / "in"))
    out = str(tmp_path / "prep")
    assert cli.main(["preprocess", seqfile, out]) == 0
    import os
    from cactus_tpu.io.fasta import read_fasta
    seqs = read_fasta(os.path.join(out, "a.fa"))
    assert any(n.startswith("a.") for n in seqs)
