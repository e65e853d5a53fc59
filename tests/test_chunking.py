"""Chunked alignment: rebasing + dedup reproduces unchunked accuracy."""

import numpy as np

from cactus_tpu.config import BlastParams
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.phases import blast, chunking
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


def test_chunk_sequence_tiling():
    seq = Sequence("s", np.arange(100, dtype=np.uint8) % 4)
    chunks = chunking.chunk_sequence("s", seq, chunk_size=40, overlap=10)
    assert [c.offset for c in chunks] == [0, 30, 60]
    assert [len(c.seq) for c in chunks] == [40, 40, 40]
    assert chunks[0].core_start == 0
    assert all(c.core_start == 10 for c in chunks[1:])
    # reconstruction from cores
    rebuilt = np.concatenate(
        [c.seq.codes[c.core_start:] for c in chunks])
    assert np.array_equal(rebuilt, seq.codes)


def test_small_sequence_single_chunk():
    seq = Sequence("s", np.zeros(20, np.uint8))
    chunks = chunking.chunk_sequence("s", seq, chunk_size=40, overlap=10)
    assert len(chunks) == 1
    assert chunks[0].name == "s"


def test_chunked_matches_unchunked():
    tree = parse_newick("(a:0.04,b:0.04)root;")
    sim = evolver.simulate(tree, root_len=30_000, seed=6)
    qa = Sequence("a.c", sim.genomes["a"].codes)
    tb = Sequence("b.c", sim.genomes["b"].codes)
    truth = {(p, q) for p, q, _ in sim.truth_pairs("a", "b")}
    cfg = BlastParams()

    def score(recs):
        pred = set()
        for r in blast.mark_primaries(recs):
            if r.is_primary:
                pred.update(r.aligned_pairs())
        inter = len(truth & pred)
        return inter / len(truth), inter / len(pred)

    plain = blast.align_contig_pair(qa, tb, "a.c", "b.c", cfg,
                                    preset="one")
    r0, p0 = score(plain)
    chunked = chunking.align_genomes_chunked(
        {"a.c": qa}, {"b.c": tb}, cfg, preset="one",
        chunk_size=8_000, overlap=1_000)
    # every rebased coordinate must be in-range on the full sequences
    for r in chunked:
        assert 0 <= r.qstart < r.qend <= len(qa)
        assert 0 <= r.tstart < r.tend <= len(tb)
        assert r.qlen == len(qa) and r.tlen == len(tb)
    r1, p1 = score(chunked)
    assert r1 > r0 - 0.03, (r0, r1)
    assert p1 > 0.9, p1
