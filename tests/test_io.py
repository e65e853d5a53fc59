import io

import numpy as np
import pytest

from cactus_tpu.io import fasta
from cactus_tpu.io.fasta import Sequence, read_fasta, write_fasta, revcomp
from cactus_tpu.io.paf import PafRecord, parse_cigar, format_cigar, merge_cigar
from cactus_tpu.io.maf import MafBlock, MafRow, read_maf, write_maf
from cactus_tpu.io.seqfile import SeqFile


def test_fasta_roundtrip(tmp_path):
    s = Sequence.from_string("chr1", "ACGTacgtNNacgT")
    assert s.to_string() == "ACGTacgtNNacgT"
    assert list(s.codes[:4]) == [0, 1, 2, 3]
    assert s.mask[4] and not s.mask[0]
    p = tmp_path / "x.fa"
    write_fasta(str(p), [s], line_width=5)
    back = read_fasta(str(p))
    assert back["chr1"].to_string() == "ACGTacgtNNacgT"


def test_fasta_hardmask(tmp_path):
    s = Sequence.from_string("c", "ACgt")
    p = tmp_path / "h.fa"
    write_fasta(str(p), [s], hardmask=True)
    assert read_fasta(str(p))["c"].to_string() == "ACNN"


def test_revcomp():
    s = Sequence.from_string("c", "ACGTN")
    rc = revcomp(s.codes)
    assert Sequence("r", rc).to_string() == "NACGT"


def test_pack_2bit():
    codes = Sequence.from_string("c", "ACGTNACG").codes
    packed, n_mask = fasta.pack_2bit(codes)
    out = fasta.unpack_2bit(packed, len(codes), n_mask)
    assert np.array_equal(out, codes)


def test_paf_roundtrip():
    rec = PafRecord("q", 100, 10, 60, "+", "t", 200, 20, 70, 45, 50)
    rec.cigar = [("M", 30), ("I", 5), ("M", 15), ("D", 5), ("M", 5)]
    rec.set_tag("AS", "i", 1234)
    line = rec.to_line()
    back = PafRecord.from_line(line)
    assert back.qname == "q" and back.tstart == 20
    assert back.cigar == rec.cigar
    assert back.score == 1234


def test_cigar_utils():
    assert parse_cigar("3M2I4D") == [("M", 3), ("I", 2), ("D", 4)]
    assert format_cigar([("M", 3), ("I", 2)]) == "3M2I"
    assert merge_cigar([("M", 3), ("M", 2), ("I", 0), ("D", 1)]) == [("M", 5), ("D", 1)]


def test_paf_aligned_pairs_forward():
    rec = PafRecord("q", 100, 10, 20, "+", "t", 200, 50, 58, 8, 10)
    rec.cigar = [("M", 4), ("I", 2), ("M", 2), ("D", 2), ("M", 2)]
    pairs = list(rec.aligned_pairs())
    assert pairs[0] == (10, 50)
    assert pairs[4] == (16, 54)
    assert pairs[-1] == (19, 59)


def test_paf_aligned_pairs_reverse():
    rec = PafRecord("q", 100, 10, 14, "-", "t", 200, 50, 54, 4, 4)
    rec.cigar = [("M", 4)]
    pairs = list(rec.aligned_pairs())
    assert pairs == [(13, 50), (12, 51), (11, 52), (10, 53)]


def test_paf_invert():
    rec = PafRecord("q", 100, 10, 20, "+", "t", 200, 50, 60, 8, 10)
    rec.cigar = [("M", 4), ("I", 2), ("M", 4), ("D", 2)]
    inv = rec.inverted()
    assert inv.qname == "t" and inv.tname == "q"
    assert inv.cigar == [("M", 4), ("D", 2), ("M", 4), ("I", 2)]
    # pairs must be the same set with coordinates swapped
    orig = {(t, q) for q, t in rec.aligned_pairs()}
    assert set(inv.aligned_pairs()) == orig


def test_maf_roundtrip(tmp_path):
    b = MafBlock(score=12.0, rows=[
        MafRow("hg.chr1", 10, 5, "+", 100, "ACG-TA"),
        MafRow("mm.chr2", 3, 6, "-", 50, "ACGTTA"),
    ])
    p = tmp_path / "t.maf"
    write_maf(str(p), [b])
    blocks = list(read_maf(str(p)))
    assert len(blocks) == 1
    assert blocks[0].rows[0].src == "hg.chr1"
    assert blocks[0].rows[1].forward_interval() == (50 - 3 - 6, 50 - 3)


def test_seqfile(tmp_path):
    p = tmp_path / "sf.txt"
    p.write_text("(a:0.1,(b:0.2,c:0.3)bc:0.1);\n"
                 "a /tmp/a.fa\n*b /tmp/b.fa\nc /tmp/c.fa\n")
    sf = SeqFile.parse(str(p))
    assert sf.tree.leaf_names() == ["a", "b", "c"]
    assert sf.quality_ok["b"] and not sf.quality_ok["a"]
    assert sf.paths["c"] == "/tmp/c.fa"


def test_seqfile_star():
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "sf.txt")
        with open(p, "w") as fh:
            fh.write("a /tmp/a.fa\nb /tmp/b.fa\n")
        sf = SeqFile.parse(p)
        assert sf.tree is None
        star = sf.star_tree()
        assert star.leaf_names() == ["a", "b"]
