"""TAF format: roundtrip, norm, sort, index/query."""

import io

import numpy as np
import pytest

from cactus_tpu.io.maf import MafBlock, MafRow
from cactus_tpu.io.taf import (read_taf, taf_index, taf_norm, taf_query,
                               taf_sort, write_taf)
from cactus_tpu.testutil.comparator import maf_pairs_arr


def _blk(rows):
    return MafBlock(rows=[MafRow(*r) for r in rows])


@pytest.fixture()
def blocks():
    return [
        _blk([("anc.c", 0, 5, "+", 100, "ACGTA"),
              ("a.c", 10, 5, "+", 50, "ACGTA"),
              ("b.c", 20, 4, "+", 60, "AC-TA")]),
        # continues anc + a, drops b
        _blk([("anc.c", 5, 3, "+", 100, "GGG"),
              ("a.c", 15, 3, "+", 50, "GGG")]),
        # new region, minus-strand row
        _blk([("anc.c", 50, 4, "+", 100, "TTTT"),
              ("b.c", 30, 4, "-", 60, "TTTT")]),
    ]


def test_taf_roundtrip_pairs(blocks):
    buf = io.StringIO()
    write_taf(buf, blocks)
    buf.seek(0)
    back = read_taf(buf)
    for a, b in [("anc", "a"), ("anc", "b"), ("a", "b")]:
        pa = np.sort(maf_pairs_arr(blocks, a, b))
        pb = np.sort(maf_pairs_arr(back, a, b))
        assert np.array_equal(pa, pb), (a, b)


def test_taf_continuation_compresses(blocks):
    buf = io.StringIO()
    write_taf(buf, blocks)
    text = buf.getvalue()
    lines = [l for l in text.splitlines() if l and not l.startswith("#")]
    # 5+3+4 columns
    assert len(lines) == 12
    op_lines = [l for l in lines if ";" in l]
    # block 2 continues rows 0..1 of block 1 (only a delete op),
    # block 3 needs new coords
    assert len(op_lines) == 3
    assert "d 2" in op_lines[1]
    assert "i " in op_lines[0]


def test_taf_norm_merges_adjacent():
    b1 = _blk([("anc.c", 0, 4, "+", 100, "ACGT"),
               ("a.c", 0, 4, "+", 50, "ACGT")])
    b2 = _blk([("anc.c", 4, 4, "+", 100, "CCCC"),
               ("a.c", 4, 4, "+", 50, "CCCC")])
    far = _blk([("anc.c", 90, 2, "+", 100, "AA"),
                ("a.c", 44, 2, "+", 50, "AA")])
    merged = taf_norm([b1, b2, far], max_block_merge=64, max_gap=10)
    assert len(merged) == 2
    assert merged[0].rows[0].text == "ACGTCCCC"
    assert merged[0].rows[0].size == 8
    # pairs preserved
    pa = np.sort(maf_pairs_arr([b1, b2, far], "anc", "a"))
    pb = np.sort(maf_pairs_arr(merged, "anc", "a"))
    assert np.array_equal(pa, pb)


def test_taf_norm_gap_fill():
    b1 = _blk([("anc.c", 0, 4, "+", 100, "ACGT"),
               ("a.c", 0, 4, "+", 50, "ACGT")])
    b2 = _blk([("anc.c", 6, 2, "+", 100, "GG"),   # 2bp gap on both rows
               ("a.c", 6, 2, "+", 50, "GG")])
    merged = taf_norm([b1, b2], max_gap=5)
    assert len(merged) == 1
    r = merged[0].rows[0]
    assert r.size == 8 and len(r.text) == 8


def test_taf_sort():
    b = _blk([("b.c", 0, 2, "+", 10, "AA"),
              ("a.c", 0, 2, "+", 10, "AA"),
              ("anc.c", 0, 2, "+", 10, "AA")])
    out = taf_sort([b], ["anc", "a", "b"])
    assert [r.src for r in out[0].rows] == ["anc.c", "a.c", "b.c"]


def test_taf_index_and_query(tmp_path, blocks):
    p = str(tmp_path / "x.taf")
    with open(p, "w") as fh:
        write_taf(fh, blocks)
    tai = taf_index(p, every=1)
    assert tai.endswith(".tai")
    rows = open(tai).read().splitlines()
    assert len(rows) >= 2
    got = taf_query(p, "anc.c", 50, 54)
    assert len(got) == 1
    assert got[0].rows[0].start == 50
    got_all = taf_query(p, "anc.c", 0, 100)
    assert len(got_all) >= 2
