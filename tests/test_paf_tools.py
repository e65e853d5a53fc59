"""paffy tool parity: tile, trim, view, split_file."""

import numpy as np
import pytest

from cactus_tpu.io.paf import PafRecord
from cactus_tpu.ops.paf_tools import (split_file, tile, trim,
                                      trim_record_to_query, view)


def _rec(qname, qs, qe, ts, score, strand="+", cigar=None, qlen=10_000):
    r = PafRecord(qname, qlen, qs, qe, strand, "t.c", 10_000, ts,
                  ts + (qe - qs), qe - qs, qe - qs)
    r.set_tag("AS", "i", score)
    r.set_tag("cg", "Z", cigar or f"{qe - qs}M")
    return r


def test_tile_levels():
    best = _rec("q", 0, 1000, 0, 9000)
    dup = _rec("q", 100, 900, 2000, 5000)     # under best → level 2
    side = _rec("q", 2000, 3000, 3000, 4000)  # elsewhere → level 1
    out = tile([best, dup, side])
    lv = {id(r): r.get_tag("tl") for r in out}
    assert lv[id(best)] == 1
    assert lv[id(dup)] == 2
    assert lv[id(side)] == 1


def test_trim_record_to_query_plus():
    r = _rec("q", 100, 200, 500, 1000, cigar="40M10I30M5D30M")
    out = trim_record_to_query(r, 120, 190)
    assert out is not None
    assert (out.qstart, out.qend) == (120, 190)
    # walk: q=100..139 M (t 500..539), q140..149 I, q150..179 M
    # (t540..569), D5 (t570..574), q180..209 M (t575..)
    assert out.tstart == 520
    q_consumed = sum(ln for op, ln in out.cigar if op in "MI")
    t_consumed = sum(ln for op, ln in out.cigar if op in "MD")
    assert q_consumed == 70
    assert out.tend - out.tstart == t_consumed
    assert out.nmatch == sum(ln for op, ln in out.cigar if op == "M")


def test_trim_record_to_query_minus():
    r = _rec("q", 100, 200, 500, 1000, strand="-", cigar="100M")
    out = trim_record_to_query(r, 150, 200)
    assert out is not None
    assert (out.qstart, out.qend) == (150, 200)
    # '-': cigar walks q from qend-1 down; first 50 target bases map to
    # query 199..150
    assert (out.tstart, out.tend) == (500, 550)
    assert out.cigar == [("M", 50)]


def test_trim_removes_covered():
    best = _rec("q", 0, 1000, 0, 9000)
    worse_inside = _rec("q", 200, 800, 5000, 100)
    partial = _rec("q", 800, 1500, 7000, 50)
    out = trim([best, worse_inside, partial])
    spans = sorted((r.qstart, r.qend) for r in out)
    assert (0, 1000) in spans
    # worse_inside fully covered → gone; partial trimmed to [1000,1500)
    assert all(not (s == 200 and e == 800) for s, e in spans)
    assert (1000, 1500) in spans
    # no query base covered twice
    allspans = sorted((r.qstart, r.qend) for r in out)
    for (a0, a1), (b0, b1) in zip(allspans, allspans[1:]):
        assert b0 >= a1


def test_view_stats():
    st = view([_rec("q", 0, 100, 0, 900), _rec("q2", 0, 50, 0, 400)])
    assert st["n_records"] == 2
    assert st["aligned_query_bp"] == 150
    assert st["queries"] == 2 and st["targets"] == 1
    assert st["identity"] == 1.0


def test_split_file_groups():
    recs = [_rec(f"q{i}", 0, 10, 0, 10, qlen=4000) for i in range(6)]
    groups = split_file(recs, group_size=8000)
    assert len(groups) == 3
    assert sum(len(g) for g in groups) == 6
    for g in groups:
        qs = {r.qname for r in g}
        assert sum(4000 for _ in qs) <= 8000


def test_trim_record_fuzz_vs_pair_oracle():
    """trim_record_to_query (O(#ops) interval arithmetic) must keep
    exactly the aligned pairs whose query base lands in [q0, q1)."""
    import numpy as np
    rng = np.random.default_rng(5)
    for trial in range(50):
        # random cigar
        ops = []
        for _ in range(rng.integers(1, 8)):
            op = rng.choice(["M", "I", "D"])
            ops.append((op, int(rng.integers(1, 30))))
        if not any(o == "M" for o, _ in ops):
            ops.append(("M", 10))
        qspan = sum(ln for o, ln in ops if o in "MI")
        tspan = sum(ln for o, ln in ops if o in "MD")
        qs = int(rng.integers(0, 50))
        ts = int(rng.integers(0, 50))
        strand = "+" if rng.random() < 0.5 else "-"
        cg = "".join(f"{ln}{o}" for o, ln in ops)
        r = PafRecord("q", 1000, qs, qs + qspan, strand, "t.c", 1000,
                      ts, ts + tspan, 1, qspan + tspan,
                      tags={"cg": ("Z", cg), "AS": ("i", 100)})
        q0 = int(rng.integers(0, qs + qspan + 5))
        q1 = q0 + int(rng.integers(1, 40))
        want = {(q, t) for q, t in r.aligned_pairs()
                if q0 <= q < q1}
        piece = trim_record_to_query(r, q0, q1)
        got = set()
        if piece is not None:
            got = {(q, t) for q, t in piece.aligned_pairs()}
            # nmatch scales proportionally to the kept M fraction (a
            # sliver must not keep full-record identity/score)
            assert piece.nmatch <= len(got)
            assert piece.score <= r.score
        assert got == want, (trial, cg, strand, q0, q1)


def test_trim_record_fraction():
    """chainTrimFraction: keep the central fraction of the query span
    (paffy chain --trimFraction; local_alignment.py:674)."""
    from cactus_tpu.io.paf import PafRecord
    from cactus_tpu.ops.paf_tools import trim_record_fraction

    r = PafRecord(qname="q", qlen=100, qstart=10, qend=90, strand="+",
                  tname="t", tlen=100, tstart=5, tend=85,
                  nmatch=80, alnlen=80, mapq=60)
    r.cigar = [("M", 80)]
    r.set_tag("AS", "i", 800)
    half = trim_record_fraction(r, 0.5)
    assert half.qstart == 30 and half.qend == 70
    assert half.tstart == 25 and half.tend == 65
    assert half.cigar == [("M", 40)]
    assert half.nmatch == 40
    # default fraction is the identity
    assert trim_record_fraction(r, 1.0) is r
    # degenerate fractions vanish
    assert trim_record_fraction(r, 0.0) is None
