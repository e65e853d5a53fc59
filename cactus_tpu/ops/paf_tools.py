"""PAF toolkit parity — the paffy tile/trim/view/split_file surfaces.

Reference: the paffy submodule's tools drive the chaining pipeline
(paf/local_alignment.py:660-727): `paffy tile` assigns tile levels
(how deep a record sits under better-scoring cover on its query),
`paffy trim` cuts lower-scoring records back to the query intervals no
better record covers, `paffy view` reports summary stats, and
`paffy split_file --query` partitions records into per-contig-group
jobs (chainContigGroupSize, config XML :106).  `paffy invert` is
PafRecord.inverted.  chain / filter / dechunk / upconvert live in
ops/chain.py and phases/chunking.py.
"""

from __future__ import annotations

from ..io.paf import PafRecord


def _overlap(a0: int, a1: int, b0: int, b1: int) -> int:
    return max(0, min(a1, b1) - max(a0, b0))


def tile(records: list[PafRecord],
         min_overlap_fraction: float = 0.5) -> list[PafRecord]:
    """Assign tile levels (tl:i tags): level 1 records are the best in
    their query region; a record gets level k+1 when better-scoring
    records already at level ≤ k cover more than min_overlap_fraction
    of it.  The downstream filter keeps level ≤ 1 (local_alignment.py
    :686-699)."""
    by_query: dict[str, list[PafRecord]] = {}
    for r in records:
        by_query.setdefault(r.qname, []).append(r)
    for recs in by_query.values():
        recs.sort(key=lambda r: -r.score)
        placed: list[tuple[int, int, int]] = []   # (q0, q1, level)
        for r in recs:
            span = max(1, r.qend - r.qstart)
            depth: dict[int, int] = {}
            for q0, q1, lvl in placed:
                ov = _overlap(r.qstart, r.qend, q0, q1)
                depth[lvl] = depth.get(lvl, 0) + ov
            level = 1
            acc = 0
            for lvl in sorted(depth):
                acc += depth[lvl]
                if acc > min_overlap_fraction * span:
                    level = lvl + 1
            r.set_tag("tl", "i", level)
            placed.append((r.qstart, r.qend, level))
    return records


def trim_record_to_query(r: PafRecord, q0: int,
                         q1: int) -> PafRecord | None:
    """Cut a record down to query interval [q0, q1), walking the cigar
    so target coordinates stay consistent.  Returns None when nothing
    remains.  O(#cigar ops): each op's overlap with the kept interval
    is interval arithmetic, never per-base stepping."""
    q0 = max(q0, r.qstart)
    q1 = min(q1, r.qend)
    if q1 <= q0:
        return None
    fwd = r.strand == "+"
    # query cursor runs qstart..qend for '+', qend..qstart for '-'
    q = r.qstart if fwd else r.qend
    t = r.tstart
    # kept ops with their forward-strand query/target intervals; the
    # final qstart/qend/tstart/tend come from the SURVIVING ops (a
    # boundary insertion dropped by the strips must not leave slack in
    # the record bounds — '-'-strand pair walks anchor at qend)
    kept: list[list] = []    # [op, ln, qlo, qhi, tlo, thi]
    for op, ln in r.cigar:
        if op in "M=X":
            a, b = (q, q + ln) if fwd else (q - ln, q)
            ov0, ov1 = max(a, q0), min(b, q1)
            keep = ov1 - ov0
            if keep > 0:
                # target offset of the kept slice within the op
                off = (ov0 - a) if fwd else (b - ov1)
                kept.append(["M", keep, ov0, ov1, t + off, t + off + keep])
            q = q + ln if fwd else q - ln
            t += ln
        elif op == "I":
            a, b = (q, q + ln) if fwd else (q - ln, q)
            ov0, ov1 = max(a, q0), min(b, q1)
            if ov1 > ov0:
                kept.append(["I", ov1 - ov0, ov0, ov1, None, None])
            q = q + ln if fwd else q - ln
        elif op in "DN":
            kept.append(["D", ln, None, None, t, t + ln])
            t += ln
    # strip boundary indels
    while kept and kept[0][0] in "ID":
        kept.pop(0)
    while kept and kept[-1][0] in "ID":
        kept.pop()
    if not kept:
        return None
    new_ops: list[tuple[str, int]] = []
    m_cols = 0
    nq0 = nq1 = None
    nt0 = nt1 = None
    for op, ln, qlo, qhi, tlo, thi in kept:
        if new_ops and new_ops[-1][0] == op:
            new_ops[-1] = (op, new_ops[-1][1] + ln)
        else:
            new_ops.append((op, ln))
        if op == "M":
            m_cols += ln
        if qlo is not None:
            nq0 = qlo if nq0 is None else min(nq0, qlo)
            nq1 = qhi if nq1 is None else max(nq1, qhi)
        if tlo is not None:
            nt0 = tlo if nt0 is None else min(nt0, tlo)
            nt1 = thi if nt1 is None else max(nt1, thi)
    import copy
    out = copy.deepcopy(r)
    out.qstart, out.qend = nq0, nq1
    out.tstart, out.tend = nt0, nt1
    out.cigar = new_ops
    out.alnlen = sum(ln for _op, ln in new_ops)
    # nmatch/AS scale proportionally to the kept fraction — the cigar
    # alone can't distinguish matches from mismatches within M columns,
    # and a trimmed sliver must not keep its full-record identity and
    # chain score (that would let slivers clear minPrimaryChainScore
    # and outrank genuinely stronger records downstream)
    orig_m = sum(ln for op, ln in r.cigar if op in "M=X")
    frac = m_cols / orig_m if orig_m else 0.0
    out.nmatch = min(m_cols, int(round(r.nmatch * frac)))
    if "AS" in out.tags:
        out.set_tag("AS", "i", int(round(r.score * frac)))
    return out


def trim_record_fraction(r: PafRecord, fraction: float
                         ) -> PafRecord | None:
    """`paffy chain --trimFraction` analog (reference invocation:
    src/cactus/paf/local_alignment.py:674; config chainTrimFraction,
    cactus_progressive_config.xml:111): keep the central `fraction` of
    each chained record's query span, shaving the low-confidence ends
    symmetrically.  fraction >= 1.0 is the shipped default no-op.
    Returns None when nothing alignable survives."""
    if fraction >= 1.0:
        return r
    if fraction <= 0.0:
        return None
    span = r.qend - r.qstart
    cut = int(span * (1.0 - fraction) / 2.0)
    if span - 2 * cut < 1:
        return None
    return trim_record_to_query(r, r.qstart + cut, r.qend - cut)


def trim(records: list[PafRecord]) -> list[PafRecord]:
    """paffy trim: each query base belongs to its best-scoring record —
    lower-scoring records are cut back to the uncovered intervals
    (records wholly covered are dropped)."""
    by_query: dict[str, list[PafRecord]] = {}
    for r in records:
        by_query.setdefault(r.qname, []).append(r)
    out: list[PafRecord] = []
    for recs in by_query.values():
        recs.sort(key=lambda r: -r.score)
        covered: list[tuple[int, int]] = []
        for r in recs:
            # subtract covered intervals from [qstart, qend)
            freeparts = [(r.qstart, r.qend)]
            for c0, c1 in covered:
                nxt = []
                for f0, f1 in freeparts:
                    if c1 <= f0 or c0 >= f1:
                        nxt.append((f0, f1))
                        continue
                    if f0 < c0:
                        nxt.append((f0, c0))
                    if c1 < f1:
                        nxt.append((c1, f1))
                freeparts = nxt
            from ..phases.blast import _insert_interval
            for f0, f1 in freeparts:
                piece = trim_record_to_query(r, f0, f1)
                if piece is not None:
                    out.append(piece)
            _insert_interval(covered, r.qstart, r.qend)
    return out


def view(records: list[PafRecord]) -> dict:
    """paffy view: summary statistics of a record set."""
    n_primary = sum(1 for r in records if r.is_primary)
    aligned = sum(r.qend - r.qstart for r in records)
    matches = sum(r.nmatch for r in records)
    alnlen = sum(r.alnlen for r in records)
    return dict(
        n_records=len(records),
        n_primary=n_primary,
        aligned_query_bp=int(aligned),
        n_matches=int(matches),
        identity=round(matches / alnlen, 4) if alnlen else 0.0,
        queries=len({r.qname for r in records}),
        targets=len({r.tname for r in records}),
    )


def split_file(records: list[PafRecord],
               group_size: int = 10_000_000) -> list[list[PafRecord]]:
    """paffy split_file --query: partition records into groups of query
    contigs whose total length stays under group_size (the
    chainContigGroupSize fan-out, local_alignment.py:638-646)."""
    qlen: dict[str, int] = {}
    for r in records:
        qlen[r.qname] = max(qlen.get(r.qname, 0), r.qlen)
    groups: list[list[str]] = []
    cur: list[str] = []
    acc = 0
    for name in sorted(qlen):
        if cur and acc + qlen[name] > group_size:
            groups.append(cur)
            cur, acc = [], 0
        cur.append(name)
        acc += qlen[name]
    if cur:
        groups.append(cur)
    of_group = {name: gi for gi, g in enumerate(groups) for name in g}
    out: list[list[PafRecord]] = [[] for _ in groups]
    for r in records:
        out[of_group[r.qname]].append(r)
    return out
