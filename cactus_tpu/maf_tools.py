"""MAF post-processing: duplicate filtering, block merging, coverage.

Reference surfaces: the hal2maf pipeline chains `taffy norm` (merge
short adjacent blocks), `mafDuplicateFilter -k` (keep one row per
genome, the one closest to the block consensus) and `maf_stream
merge_dups consensus` (collapse dups into a consensus row)
(maf/cactus_hal2maf.py:387-460, dupe modes single/single-ref/consensus);
coverage tables come from halStats/evolverTest._check_coverage.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from .io.maf import MafBlock, MafRow

_GAP = "-"


def _genome(src: str) -> str:
    return src.split(".", 1)[0]


def _consensus(texts: list[str]) -> str:
    cols = []
    for k in range(len(texts[0])):
        c = Counter(t[k] for t in texts if t[k] != _GAP)
        cols.append(c.most_common(1)[0][0] if c else _GAP)
    return "".join(cols)


def dup_filter(blocks: list[MafBlock], mode: str = "single",
               ref_genome: str | None = None) -> list[MafBlock]:
    """Resolve multiple rows of one genome within a block.

    single: keep the row most similar to the block consensus
    (mafDuplicateFilter -k); single-ref: like single but never drop
    reference-genome rows (-r); consensus: replace the duplicate rows by
    their consensus string (maf_stream merge_dups consensus).
    """
    out = []
    for b in blocks:
        by_genome: dict[str, list[MafRow]] = defaultdict(list)
        for r in b.rows:
            by_genome[_genome(r.src)].append(r)
        if all(len(rs) == 1 for rs in by_genome.values()):
            out.append(b)
            continue
        cons = _consensus([r.text for r in b.rows])

        def similarity(r):
            return sum(1 for a, c in zip(r.text, cons)
                       if a == c and a != _GAP)

        rows = []
        for g, rs in by_genome.items():
            if len(rs) == 1:
                rows.append(rs[0])
            elif mode == "single-ref" and ref_genome is not None \
                    and g == ref_genome:
                rows.extend(rs)
            elif mode == "consensus":
                merged = _consensus([r.text for r in rs])
                best = max(rs, key=similarity)
                rows.append(MafRow(src=best.src, start=best.start,
                                   size=best.size, strand=best.strand,
                                   src_size=best.src_size, text=merged))
            else:  # single
                rows.append(max(rs, key=similarity))
        # preserve original row order
        order = {id(r): k for k, r in enumerate(b.rows)}
        rows.sort(key=lambda r: order.get(id(r), 1 << 30))
        out.append(MafBlock(rows=rows, score=b.score))
    return out


def merge_adjacent_blocks(blocks: list[MafBlock]) -> list[MafBlock]:
    """taffy-norm-style merge: concatenate consecutive blocks whose rows
    cover the same sources, same strands, and abut exactly."""
    out: list[MafBlock] = []
    for b in blocks:
        if out and _mergeable(out[-1], b):
            prev = out[-1]
            rows = []
            prev_by = {r.src: r for r in prev.rows}
            for r in b.rows:
                p = prev_by[r.src]
                rows.append(MafRow(src=r.src, start=p.start,
                                   size=p.size + r.size, strand=r.strand,
                                   src_size=r.src_size,
                                   text=p.text + r.text))
            out[-1] = MafBlock(rows=rows, score=prev.score)
        else:
            out.append(MafBlock(rows=list(b.rows), score=b.score))
    return out


def _mergeable(a: MafBlock, b: MafBlock) -> bool:
    if {r.src for r in a.rows} != {r.src for r in b.rows}:
        return False
    if len(a.rows) != len(b.rows):
        return False
    by = {r.src: r for r in a.rows}
    for r in b.rows:
        p = by[r.src]
        if p.strand != r.strand:
            return False
        if p.start + p.size != r.start:
            return False
    return True


def coverage_stats(blocks: list[MafBlock],
                   ref_genome: str) -> dict[str, dict[int, int]]:
    """Per-genome: #reference sites covered exactly 1x/2x/3x+ by that
    genome (the evolverTest coverage table)."""
    depth: dict[str, np.ndarray] = {}
    ref_sizes: dict[str, int] = {}
    for b in blocks:
        ref_rows = [r for r in b.rows if _genome(r.src) == ref_genome]
        others = [r for r in b.rows if _genome(r.src) != ref_genome]
        for rr in ref_rows:
            ref_sizes.setdefault(rr.src, rr.src_size)
            pos = _col_positions(rr)
            for r in others:
                g = _genome(r.src)
                if g not in depth:
                    depth[g] = {}
                arr = depth[g].setdefault(rr.src, np.zeros(rr.src_size,
                                                           np.int32))
                for k, p in enumerate(pos):
                    if p >= 0 and r.text[k] != _GAP:
                        arr[p] += 1
    out: dict[str, dict[int, int]] = {}
    for g, per_seq in depth.items():
        total = np.concatenate([a for a in per_seq.values()])
        out[g] = {1: int((total == 1).sum()), 2: int((total == 2).sum()),
                  3: int((total >= 3).sum())}
    return out


def _col_positions(row: MafRow) -> list[int]:
    out = []
    if row.strand == "+":
        p = row.start
        for ch in row.text:
            if ch == _GAP:
                out.append(-1)
            else:
                out.append(p)
                p += 1
    else:
        p = row.src_size - row.start - 1
        for ch in row.text:
            if ch == _GAP:
                out.append(-1)
            else:
                out.append(p)
                p -= 1
    return out


# --------------------------------------------------------------------------
# bigMaf export (cactus-maf2bigmaf)
# --------------------------------------------------------------------------

BIGMAF_AS = """table bedMaf
"Bed3 with maf block"
    (
    string chrom;      "Reference sequence chromosome or scaffold"
    uint   chromStart; "Start position in chromosome"
    uint   chromEnd;   "End position in chromosome"
    lstring mafBlock;  "MAF block"
    )
"""


def write_bigmaf(path: str, blocks, ref_genome: str) -> int:
    """cactus-maf2bigmaf equivalent: emit the bigMaf bed text (one row
    per block on the reference genome, the MAF block packed into the
    mafBlock field with ';' line separators) plus the autoSql schema at
    `path`.as — the exact inputs bedToBigBed consumes
    (maf/cactus_maf2bigmaf.py).  Returns rows written."""
    n = 0
    with open(path, "w") as fh:
        for blk in blocks:
            ref_rows = [r for r in blk.rows
                        if r.src.split(".", 1)[0] == ref_genome]
            if not ref_rows:
                continue
            r = ref_rows[0]
            start = r.start if r.strand == "+" else \
                r.src_size - r.start - r.size
            lines = ["a score=0.0"]
            for row in blk.rows:
                lines.append(f"s {row.src} {row.start} {row.size} "
                             f"{row.strand} {row.src_size} {row.text}")
            fh.write(f"{r.src}\t{start}\t{start + r.size}\t"
                     + ";".join(lines) + ";\n")
            n += 1
    with open(path + ".as", "w") as fh:
        fh.write(BIGMAF_AS)
    return n
