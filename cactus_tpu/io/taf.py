"""TAF (transposed alignment format) support — the taffy toolkit analog.

The reference post-processes every hal2maf chunk through taffy
(maf/cactus_hal2maf.py:425-451: `taffy view | taffy norm | taffy sort |
taffy view -m`, plus `taffy index` :709-715 and coverage :682).  TAF
stores one alignment COLUMN per line with run-length-encoded row
coordinate ops, so runs of columns whose row set doesn't change cost
only their bases — the column-major dual of MAF.

Grammar used here (the taffy text format):

    #taf version:1
    <bases> [; <ops>]

where <bases> is one character per row (gap '-') and <ops> is a
space-separated op list executed BEFORE the column applies:

    i <row> <seqname> <start> <strand> <srclen>   insert row
    d <row>                                       delete row
    s <row> <seqname> <start> <strand> <srclen>   substitute row
    g <row> <gap_len>                             unaligned gap jump

Coordinates auto-advance by one per non-gap base.  A column carrying
ops starts a new MAF block on conversion (`taffy view -m` behavior).
"""

from __future__ import annotations

import numpy as np

from .maf import MafBlock, MafRow


def _row_key(r: MafRow) -> tuple:
    return (r.src, r.strand, r.src_size)


def write_taf(path_or_file, blocks: list[MafBlock]) -> None:
    """MAF blocks → TAF text (continuation rows are run-length shared)."""
    own = not hasattr(path_or_file, "write")
    fh = open(path_or_file, "w") if own else path_or_file
    try:
        fh.write("#taf version:1\n")
        live: list[dict] = []      # row state: src/strand/src_size/pos
        for blk in blocks:
            ops: list[str] = []
            # match continuing rows by (src, strand): a row continues
            # when its start equals the live row's current position
            used = [False] * len(live)
            assign: list[int | None] = []
            for r in blk.rows:
                hit = None
                for i, st in enumerate(live):
                    if used[i] or st is None:
                        continue
                    if (st["src"] == r.src and st["strand"] == r.strand
                            and st["pos"] == r.start
                            and st["src_size"] == r.src_size):
                        hit = i
                        break
                if hit is not None:
                    used[hit] = True
                assign.append(hit)
            # rows are emitted in block order; rebuild the live list so
            # live row order == block row order, with minimal ops
            new_live: list[dict] = []
            for ri, r in enumerate(blk.rows):
                st = dict(src=r.src, strand=r.strand,
                          src_size=r.src_size, pos=r.start)
                old = assign[ri]
                if old is not None and old == ri and ri < len(live):
                    pass                      # same slot, continues
                elif old is not None:
                    ops.append(f"s {ri} {r.src} {r.start} {r.strand} "
                               f"{r.src_size}")
                else:
                    ops.append(f"i {ri} {r.src} {r.start} {r.strand} "
                               f"{r.src_size}")
                new_live.append(st)
            for ri in range(len(blk.rows), len(live)):
                ops.append(f"d {ri}")
            live = new_live
            texts = [r.text for r in blk.rows]
            ncol = len(texts[0]) if texts else 0
            for c in range(ncol):
                col = "".join(t[c] for t in texts)
                if c == 0 and ops:
                    fh.write(f"{col} ; {' '.join(ops)}\n")
                else:
                    fh.write(col + "\n")
                for ri, ch in enumerate(col):
                    if ch != "-":
                        live[ri]["pos"] += 1
    finally:
        if own:
            fh.close()


def read_taf(path_or_file) -> list[MafBlock]:
    """TAF text → MAF blocks (split at op-carrying columns, the
    `taffy view -m` conversion)."""
    own = not hasattr(path_or_file, "read")
    fh = open(path_or_file) if own else path_or_file
    try:
        rows: list[dict | None] = []
        cur_cols: list[str] = []
        cur_meta: list[dict] = []
        out: list[MafBlock] = []

        def flush():
            if not cur_cols:
                return
            n = len(cur_meta)
            mrows = []
            for ri in range(n):
                meta = cur_meta[ri]
                text = "".join(col[ri] for col in cur_cols)
                size = len(text) - text.count("-")
                if size == 0:
                    continue
                mrows.append(MafRow(src=meta["src"], start=meta["pos0"],
                                    size=size, strand=meta["strand"],
                                    src_size=meta["src_size"],
                                    text=text))
            if mrows:
                out.append(MafBlock(rows=mrows))
            cur_cols.clear()
            cur_meta.clear()

        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            if ";" in line:
                bases, opstr = line.split(";", 1)
                bases = bases.strip()
                toks = opstr.split()
                flush()
                i = 0
                while i < len(toks):
                    op = toks[i]
                    if op in ("i", "s"):
                        ri = int(toks[i + 1])
                        st = dict(src=toks[i + 2], pos=int(toks[i + 3]),
                                  strand=toks[i + 4],
                                  src_size=int(toks[i + 5]))
                        while len(rows) <= ri:
                            rows.append(None)
                        rows[ri] = st
                        i += 6
                    elif op == "d":
                        ri = int(toks[i + 1])
                        if ri < len(rows):
                            rows[ri] = None
                        i += 2
                    elif op == "g":
                        ri = int(toks[i + 1])
                        rows[ri]["pos"] += int(toks[i + 2])
                        i += 3
                    else:
                        raise ValueError(f"bad TAF op {op!r}")
                while rows and rows[-1] is None:
                    rows.pop()
            else:
                bases = line.strip()
            if not bases:
                continue
            if not cur_cols:
                cur_meta.extend(dict(r, pos0=r["pos"]) for r in rows
                                if r is not None)
            live = [r for r in rows if r is not None]
            if len(bases) != len(live):
                raise ValueError(
                    f"column width {len(bases)} != {len(live)} rows")
            cur_cols.append(bases)
            for ri, ch in enumerate(bases):
                if ch != "-":
                    live[ri]["pos"] += 1
        flush()
        return out
    finally:
        if own:
            fh.close()


# --------------------------------------------------------------------------
# taffy norm / sort / index / coverage equivalents
# --------------------------------------------------------------------------

def taf_norm(blocks: list[MafBlock], max_block_merge: int = 64,
             max_gap: int = 30,
             fraction_shared: float = 0.6) -> list[MafBlock]:
    """`taffy norm` semantics: merge two adjacent blocks when one is
    shorter than max_block_merge columns, the reference-row gap between
    them is ≤ max_gap, and ≥ fraction_shared of rows are shared
    (cactus_hal2maf.py:104-118 option docs).  Unaligned gap bases
    between merged blocks become gap columns."""
    out: list[MafBlock] = []
    for blk in blocks:
        if not out:
            out.append(blk)
            continue
        prev = out[-1]
        w_prev = len(prev.rows[0].text) if prev.rows else 0
        w_cur = len(blk.rows[0].text) if blk.rows else 0
        if min(w_prev, w_cur) >= max_block_merge:
            out.append(blk)
            continue
        pk = {_row_key(r): r for r in prev.rows}
        ck = {_row_key(r): r for r in blk.rows}
        shared = [k for k in ck if k in pk]
        denom = max(len(pk), len(ck))
        if denom == 0 or len(shared) / denom < fraction_shared:
            out.append(blk)
            continue
        gaps = {}
        ok = True
        for k in shared:
            g = ck[k].start - (pk[k].start + pk[k].size)
            if g < 0 or g > max_gap:
                ok = False
                break
            gaps[k] = g
        if not ok or not shared:
            out.append(blk)
            continue
        # build the merged block: prev cols + gap fill + cur cols
        fill = max(gaps.values(), default=0)
        rows = []
        for k, pr in pk.items():
            if k in ck:
                cr = ck[k]
                pad = "N" * gaps[k] + "-" * (fill - gaps[k])
                rows.append(MafRow(
                    src=pr.src, start=pr.start,
                    size=pr.size + gaps[k] + cr.size,
                    strand=pr.strand, src_size=pr.src_size,
                    text=pr.text + pad + cr.text))
            else:
                rows.append(MafRow(
                    src=pr.src, start=pr.start, size=pr.size,
                    strand=pr.strand, src_size=pr.src_size,
                    text=pr.text + "-" * (fill + len(ck[shared[0]].text))))
        w_p = len(prev.rows[0].text)
        for k, cr in ck.items():
            if k not in pk:
                rows.append(MafRow(
                    src=cr.src, start=cr.start, size=cr.size,
                    strand=cr.strand, src_size=cr.src_size,
                    text="-" * (w_p + fill) + cr.text))
        out[-1] = MafBlock(rows=rows)
    return out


def taf_sort(blocks: list[MafBlock],
             genome_order: list[str]) -> list[MafBlock]:
    """`taffy sort -n`: reorder rows by a genome precedence list (the
    genome of a row is the event prefix of its src)."""
    rank = {g: i for i, g in enumerate(genome_order)}

    def key(r: MafRow):
        ev = r.src.split(".", 1)[0]
        return (rank.get(ev, len(rank)), r.src, r.start)

    return [MafBlock(rows=sorted(b.rows, key=key)) for b in blocks]


def taf_index(path: str, every: int = 10_000) -> str:
    """`taffy index`: write `path`.tai mapping (ref seq, ref pos) →
    byte offset of the nearest preceding op-carrying line, so subrange
    extraction seeks instead of scanning."""
    tai = path + ".tai"
    with open(path, "rb") as fh, open(tai, "w") as out:
        offset = 0
        ref = None
        last_written = -(every + 1)
        for raw in fh:
            line = raw.decode("ascii", "replace").rstrip("\n")
            if ";" in line and not line.startswith("#"):
                toks = line.split(";", 1)[1].split()
                # first i/s op row 0 = reference row of the new block
                for i, t in enumerate(toks):
                    if t in ("i", "s") and toks[i + 1] == "0":
                        src, pos = toks[i + 2], int(toks[i + 3])
                        if (src != ref
                                or pos - last_written >= every):
                            out.write(f"{src}\t{pos}\t{offset}\n")
                            ref, last_written = src, pos
                        break
            offset += len(raw)
    return tai


def taf_query(path: str, ref_seq: str, start: int,
              end: int) -> list[MafBlock]:
    """Indexed subrange read: seek via the .tai, then parse until past
    `end`, trimming to reference rows intersecting [start, end)."""
    import io as _io
    import os
    tai = path + ".tai"
    if not os.path.exists(tai):
        taf_index(path)
    seek_to = 0
    with open(tai) as fh:
        for line in fh:
            src, pos, off = line.split("\t")
            if src == ref_seq and int(pos) <= start:
                seek_to = int(off)
    with open(path, "rb") as fh:
        fh.seek(seek_to)
        text = fh.read().decode("ascii", "replace")
    blocks = read_taf(_io.StringIO("#taf version:1\n" + text))
    out = []
    for b in blocks:
        if not b.rows:
            continue
        r0 = b.rows[0]
        if r0.src != ref_seq or r0.start >= end \
                or r0.start + r0.size <= start:
            continue
        out.append(b)
    return out
