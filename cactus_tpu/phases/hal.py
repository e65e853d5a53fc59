"""HAL export: c2h serialization, genome stats, and hierarchy MAF.

The reference serializes each flower hierarchy to the text ".c2h" format —
grammar documented at hal/impl/hal.c:14-77 — which halAppendCactusSubtree
imports into the HDF5 HAL archive; hal2maf/halStats then consume that
archive (maf/cactus_hal2maf.py, downloaded hal tooling).  Here the same
three surfaces exist natively:

 - write_c2h / read_c2h: the exact c2h text grammar (sequence lines
   `s 'event' 'header' isBottom`, bottom segments `a name start length`,
   top segments `a start length [parent orientation]`);
 - hal_stats: the halStats genome table (genome, #sequences, length,
   #top segments, #bottom segments);
 - hal2maf: per-ancestor-level MAF blocks with the ancestor row first and
   every descendant leaf expanded through composed coordinate maps (the
   hal2maf --refGenome behavior).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.fasta import Sequence, revcomp, _BASE_OF
from ..io.maf import MafBlock, MafRow
from ..progressive import (AncestorStep, ProgressiveResult, SeqMap,
                           leaf_map_to_ancestor)


# --------------------------------------------------------------------------
# c2h
# --------------------------------------------------------------------------

def write_c2h(step: AncestorStep, fh) -> None:
    """One ancestor step → c2h text (grammar hal/impl/hal.c:14-77).

    Bottom sequences are the ancestor's threads (one bottom segment per
    block, plus unnamed filler segments for scaffold-N gaps); top
    sequences are the child/outgroup sequences (aligned segments carry
    parent block name + orientation, unaligned stretches are insertions).
    """
    caf, ref = step.caf, step.ref
    blocks = caf.blocks
    lens = blocks.block_length()

    # bottom: ancestor threads in coordinate order
    filler = 1 << 40  # names for scaffold-gap segments, after block names
    for name, seq in ref.sequences.items():
        fh.write(f"s\t'{step.event}'\t'{name}'\t1\n")
        spans = sorted(((astart, b) for b, (sn, astart, _o)
                        in ref.block_coord.items() if sn == name))
        pos = 0
        for astart, b in spans:
            if astart > pos:
                fh.write(f"a\t{filler}\t{pos}\t{astart - pos}\n")
                filler += 1
            L = int(lens[b])
            fh.write(f"a\t{b}\t{astart}\t{L}\n")
            pos = astart + L
        total = len(seq)
        if pos < total:
            fh.write(f"a\t{filler}\t{pos}\t{total - pos}\n")
            filler += 1

    # top: child sequences
    order = np.lexsort((blocks.seg_start, blocks.seg_seq))
    by_seq: dict[int, list[int]] = {}
    for i in order:
        by_seq.setdefault(int(blocks.seg_seq[i]), []).append(int(i))
    table = caf.table
    for si, name in enumerate(table.names):
        event = name.split(".", 1)[0]
        fh.write(f"s\t'{event}'\t'{name}'\t0\n")
        pos = 0
        for i in by_seq.get(si, []):
            b = int(blocks.seg_block[i])
            st = int(blocks.seg_start[i])
            ln = int(blocks.seg_len[i])
            if not caf.alive[b] or b not in ref.block_coord:
                continue
            if st > pos:
                fh.write(f"a\t{pos}\t{st - pos}\n")
            _sn, _astart, orient = ref.block_coord[b]
            rel = int(blocks.seg_strand[i]) * orient
            fh.write(f"a\t{st}\t{ln}\t{b}\t{0 if rel == 1 else 1}\n")
            pos = st + ln
        total = int(table.lengths[si])
        if pos < total:
            fh.write(f"a\t{pos}\t{total - pos}\n")


def write_result_c2h(result: ProgressiveResult, outdir: str) -> dict[str, str]:
    """One c2h + ancestor FASTA per ancestor step (the artifact pair that
    halAppendCactusSubtree consumes per subtree; cactus_progressive.py:249).
    """
    import os
    from ..io.fasta import write_fasta
    os.makedirs(outdir, exist_ok=True)
    paths = {}
    for event, step in result.steps.items():
        p = os.path.join(outdir, f"{event}.c2h")
        with open(p, "w") as fh:
            write_c2h(step, fh)
        fa = os.path.join(outdir, f"{event}.hal.fa")
        write_fasta(fa, result.genomes[event])
        paths[event] = p
    return paths


@dataclass
class C2hSequence:
    event: str
    header: str
    is_bottom: bool
    segments: list[tuple]   # bottom: (name, start, len); top: (start, len[, parent, orient])


def read_c2h(path_or_file):
    """Parse c2h back into C2hSequence records (round-trip testing)."""
    own = not hasattr(path_or_file, "read")
    fh = open(path_or_file) if own else path_or_file
    try:
        seqs: list[C2hSequence] = []
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if parts[0] == "s":
                seqs.append(C2hSequence(event=parts[1].strip("'"),
                                        header=parts[2].strip("'"),
                                        is_bottom=parts[3] == "1",
                                        segments=[]))
            elif parts[0] == "a":
                seqs[-1].segments.append(tuple(int(x) for x in parts[1:]))
        return seqs
    finally:
        if own:
            fh.close()


# --------------------------------------------------------------------------
# halStats equivalent
# --------------------------------------------------------------------------

def hal_stats(result: ProgressiveResult) -> list[dict]:
    """Per-genome table: name, #sequences, total length, #segments —
    the halStats summary used by the reference's structural regression
    tests (test/evolverTest.py:_check_stats)."""
    rows = []
    for node in result.tree.preorder():
        ev = node.name
        genome = result.genomes.get(ev)
        if genome is None:
            continue
        n_bottom = 0
        step = result.steps.get(ev)
        if step is not None:
            n_bottom = len(step.ref.block_coord)
        n_top = 0
        parent_step = result.step_of_child(ev)
        if parent_step is not None:
            blocks = parent_step.caf.blocks
            seq_is_mine = np.array(
                [n.split(".", 1)[0] == ev
                 for n in parent_step.caf.table.names])
            n_top = int((seq_is_mine[blocks.seg_seq]
                         & parent_step.caf.alive[blocks.seg_block]).sum())
        rows.append(dict(genome=ev, n_sequences=len(genome),
                         length=sum(len(s) for s in genome.values()),
                         n_top_segments=n_top, n_bottom_segments=n_bottom))
    return rows


# --------------------------------------------------------------------------
# hal2maf equivalent
# --------------------------------------------------------------------------

def maf_block_trim(blk: MafBlock, c0: int, c1: int) -> MafBlock | None:
    """Restrict a MAF block to columns [c0, c1).

    MAF starts are in each row's own strand coordinates, which advance
    left-to-right along the text, so every row's new start is its old
    start plus the non-gap count before c0.  Rows emptied by the trim
    are dropped; returns None if fewer than one row survives.
    """
    rows = []
    for r in blk.rows:
        head = r.text[:c0]
        mid = r.text[c0:c1]
        size = len(mid) - mid.count("-")
        if size == 0:
            continue
        rows.append(MafRow(src=r.src,
                           start=r.start + len(head) - head.count("-"),
                           size=size, strand=r.strand,
                           src_size=r.src_size, text=mid))
    return MafBlock(rows=rows) if rows else None


def hal2maf(result: ProgressiveResult, ref_genome: str | None = None,
            include_ancestor: bool = True,
            leaves_only_rows: bool = False,
            ref_seq: str | None = None, ref_start: int = 0,
            ref_end: int | None = None) -> list[MafBlock]:
    """Hierarchy MAF referenced on `ref_genome` (default: the tree root).

    Every live block of the reference ancestor's step becomes one MAF
    block in ancestor-forward column order: the ancestor row first, then
    one row per contiguous mapped run of every descendant leaf (composed
    through the intermediate ancestors, like hal2maf walking the HAL
    top/bottom segment hierarchy).

    ref_seq/ref_start/ref_end restrict output to one reference thread
    subrange (the hal2maf --refSequence/--start/--length behavior,
    reference test/evolverTest.py:1271-1310): only blocks intersecting
    the range are built, trimmed at the boundaries.
    """
    ref_genome = ref_genome or result.tree.name
    step = result.steps[ref_genome]
    ref = step.ref
    anc_genome = result.genomes[ref_genome]
    anc_names = list(ref.sequences)
    node = result.tree.find(ref_genome)
    leaves = [lf for lf in node.leaf_names()]

    # composed leaf→ancestor maps
    leaf_maps: dict[str, dict[str, SeqMap]] = {}
    for lf in leaves:
        leaf_maps[lf] = leaf_map_to_ancestor(result, lf, ref_genome)

    # per (leaf seq): sort by target position for range queries
    indexed = []
    for lf in leaves:
        src_sizes = {n: len(s) for n, s in result.genomes[lf].items()}
        for sname, m in leaf_maps[lf].items():
            sel = np.flatnonzero(m.tgt_idx >= 0)
            if not len(sel):
                continue
            key = m.tgt_idx[sel].astype(np.int64) << 40 | m.tgt_pos[sel]
            order = np.argsort(key, kind="stable")
            indexed.append((lf, sname, src_sizes[sname], sel[order],
                            key[order], m))

    lens = step.caf.blocks.block_length()
    out: list[MafBlock] = []
    anc_index = {n: i for i, n in enumerate(anc_names)}
    items = sorted(ref.block_coord.items(),
                   key=lambda kv: (kv[1][0], kv[1][1]))
    if ref_seq is not None:
        hi = ref_end if ref_end is not None else 1 << 62
        items = [(b, (sn, a, o)) for b, (sn, a, o) in items
                 if sn == ref_seq and a < hi
                 and a + int(lens[b]) > ref_start]
    for b, (sname, astart, _orient) in items:
        L = int(lens[b])
        si = anc_index[sname]
        anc_codes = anc_genome[sname].codes[astart:astart + L]
        rows = []
        if include_ancestor and not leaves_only_rows:
            rows.append(MafRow(
                src=sname, start=astart, size=L, strand="+",
                src_size=len(anc_genome[sname]),
                text=_BASE_OF[anc_codes].tobytes().decode("ascii")))
        k0 = np.int64(si) << 40 | np.int64(astart)
        k1 = np.int64(si) << 40 | np.int64(astart + L)
        for lf, lname, src_size, pos_sorted, key_sorted, m in indexed:
            lo = np.searchsorted(key_sorted, k0, side="left")
            hi = np.searchsorted(key_sorted, k1, side="left")
            if hi <= lo:
                continue
            p = pos_sorted[lo:hi]
            cols = (key_sorted[lo:hi] - k0).astype(np.int64)
            strands = m.strand[p]
            # split into contiguous runs (same strand, lockstep advance)
            brk = np.ones(len(p), dtype=bool)
            if len(p) > 1:
                step_dir = strands[:-1].astype(np.int64)
                brk[1:] = ~((cols[1:] == cols[:-1] + 1)
                            & (p[1:] == p[:-1] + step_dir)
                            & (strands[1:] == strands[:-1]))
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], len(p))
            codes_all = result.genomes[lf][lname].codes
            for s0, e0 in zip(starts, ends):
                run_p = p[s0:e0]
                run_c = cols[s0:e0]
                strand = int(strands[s0])
                n = len(run_p)
                text = np.full(L, ord("-"), dtype=np.uint8)
                if strand == 1:
                    seg = codes_all[run_p[0]:run_p[0] + n]
                    text[run_c[0]:run_c[0] + n] = _BASE_OF[seg]
                    row = MafRow(src=lname, start=int(run_p[0]), size=n,
                                 strand="+", src_size=src_size,
                                 text=text.tobytes().decode("ascii"))
                else:
                    pmax = int(run_p[0])
                    seg = codes_all[pmax - n + 1:pmax + 1]
                    text[run_c[0]:run_c[0] + n] = _BASE_OF[revcomp(seg)]
                    row = MafRow(src=lname, start=src_size - pmax - 1,
                                 size=n, strand="-", src_size=src_size,
                                 text=text.tobytes().decode("ascii"))
                rows.append(row)
        if len(rows) >= (2 if not include_ancestor else 1):
            blk = MafBlock(rows=rows)
            if ref_seq is not None:
                hi = ref_end if ref_end is not None else astart + L
                blk = maf_block_trim(blk, max(0, ref_start - astart),
                                     min(L, hi - astart))
                if blk is None:
                    continue
            out.append(blk)
    return out


def write_hal2maf(path: str, result: ProgressiveResult,
                  ref_genome: str | None = None, **kw) -> None:
    from ..io.maf import write_maf
    write_maf(path, hal2maf(result, ref_genome, **kw))


# --------------------------------------------------------------------------
# halValidate equivalent
# --------------------------------------------------------------------------

def hal_validate(result: ProgressiveResult) -> list[str]:
    """Structural validation of the alignment hierarchy — the halValidate
    analog (reference runs halValidate over the HDF5 archive; the c2h
    grammar invariants are documented at hal/impl/hal.c:14-77).

    Returns a list of violation strings (empty == valid).  Checks, per
    ancestor step:
      - segment bounds: every pinch segment inside its sequence
      - live segments of one sequence never overlap
      - bottom segments (block placements) inside the ancestor sequence
        and non-overlapping per ancestor thread
      - maps: targets within the ancestor, strand != 0 iff aligned
      - parentage: every step event exists in the tree, its children's
        genomes exist
    """
    errs: list[str] = []
    for ev, step in result.steps.items():
        caf, ref = step.caf, step.ref
        table = caf.table
        blocks = caf.blocks
        # segment bounds
        seq_len = table.lengths[blocks.seg_seq]
        bad = (blocks.seg_start < 0) | (blocks.seg_start
                                        + blocks.seg_len > seq_len)
        if bad.any():
            errs.append(f"{ev}: {int(bad.sum())} segments out of bounds")
        # per-sequence live-segment overlap
        live = caf.alive[blocks.seg_block]
        order = np.lexsort((blocks.seg_start[live], blocks.seg_seq[live]))
        s_seq = blocks.seg_seq[live][order]
        s_sta = blocks.seg_start[live][order]
        s_end = s_sta + blocks.seg_len[live][order]
        if len(s_seq) > 1:
            ov = (s_seq[1:] == s_seq[:-1]) & (s_sta[1:] < s_end[:-1])
            if ov.any():
                errs.append(f"{ev}: {int(ov.sum())} overlapping live "
                            "segments")
        # bottom segments per ancestor thread
        lens = blocks.block_length()
        by_thread: dict[str, list[tuple[int, int]]] = {}
        for b, (sname, astart, _o) in ref.block_coord.items():
            L = int(lens[b])
            anc_seq = ref.sequences.get(sname)
            if anc_seq is None:
                errs.append(f"{ev}: block {b} placed on unknown thread "
                            f"{sname}")
                continue
            if astart < 0 or astart + L > len(anc_seq):
                errs.append(f"{ev}: block {b} outside thread {sname} "
                            f"({astart}+{L} vs {len(anc_seq)})")
            by_thread.setdefault(sname, []).append((astart, astart + L))
        for sname, spans in by_thread.items():
            spans.sort()
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                if b0 < a1:
                    errs.append(f"{ev}: overlapping bottom segments on "
                                f"{sname} at {b0}<{a1}")
                    break
        # maps
        anc_lens = [len(ref.sequences[n]) for n in step.anc_seq_names]
        for sname, m in step.maps.items():
            sel = m.tgt_idx >= 0
            if (m.tgt_idx >= len(anc_lens)).any():
                errs.append(f"{ev}: map {sname} targets unknown thread")
                continue
            if sel.any():
                tl = np.asarray(anc_lens)[m.tgt_idx[sel]]
                if ((m.tgt_pos[sel] < 0) | (m.tgt_pos[sel] >= tl)).any():
                    errs.append(f"{ev}: map {sname} target positions out "
                                "of bounds")
                if (m.strand[sel] == 0).any():
                    errs.append(f"{ev}: map {sname} aligned bases with "
                                "strand 0")
            if (m.strand[~sel] != 0).any():
                errs.append(f"{ev}: map {sname} unaligned bases with "
                            "nonzero strand")
        # parentage
        if result.tree.find(ev) is None:
            errs.append(f"step event {ev} not in tree")
    return errs
