"""MAF export from the block graph (hal2maf + taffy-norm equivalent).

Reference surface: `cactus-hal2maf` renders the HAL hierarchy as MAF
blocks, one per alignment block, rows keyed genome.seq with '-'-strand
rows in reverse-strand coordinates (maf/cactus_hal2maf.py:387-460; MAF
semantics as consumed by mafComparator).  Here blocks come straight from
the vectorized pinch graph: every live block is one gapless MAF block
whose rows are its segments in block-column order.
"""

from __future__ import annotations

import numpy as np

from ..io.fasta import Sequence, revcomp, _BASE_OF
from ..io.maf import MafBlock, MafRow
from .bar import global_codes
from .caf import CafResult


def blocks_to_maf(caf: CafResult, seqs: dict[str, Sequence],
                  min_degree: int = 2) -> list[MafBlock]:
    """Render live blocks as MAF blocks (sorted by first row position)."""
    gcodes = global_codes(caf.table, seqs)
    table = caf.table
    blocks = caf.blocks
    out: list[MafBlock] = []
    order = np.argsort(blocks.seg_block, kind="stable")
    sb = blocks.seg_block[order]
    bounds = np.concatenate([[0], np.flatnonzero(np.diff(sb)) + 1, [len(sb)]])
    for gi in range(len(bounds) - 1):
        idx = order[bounds[gi]:bounds[gi + 1]]
        if len(idx) == 0:
            continue
        b = int(blocks.seg_block[idx[0]])
        if not caf.alive[b] or len(idx) < min_degree:
            continue
        rows = []
        for i in idx:
            s = int(blocks.seg_seq[i])
            st = int(blocks.seg_start[i])
            ln = int(blocks.seg_len[i])
            strand = int(blocks.seg_strand[i])
            name = table.names[s]
            size = int(table.lengths[s])
            g0 = int(table.offsets[s]) + st
            codes = gcodes[g0:g0 + ln]
            if strand == 1:
                text = _BASE_OF[codes].tobytes().decode("ascii")
                rows.append(MafRow(src=name, start=st, size=ln, strand="+",
                                   src_size=size, text=text))
            else:
                text = _BASE_OF[revcomp(codes)].tobytes().decode("ascii")
                rows.append(MafRow(src=name, start=size - (st + ln), size=ln,
                                   strand="-", src_size=size, text=text))
        out.append(MafBlock(rows=rows))
    out.sort(key=lambda blk: (blk.rows[0].src, blk.rows[0].start))
    return out


def write_blocks_maf(path: str, caf: CafResult, seqs: dict[str, Sequence],
                     min_degree: int = 2) -> None:
    from ..io.maf import write_maf
    write_maf(path, blocks_to_maf(caf, seqs, min_degree=min_degree))


def hal2maf_chunked(result, ref_genome: str | None = None,
                    chunk_size: int = 100_000, workers: int = 4,
                    dup_filter: str | None = None,
                    norm: bool = False, **kw) -> list[MafBlock]:
    """Chunk-parallel hal2maf (the cactus-hal2maf fan-out,
    maf/cactus_hal2maf.py:234-460): the reference genome's coordinate
    space splits into ranges, each range renders + post-processes
    (dup filter, taffy-norm merge) independently on a thread pool, and
    chunks concatenate in range order — output equals the single-pass
    export."""
    from concurrent.futures import ThreadPoolExecutor

    from ..phases.hal import hal2maf

    ref_genome = ref_genome or result.tree.name
    ranges = []
    for name, seq in result.genomes[ref_genome].items():
        for start in range(0, len(seq), chunk_size):
            ranges.append((name, start, min(len(seq),
                                           start + chunk_size)))

    def one(r):
        name, a, b = r
        blocks = hal2maf(result, ref_genome, ref_seq=name, ref_start=a,
                         ref_end=b, **kw)
        if dup_filter:
            from ..maf_tools import dup_filter as df
            blocks = df(blocks, mode=dup_filter, ref_genome=ref_genome)
        if norm:
            from ..io.taf import taf_norm
            blocks = taf_norm(blocks)
        return blocks

    with ThreadPoolExecutor(max_workers=workers) as pool:
        parts = list(pool.map(one, ranges))
    out: list[MafBlock] = []
    for p in parts:
        out.extend(p)
    return out
