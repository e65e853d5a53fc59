"""BAR phase: base-level refinement of the unaligned tangles left by CAF.

Reference flow (bar/impl/bar.c:52-176): for each leaf flower, gather the
adjacency sequences hanging off each block End (cap→cap strings, capped at
bandingLimit=1e6, cactus_progressive_config.xml:245), build one MSA per
End (abPOA windowed partial-order alignment, poaBarAligner.c:1115-1240, or
cPecan pair-HMM), keep every base in exactly ONE end's alignment
(consistency trimming, poaBarAligner.c:751-806), and pinch the MSA blocks
back into the graph (mini CAF anneal/melt, bar.c:133-145).

TPU-first design here:
 - the MSA engine is a batched STAR alignment on the banded affine-DP
   kernel (ops/banded.py): per end, the longest adjacency string is the
   backbone and every other member is banded-aligned to it; transitivity
   through backbone columns yields the multiple alignment (the poset-MSA
   analog).  All (member, backbone) pairs across ALL ends are packed into
   shape-binned device batches — the vmap-over-padded-bins replacement
   for the reference's OpenMP flower loop (SURVEY.md §2.4).
 - consistency: each adjacency gap is split at its midpoint; the left
   half belongs to the exit end's alignment, the right half (reverse
   complement) to the entry end's (degenerate form of the reference's
   best-cut trimming — a later-round refinement).
 - BAR match runs merge with the CAF block runs and columns/blocks are
   rebuilt in one vectorized pass (graph/columns.py), replacing the
   reference's incremental re-pinching.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import BarParams, PoaParams
from ..io.fasta import Sequence, revcomp
from ..graph import chains as chain_graph
from ..graph.columns import SeqTable, build_columns, columns_to_blocks
from ..ops.banded import GapParams, align_pairs_banded, score_matrix_6
from .caf import CafResult, blocks_to_match_edges, filter_blocks_by_events, event_of

BOUNDARY = chain_graph.BOUNDARY


def global_codes(table: SeqTable, seqs: dict[str, Sequence]) -> np.ndarray:
    """Concatenate per-sequence codes into the table's global index space."""
    out = np.empty(table.total, dtype=np.uint8)
    for name, i in table.index.items():
        o = int(table.offsets[i])
        out[o:o + int(table.lengths[i])] = seqs[name].codes
    return out


@dataclass
class EndString:
    """One adjacency string oriented walking away from its end.

    Oriented position i maps to global base:
      forward: gstart + i            (strand +1)
      reverse: gend - 1 - i          (strand -1)
    """
    gstart: int
    gend: int
    forward: bool

    def length(self) -> int:
        return self.gend - self.gstart

    def codes(self, gcodes: np.ndarray) -> np.ndarray:
        c = gcodes[self.gstart:self.gend]
        return c if self.forward else revcomp(c)

    def to_run(self, i0: int, ln: int) -> tuple[int, int]:
        """Oriented run [i0, i0+ln) → (global ascending start, strand)."""
        if self.forward:
            return self.gstart + i0, 1
        return self.gend - i0 - ln, -1


def end_strings(caf: CafResult, cfg: BarParams,
                min_len: int = 2) -> dict[int, list[EndString]]:
    """Collect the adjacency strings per block end.

    Each thread adjacency contributes its gap: split at the midpoint
    between two real ends; assigned wholly to the real end when the other
    side is a thread boundary.  Strings are capped at the POA window
    (reference caps at bandingLimit then windows at 10 kb;
    config:245,308).
    """
    cap = min(cfg.banding_limit, cfg.poa.window, cfg.max_end_string)
    adj = chain_graph.thread_adjacencies(caf.blocks, caf.alive)
    table = caf.table
    per_end: dict[int, list[EndString]] = {}
    for k in range(len(adj.seq)):
        u, v = int(adj.end_u[k]), int(adj.end_v[k])
        s = int(adj.seq[k])
        g0 = int(table.offsets[s] + adj.gap_start[k])
        g1 = int(table.offsets[s] + adj.gap_end[k])
        L = g1 - g0
        if L < min_len:
            continue
        if u == BOUNDARY and v == BOUNDARY:
            continue
        if v == BOUNDARY:
            lo, hi = g0, g0 + min(L, cap)
            per_end.setdefault(u, []).append(EndString(lo, hi, True))
        elif u == BOUNDARY:
            lo, hi = g1 - min(L, cap), g1
            per_end.setdefault(v, []).append(EndString(lo, hi, False))
        else:
            mid = g0 + (L + 1) // 2
            left = min(mid - g0, cap)
            right = min(g1 - mid, cap)
            if left >= min_len:
                per_end.setdefault(u, []).append(
                    EndString(g0, g0 + left, True))
            if right >= min_len:
                per_end.setdefault(v, []).append(
                    EndString(g1 - right, g1, False))
    return per_end


def star_align_ends(per_end: dict[int, list[EndString]],
                    gcodes: np.ndarray, cfg: BarParams,
                    max_band: int = 2048,
                    ingroup_seqs: np.ndarray | None = None):
    """Batched star MSA over all ends → global match runs.

    Returns a list of (ga, gb, ln, strand) runs (edges_from_runs format).
    Pairs are length-trimmed so the backbone slice matches the member
    length (+slack), keeping bands narrow; the pair list across all ends
    is aligned in shape-binned device batches.

    ingroup_seqs: boolean per global base — when given, the backbone is
    the longest INGROUP member (an outgroup backbone makes every
    ingroup↔ingroup homology transit two high-divergence alignments,
    which poisons the columns; reference BAR avoids this by running a
    full MSA rather than a star).
    """
    poa: PoaParams = cfg.poa
    submat = score_matrix_6(poa.sub_matrix)
    gap = GapParams(poa.gap_open1, poa.gap_extend1)

    def is_ingroup(e: EndString) -> bool:
        if ingroup_seqs is None:
            return True
        return bool(ingroup_seqs[e.gstart])

    jobs = []        # (member EndString, backbone EndString, t_len)
    for end, members in per_end.items():
        if len(members) < 2:
            continue
        members = sorted(members,
                         key=lambda e: (not is_ingroup(e), -e.length()))
        backbone = members[0]
        bb_len = backbone.length()
        for m in members[1:]:
            ml = m.length()
            # adaptive band (reference: abPOA band 1000 + 0.1*len,
            # config:310-311); skip pathological length ratios
            t_len = min(bb_len, ml + poa.band_constant // 4)
            band = 128
            need = abs(t_len - ml) + min(
                poa.band_constant + int(poa.band_fraction * ml), max_band)
            while band <= need:
                band *= 2
            if band > max_band:
                continue
            jobs.append((m, backbone, t_len, band))

    runs: list[tuple[int, int, int, int]] = []
    by_band: dict[int, list] = {}
    for job in jobs:
        by_band.setdefault(job[3], []).append(job)

    def emit(m: EndString, b: EndString, i0: int, j0: int, ln: int):
        ga, sa = m.to_run(i0, ln)
        gb, sb = b.to_run(j0, ln)
        if sa == 1:
            runs.append((ga, gb, ln, sb))
        elif sb == 1:
            runs.append((gb, ga, ln, sa))
        else:
            # both reversed: forward pairing of the reversed intervals
            runs.append((ga, gb, ln, 1))

    engine = cfg.msa_engine
    if not cfg.partial_order_alignment and engine == "star":
        engine = "pecan"   # reference semantics: POA off → cPecan path

    if engine == "poa":
        # true partial-order MSA per end (abPOA-parity path): all member
        # pairs sharing a column emit matches, not just member↔backbone
        from ..ops.poa import poa_msa
        for end, members in per_end.items():
            if len(members) < 2:
                continue
            members = sorted(members, key=lambda e: -e.length())
            seqs_o = [m.codes(gcodes) for m in members]
            graph = poa_msa(seqs_o)
            matched = graph.match_runs_between_walks()
            matched.sort()
            prev = None
            start = None
            run_len = 0
            for wi, pi, wj, pj in matched:
                if (prev is not None and prev[0] == wi and prev[2] == wj
                        and pi == prev[1] + 1 and pj == prev[3] + 1):
                    run_len += 1
                else:
                    if prev is not None:
                        emit(members[start[0]], members[start[2]],
                             start[1], start[3], run_len)
                    start = (wi, pi, wj, pj)
                    run_len = 1
                prev = (wi, pi, wj, pj)
            if prev is not None:
                emit(members[start[0]], members[start[2]],
                     start[1], start[3], run_len)
        return runs

    for band, group in by_band.items():
        pairs = [(m.codes(gcodes), b.codes(gcodes)[:t_len])
                 for m, b, t_len, _ in group]
        if engine == "star":
            out = align_pairs_banded(pairs, submat, gap, band=band)
            for (m, b, t_len, _), (_score, ops) in zip(group, out):
                i = j = 0
                for op, ln in ops:
                    if op == "M":
                        emit(m, b, i, j, ln)
                        i += ln
                        j += ln
                    elif op == "I":
                        i += ln
                    else:
                        j += ln
        else:
            # pecan path: pair-HMM posterior matches (bar.c cPecan branch)
            from ..ops.pairhmm import HmmParams, posterior_pairs_banded
            hits = posterior_pairs_banded(pairs, HmmParams(), band=band,
                                          gamma=0.5)
            for (m, b, t_len, _), matched in zip(group, hits):
                # merge consecutive (i,j) hits into runs
                start = None
                for k, (i, j, _p) in enumerate(matched):
                    if (start is not None
                            and i == matched[k - 1][0] + 1
                            and j == matched[k - 1][1] + 1):
                        continue
                    if start is not None:
                        i0, j0 = matched[start][:2]
                        emit(m, b, i0, j0, matched[k - 1][0] - i0 + 1)
                    start = k
                if start is not None:
                    i0, j0 = matched[start][:2]
                    emit(m, b, i0, j0, matched[-1][0] - i0 + 1)
    return runs


def run_bar(caf: CafResult, seqs: dict[str, Sequence],
            cfg: BarParams,
            ingroup_events: set[str] | None = None,
            outgroup_events: set[str] | None = None) -> CafResult:
    """Refine the CAF result with base-level end alignments.

    CAF block evidence and BAR MSA evidence are merged and the
    columns/blocks rebuilt; block filters re-apply (bar re-runs the CAF
    filters on the refined graph, reference bar.c:133-145).
    """
    if not cfg.run_bar:
        return caf
    gcodes = global_codes(caf.table, seqs)
    per_end = end_strings(caf, cfg)
    ingroup_seqs = None
    if ingroup_events:
        ingroup_seqs = np.zeros(caf.table.total, dtype=bool)
        for name, i in caf.table.index.items():
            if name.split(".", 1)[0] in ingroup_events:
                o = int(caf.table.offsets[i])
                ingroup_seqs[o:o + int(caf.table.lengths[i])] = True
    bar_runs = star_align_ends(per_end, gcodes, cfg,
                               ingroup_seqs=ingroup_seqs)
    caf_runs = blocks_to_match_edges(caf.blocks, caf.alive)
    # rebuild the graph from (CAF ∪ BAR) evidence on the segment-level
    # pinch path (the mini CAF re-anneal of bar.c:133-145); CAF block
    # runs pinch first so established homology keeps its orientation
    from ..graph.pinch import pinch_blocks, global_runs_to_thread_runs
    blocks = pinch_blocks(
        caf.table, caf.events_of_seq,
        primary_runs=global_runs_to_thread_runs(
            caf_runs + bar_runs, caf.table),
        min_degree=cfg.minimum_block_degree)
    alive = np.ones(blocks.n_blocks, dtype=bool)
    # BarParams carries the same degree/species knobs as CafParams, so the
    # CAF block filter applies directly to the refined graph
    alive = filter_blocks_by_events(blocks, alive, cfg,
                                    ingroup_events or set(),
                                    outgroup_events or set())
    return CafResult(table=caf.table, blocks=blocks, alive=alive,
                     events_of_seq=caf.events_of_seq)
