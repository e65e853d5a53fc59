"""Nested tangle refinement: a second CAF/BAR decomposition inside
large unaligned link interiors (VERDICT r2 missing #2).

The reference re-runs CAF/BAR recursively inside each child flower
layer by layer (pipeline/cactus_consolidated.c:115-144,439-460;
caf/impl/finishing.c:438 builds the child hierarchy), so homology
hidden inside a tangle the first pass bridged as an adjacency — an
inversion inside a shared insertion, a diverged interior of an SV —
still gets aligned.  The flat block model here has no explicit flower
tree, but the same subproblems are recoverable: a "link interior" is a
set of long unaligned sequence intervals that share the same pair of
flanking blocks.  One refinement level re-anchors those interval sets
against each other with the full blast stack (seeds → chains → banded
fill, both strands) and pinches the findings back into the graph with
the BAR merge machinery — the one-level analog of the reference's
recursion (one level suffices: interiors of interiors reuse the same
grouping on the rebuilt graph).
"""

from __future__ import annotations

import numpy as np

from ..config import Config
from ..io.fasta import Sequence
from .caf import CafResult, blocks_to_match_edges, filter_blocks_by_events


def link_interiors(caf: CafResult, min_len: int, max_len: int):
    """Unaligned intervals >= min_len grouped by their flanking live
    block pair.  Returns {frozenset{leftblock,rightblock}: [(seq_idx,
    start, end)]} — only interiors whose BOTH flanks are aligned (true
    link interiors; sequence tails are BAR's job, not a tangle)."""
    blocks = caf.blocks
    groups: dict[frozenset, list] = {}
    sel = np.flatnonzero(caf.alive[blocks.seg_block])
    if not len(sel):
        return groups
    # O(segments), NOT O(bases): the old per-base block-id raster was a
    # whole-genome int64 array (8 B/base — 8 GB/Gb) plus int64
    # expansions of every aligned base; gaps fall straight out of the
    # per-sequence sorted segment list (a base is in at most one
    # block, so segments are disjoint and a gap's flanks are the
    # segments around it)
    seq = blocks.seg_seq[sel]
    start = blocks.seg_start[sel].astype(np.int64)
    end = start + blocks.seg_len[sel]
    blk = blocks.seg_block[sel]
    order = np.lexsort((start, seq))
    seq, start, end, blk = (seq[order], start[order],
                            end[order], blk[order])
    same = seq[1:] == seq[:-1]
    gap = start[1:] - end[:-1]
    ok = same & (gap >= min_len) & (gap <= max_len)
    for i in np.flatnonzero(ok):
        key = frozenset((int(blk[i]), int(blk[i + 1])))
        groups.setdefault(key, []).append(
            (int(seq[i]), int(end[i]), int(start[i + 1])))
    return {k: v for k, v in groups.items() if len(v) >= 2}


def _seedless_runs_batch(jobs, max_side: int = 16_384,
                         gamma: float = 0.9, min_frac: float = 0.4,
                         min_side: int = 200, split_span: int = 3000):
    """Pecan-in-tangle: pair-HMM posterior alignment of interval pairs
    where no seed survived (high divergence and/or the reverse
    orientation, which the forward-only BAR end alignment cannot see).

    jobs: [(qa, tb, gq_off, gt_off)].  Both strands of every job are
    MUM-anchor-split first (the cPecan splitMatrixBiggerThanThis=3000
    semantics, reference config XML :276-280) so pieces run narrow
    bands; all pieces dispatch through the batched posterior kernel in
    pow2 length bins.  Anchorless pieces (the wrong strand, true
    tangles) fall back to a diagonal band capped at MAX_PALLAS_BAND.
    The better orientation's confident matched pairs (posterior >=
    gamma) become global match runs — garbage pairings yield diffuse
    posteriors and die at the min_frac acceptance, so force-aligned
    junk never pinches.  Returns [(ga, gb, ln, strand)] global runs."""
    from ..io.fasta import revcomp
    from ..ops.anchors import split_pair_by_mums
    from ..ops.pairhmm import (HmmParams, MAX_PALLAS_BAND,
                               posterior_pairs_banded)
    by_band: dict[int, list] = {}   # band -> [(job idx, strand, q0, t0,
    #                                           qseg, tseg)]
    kept_jobs = []
    for job in jobs:
        qa, tb = job[0], job[1]
        if (min(len(qa), len(tb)) < min_side
                or max(len(qa), len(tb)) > max_side):
            # boundary slivers aren't tangles: low-confidence pinches
            # on the edge of an aligned region fragment good blocks
            continue
        ji = len(kept_jobs)
        kept_jobs.append(job)
        for strand, q in ((1, qa), (-1, revcomp(qa))):
            for q0, t0, qs, ts in split_pair_by_mums(
                    q, tb, max_span=split_span, recursive=True):
                span = (abs(len(qs) - len(ts))
                        + max(64, max(len(qs), len(ts)) // 4))
                # two canonical bands only (512 / 2048): every distinct
                # (P, Mmax, band) dispatch shape is a fresh ~35 s Mosaic
                # compile on the remote backend, and this path's work is
                # tiny relative to that (measured 655 s for 0.04 Gcells
                # at the 600 kb gate, all of it shape compiles)
                if span + 16 >= MAX_PALLAS_BAND:
                    # the band cannot cover the diagonal range: an
                    # anchorless long piece (wrong strand / unrelated) —
                    # its posterior is diffuse and dies at min_frac, so
                    # skip the compute
                    continue
                band = 512 if span + 16 < 512 else MAX_PALLAS_BAND
                by_band.setdefault(band, []).append(
                    (ji, strand, q0, t0, qs, ts))
    params = HmmParams()
    # canonical (64, 4096, band) dispatch shapes ONLY on TPU, where the
    # per-shape Mosaic compile (~35 s) dominates and the padded cells
    # are nearly free; on the XLA-CPU backend padded cells cost real
    # time, so keep the default tight pow2 bins there
    import jax
    on_tpu = jax.devices()[0].platform == "tpu"
    shape_kw = (dict(min_batch=64, max_batch=64, min_rows_bin=4096)
                if on_tpu else dict(max_batch=32))
    # matched pairs per (job, strand), assembled across pieces
    matched: dict[tuple[int, int], list] = {}
    for band, grp in sorted(by_band.items()):
        cands = posterior_pairs_banded([(qs, ts) for *_k, qs, ts in grp],
                                       params, band=band, gamma=gamma,
                                       **shape_kw)
        for (ji, strand, q0, t0, _qs, _ts), hits in zip(grp, cands):
            matched.setdefault((ji, strand), []).extend(
                (i + q0, j + t0) for i, j, _p in hits)
    runs = []
    for ji, (qa, tb, gq_off, gt_off) in enumerate(kept_jobs):
        best_strand, best = None, None
        for strand in (1, -1):
            m = matched.get((ji, strand), [])
            if best is None or len(m) > len(best):
                best, best_strand = m, strand
        if not best or len(best) < min_frac * min(len(qa), len(tb)):
            continue
        best.sort()
        qp = np.array([m[0] for m in best], np.int64)
        tp = np.array([m[1] for m in best], np.int64)
        # consecutive diagonal pairs → runs (aligned orientation)
        brk = np.flatnonzero((np.diff(qp) != 1)
                             | (np.diff(tp) != 1)) + 1
        starts = np.concatenate([[0], brk])
        ends = np.concatenate([brk, [len(qp)]])
        L = len(qa)
        for s, e in zip(starts, ends):
            ln = int(e - s)
            q0a, t0 = int(qp[s]), int(tp[s])
            if best_strand == 1:
                runs.append((gq_off + q0a, gt_off + t0, ln, 1))
            else:
                # aligned-orientation q interval [q0a, q0a+ln)
                # sits at forward [L-q0a-ln, L-q0a) and pairs
                # REVERSED with t
                runs.append((gq_off + L - q0a - ln, gt_off + t0,
                             ln, -1))
    return runs


def refine_nested(caf: CafResult, seqs: dict[str, Sequence],
                  cfg: Config, preset: str,
                  ingroup_events: set[str],
                  outgroup_events: set[str],
                  log=None) -> CafResult:
    """One level of interior re-decomposition; returns the (possibly
    unchanged) CafResult."""
    log = log or (lambda m: None)
    groups = link_interiors(caf, cfg.nested_min_interior,
                            cfg.nested_max_interior)
    if not groups:
        return caf
    from . import blast as blast_phase
    table = caf.table
    names = list(table.names)
    codes = {n: seqs[n].codes for n in names if n in seqs}
    new_records = []
    seedless_jobs = []
    n_pairs = 0
    for key, members in groups.items():
        members = members[:cfg.nested_max_members]
        # all-vs-all for small tangles; star (everyone vs the longest
        # member) for big ones — transitivity through the representative
        # pinches the group into shared columns (the reference's poset
        # MSA is likewise transitive, flowerAligner.h:33), and the pair
        # count stays O(m) instead of O(m^2)
        if len(members) <= 4:
            pair_idx = [(i, j) for i in range(len(members))
                        for j in range(i + 1, len(members))]
        else:
            rep = max(range(len(members)),
                      key=lambda i: members[i][2] - members[i][1])
            pair_idx = [(i, rep) for i in range(len(members))
                        if i != rep]
        for i, j in pair_idx:
            (si, s1, e1), (sj, s2, e2) = members[i], members[j]
            na, nb = names[si], names[sj]
            if na not in codes or nb not in codes:
                continue
            qa = Sequence("q", codes[na][s1:e1])
            tb = Sequence("t", codes[nb][s2:e2])
            recs = blast_phase.align_contig_pair(
                qa, tb, "q", "t", cfg.blast, preset,
                self_alignment=(si == sj))
            for r in recs:
                # rebase interval-local coords onto the real seqs
                r.qname, r.qlen = na, int(table.lengths[si])
                r.qstart += s1
                r.qend += s1
                r.tname, r.tlen = nb, int(table.lengths[sj])
                r.tstart += s2
                r.tend += s2
            if not recs and si != sj:
                # no seeds survive in this interior: pecan role
                seedless_jobs.append(
                    (qa.codes, tb.codes,
                     int(table.offsets[si]) + s1,
                     int(table.offsets[sj]) + s2))
            new_records.extend(recs)
            n_pairs += 1
    seedless = _seedless_runs_batch(seedless_jobs)
    if not new_records and not seedless:
        return caf
    log(f"nested refinement: {len(groups)} tangles, {n_pairs} interval "
        f"pairs, {len(new_records)} records + {len(seedless)} "
        f"seedless runs")
    from ..graph.pinch import (global_runs_to_thread_runs, pinch_blocks,
                               records_to_runs)
    p_runs = records_to_runs([r for r in new_records if r.is_primary],
                             table)
    caf_runs = blocks_to_match_edges(caf.blocks, caf.alive)
    seed_arr = (np.asarray(seedless, np.int64).reshape(-1, 4)
                if len(seedless) else np.zeros((0, 4), np.int64))
    g_runs = global_runs_to_thread_runs(
        np.concatenate([caf_runs, seed_arr]), table)
    merged = {k: np.concatenate([g_runs[k], p_runs[k]])
              for k in g_runs}
    blocks = pinch_blocks(
        table, caf.events_of_seq,
        primary_runs=merged,
        min_degree=cfg.bar.minimum_block_degree)
    alive = np.ones(blocks.n_blocks, dtype=bool)
    alive = filter_blocks_by_events(blocks, alive, cfg.bar,
                                    ingroup_events, outgroup_events)
    return CafResult(table=table, blocks=blocks, alive=alive,
                     events_of_seq=caf.events_of_seq,
                     outgroup_events=caf.outgroup_events)
