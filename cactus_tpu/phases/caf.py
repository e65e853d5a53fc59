"""CAF phase driver: pairwise PAF → pinch graph → melted block core.

Reference flow (caf/impl/caf.c:139-474): stCaf_setup builds the pinch
graph from the flower's threads; annealing pinches in the alignments
(primaries then secondaries, with the per-pinch alignment-filter policy
and per-round diagonal trim); megablocks with weak homology support are
destroyed; melting destroys chains shorter than the divergence-dependent
minimum chain length in rounds (deannealingRounds="2 32 256",
annealingRounds presets 2048..256, cactus_progressive_config.xml:195-231),
with chains broken at links whose median thread spacing exceeds
maximumMedianSequenceLengthBetweenLinkedEnds; blocks are end-trimmed
(blockTrim) and filtered by degree/species; recoverable chains are melted
(melting.c:472); giant adjacency components are broken greedily
(giantComponent.c).

This build: annealing runs in the native segment-level pinch graph
(graph/pinch.py — O(segments) memory, exact incremental filter
semantics); melting/filtering are vectorized numpy passes over the
exported block arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import CafParams
from ..graph.columns import Blocks, SeqTable
from ..graph import cactus as cactus_graph
from ..graph.pinch import pinch_blocks, records_to_runs


@dataclass
class CafResult:
    table: SeqTable
    blocks: Blocks
    alive: np.ndarray
    events_of_seq: list[str]
    # events whose threads entered the graph as OUTGROUP evidence
    # (caf.pinch_outgroups): downstream ordering must not let their
    # alignment-boundary wobble break ingroup-proven chains
    outgroup_events: frozenset = frozenset()

    def live_blocks(self) -> list[int]:
        return [b for b in range(self.blocks.n_blocks) if self.alive[b]]


def event_of(seq_name: str) -> str:
    return seq_name.split(".", 1)[0]


def run_caf(records, seq_lengths: dict[str, int], cfg: CafParams,
            preset: str = "default",
            ingroup_events: set[str] | None = None,
            outgroup_events: set[str] | None = None,
            min_chain_override: int | None = None,
            event_tree=None,
            log=None) -> CafResult:
    """Build and melt the block graph from PAF records (caf.c:139-474)."""
    log = log or (lambda msg: None)
    table = SeqTable.build(seq_lengths)
    events = [event_of(n) for n in table.names]
    ingroups = ingroup_events or set()
    outgroups = outgroup_events or set()

    primaries = [r for r in records if r.is_primary]
    secondaries = [r for r in records if not r.is_primary
                   and cfg.use_secondary_alignments]
    p_runs = records_to_runs(primaries, table)
    s_runs = records_to_runs(secondaries, table)

    # ---- annealing (single round per the reference's preset configs;
    # annealingRounds values are one-element lists, config XML :224-231)
    blocks = pinch_blocks(
        table, events,
        primary_runs=p_runs, secondary_runs=s_runs,
        outgroup_events=outgroups,
        alignment_filter=cfg.alignment_filter,
        trim=cfg.trim,
        min_degree=2)
    alive = np.ones(blocks.n_blocks, dtype=bool)
    log(f"caf anneal: {blocks.n_blocks} blocks, "
        f"{len(blocks.seg_block)} segments")

    # ---- megablock destruction (caf.c:409-440): blocks whose pinch
    # support is far below the possible homology count snarl the graph
    if (cfg.minimum_block_homology_support > 0
            and cfg.minimum_block_degree_to_check_support > 0
            and blocks.support is not None):
        alive &= ~megablock_mask(blocks, events, outgroups, cfg)

    # ---- melting rounds (deannealing, then the preset's final length)
    final_min = (min_chain_override if min_chain_override is not None
                 else cfg.annealing_for(preset)[-1])
    for t in sorted(t for t in cfg.deannealing_rounds if t < final_min):
        alive = cactus_graph.melt(blocks, alive, t)
    alive = cactus_graph.melt(
        blocks, alive, final_min,
        max_median_link_gap=cfg.max_median_sequence_length_between_linked_ends)

    # ---- block end trim + degree/species filters (the blockFilterFn melt,
    # caf.c:453: stCaf_melt(flower, threadSet, blockFilterFn, fa, blockTrim,
    # 0, 0, INT64_MAX))
    blocks, alive = block_trim(blocks, alive, cfg.block_trim)
    alive = filter_blocks_by_events(blocks, alive, cfg, ingroups, outgroups)
    if cfg.minimum_tree_coverage > 0:
        if event_tree is None:
            raise ValueError(
                "minimumTreeCoverage > 0 needs the event tree "
                "(run_caf(event_tree=...)); refusing to no-op silently")
        alive = tree_coverage_filter(blocks, alive, event_tree,
                                     cfg.minimum_tree_coverage)

    # ---- recoverable chains (caf.c:456-458)
    if cfg.remove_recoverable_chains not in ("0", "", None, False):
        policy = ("1" if cfg.remove_recoverable_chains is True
                  else str(cfg.remove_recoverable_chains))
        alive = cactus_graph.melt_recoverable_chains(
            blocks, alive, np.array(events),
            ingroups, outgroups, policy=policy,
            max_iterations=cfg.max_recoverable_chains_iterations,
            max_len=cfg.max_recoverable_chain_length)

    # ---- giant adjacency components (caf.c:469-471)
    if (cfg.minimum_block_degree >= 2
            and cfg.max_adjacency_component_size_ratio > 0):
        alive = cactus_graph.break_giant_components(
            blocks, alive, cfg.max_adjacency_component_size_ratio)

    log(f"caf done: {int(alive.sum())}/{blocks.n_blocks} blocks live")
    return CafResult(table=table, blocks=blocks, alive=alive,
                     events_of_seq=events,
                     outgroup_events=frozenset(outgroups))


def megablock_mask(blocks: Blocks, events: list[str],
                   outgroups: set[str], cfg: CafParams) -> np.ndarray:
    """True for megablocks to destroy (caf.c:409-440): degree above
    minimumBlockDegreeToCheckSupport and support ratio below
    minimumBlockHomologySupport, where possible homologies =
    2*C(inDeg,2) + inDeg*outDeg (no outgroup self-alignment; caf.c:42-61).
    """
    ev = np.array(events)
    is_og = np.isin(ev, sorted(outgroups))
    og_deg = np.bincount(blocks.seg_block,
                         weights=is_og[blocks.seg_seq].astype(np.float64),
                         minlength=blocks.n_blocks)
    deg = blocks.block_degree().astype(np.float64)
    in_deg = deg - og_deg
    possible = in_deg * (in_deg - 1) + in_deg * og_deg
    support = blocks.support.astype(np.float64)
    ratio = np.where(possible > 0, support / np.maximum(possible, 1), 1.0)
    return ((deg > cfg.minimum_block_degree_to_check_support)
            & (possible > 0)
            & (ratio < cfg.minimum_block_homology_support))


def block_trim(blocks: Blocks, alive: np.ndarray,
               trim: int) -> tuple[Blocks, np.ndarray]:
    """Trim `trim` columns off both ends of every live block
    (stPinchBlock_trim via stCaf_melt's blockEndTrim, melting.c:89-100).
    Blocks that would vanish are destroyed.  Dead blocks keep their
    segments untouched (they are already excluded by `alive`).
    """
    if trim <= 0:
        return blocks, alive
    lens = blocks.block_length()
    seg_live = alive[blocks.seg_block]
    seg_blen = lens[blocks.seg_block]
    shrink = seg_live & (seg_blen > 2 * trim)
    kill = alive & (lens <= 2 * trim)
    new_start = blocks.seg_start + np.where(shrink, trim, 0)
    new_len = blocks.seg_len - np.where(shrink, 2 * trim, 0)
    out = Blocks(table=blocks.table, seg_block=blocks.seg_block,
                 seg_seq=blocks.seg_seq, seg_start=new_start,
                 seg_len=new_len, seg_strand=blocks.seg_strand,
                 n_blocks=blocks.n_blocks, support=blocks.support)
    return out, alive & ~kill


def filter_blocks_by_events(blocks: Blocks, alive: np.ndarray,
                            cfg, ingroups: set[str],
                            outgroups: set[str]) -> np.ndarray:
    """Degree/species block filters (caf/impl/caf.c:9-20), vectorized.

    cfg needs: minimum_block_degree, minimum_number_of_species,
    minimum_ingroup_degree, minimum_outgroup_degree (CafParams and
    BarParams both carry them).
    """
    B = blocks.n_blocks
    if B == 0:
        return alive
    events = np.array([event_of(n) for n in blocks.table.names])
    uniq_ev, ev_id = np.unique(events, return_inverse=True)
    seg_ev = ev_id[blocks.seg_seq]
    deg = np.bincount(blocks.seg_block, minlength=B)

    # distinct species per block: unique (block, event) pairs
    key = blocks.seg_block * len(uniq_ev) + seg_ev
    n_species = np.bincount(np.unique(key) // len(uniq_ev), minlength=B)

    in_set = np.isin(uniq_ev, sorted(ingroups))
    og_set = np.isin(uniq_ev, sorted(outgroups))
    if ingroups:
        n_in = np.bincount(blocks.seg_block,
                           weights=in_set[seg_ev].astype(np.float64),
                           minlength=B).astype(np.int64)
    else:
        n_in = deg.astype(np.int64)
    n_out = np.bincount(blocks.seg_block,
                        weights=og_set[seg_ev].astype(np.float64),
                        minlength=B).astype(np.int64)

    ok = (deg >= cfg.minimum_block_degree)
    ok &= (n_species >= cfg.minimum_number_of_species)
    ok &= (n_in >= cfg.minimum_ingroup_degree)
    ok &= (n_out >= cfg.minimum_outgroup_degree)
    return alive & ok


def tree_coverage_filter(blocks: Blocks, alive: np.ndarray,
                         event_tree, min_coverage: float) -> np.ndarray:
    """Melt blocks whose tree coverage falls below minimumTreeCoverage
    (stCaf_treeCoverage, caf/impl/filtering.c:467-499): coverage is the
    branch length of the Steiner subtree spanning the block's events
    (rooted at their LCA) over the event tree's total branch length.

    Vectorized by event-set bitmask: blocks with the same event subset
    share one Steiner computation.
    """
    B = blocks.n_blocks
    if B == 0 or min_coverage <= 0:
        return alive
    events = np.array([event_of(n) for n in blocks.table.names])
    # normalize over the events PRESENT in this CAF problem: outgroups
    # are overlay-only here (never pinched into blocks), so an event
    # tree carrying og branches would deflate every block's coverage
    # and over-melt (reference blocks can contain og segments, so its
    # whole-tree denominator is attainable; ours must be too)
    present = set(events.tolist())
    leaves = [l for l in event_tree.leaf_names() if l in present]
    if not leaves:
        return alive
    eidx = {e: i for i, e in enumerate(leaves)}
    # multi-word bitmask: 62 event bits per int64 word, any event count
    # (reference caf/impl/filtering.c:467-499 has no cap; the round-2
    # single-word NotImplementedError is gone)
    W = max(1, -(-len(leaves) // 62))
    seg_words = np.zeros((len(events), W), np.int64)
    ev_bit = np.full(len(events), -1, np.int64)
    for si, e in enumerate(events):
        if e in eidx:
            ev_bit[si] = eidx[e]
    has = ev_bit >= 0
    seg_words[has, ev_bit[has] // 62] = np.int64(1) << (ev_bit[has] % 62)
    seg_words = seg_words[blocks.seg_seq]
    mask_w = np.zeros((B, W), np.int64)
    for w in range(W):
        np.bitwise_or.at(mask_w[:, w], blocks.seg_block, seg_words[:, w])
    # python-int view per block (arbitrary precision for the tree walk)
    uniq_w, inv = np.unique(mask_w, axis=0, return_inverse=True)

    def words_to_int(row) -> int:
        out = 0
        for w in range(W):
            out |= int(row[w]) << (62 * w)
        return out

    # per-node leaf bitmask via postorder
    node_mask: dict[int, int] = {}

    def fill(t):
        if not t.children:
            # leaves absent from this CAF problem (overlay-only
            # outgroups) carry no bit
            node_mask[id(t)] = (1 << eidx[t.name]
                                if t.name in eidx else 0)
            return node_mask[id(t)]
        m = 0
        for c in t.children:
            m |= fill(c)
        node_mask[id(t)] = m
        return m
    fill(event_tree)

    def steiner(mask_val: int) -> float:
        # edge above node v counts iff subtree(v) contains >=1 of S and
        # NOT all of S (edges above the LCA never qualify)
        total = 0.0
        stack = [event_tree]
        while stack:
            t = stack.pop()
            for c in t.children:
                cm = node_mask[id(c)] & mask_val
                if cm and cm != mask_val:
                    total += (c.length or 0.0)
                if cm:
                    stack.append(c)
        return total

    # denominator: the Steiner span of ALL present events — a block
    # containing every event scores exactly 1.0
    whole = steiner((1 << len(leaves)) - 1)
    if whole <= 0:
        return alive
    cov_uniq = np.array([
        steiner(mv) / whole if (mv := words_to_int(row)) else 0.0
        for row in uniq_w])
    cov = cov_uniq[inv]
    return alive & (cov >= min_coverage)


def blocks_to_match_edges(blocks: Blocks, alive: np.ndarray):
    """Serialize live blocks back to match runs, vectorized.

    Each block becomes a star of pairwise matches against its first
    segment, letting downstream passes rebuild the graph from
    (CAF ∪ BAR) evidence.  Returns an (N, 4) int64 array of
    (ga, gb, ln, strand) global runs: strand +1 pairs [ga, ga+ln) with
    [gb, gb+ln) forward; -1 reversed.  (An earlier revision returned a
    list of tuples — ~200 B/run of transient Python objects at genome
    scale.)
    """
    live = alive[blocks.seg_block]
    idx = np.flatnonzero(live)
    if not len(idx):
        return np.zeros((0, 4), np.int64)
    blk = blocks.seg_block[idx]
    order = np.argsort(blk, kind="stable")
    idx = idx[order]
    blk = blk[order]
    g0 = blocks.table.offsets[blocks.seg_seq[idx]] + blocks.seg_start[idx]
    ln = blocks.seg_len[idx]
    st = blocks.seg_strand[idx].astype(np.int64)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(blk)) + 1])
    counts = np.diff(np.concatenate([starts, [len(blk)]]))
    first = np.repeat(starts, counts)
    members = np.arange(len(blk))
    rest = members != first
    base, mem = first[rest], members[rest]
    return np.stack([g0[base], g0[mem], ln[base], st[base] * st[mem]],
                    axis=1).astype(np.int64)
