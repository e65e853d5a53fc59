"""Chains, melting and adjacency groups over the block graph.

Replaces the CAF annealing/melting machinery and the group/link structure
of the cactus graph (reference: caf/impl/melting.c, caf/impl/annealing.c,
caf/impl/finishing.c; chain semantics per DOI 10.1101/gr.123356.111 and
config annealingRounds/deannealingRounds at
cactus_progressive_config.xml:195-231).

Simplifications vs the full cactus graph (round-1): chains are detected as
maximal link-paths where two block ends are exclusively adjacent to each
other; melting destroys blocks of chains shorter than the round threshold.
The 3-edge-connected-component cactus decomposition is computed by
graph/cactus.py (XOR-label 2-edge-cut classes); this module keeps the
link-path structure used by melting, and graph/flowers.py derives the
recursive Flower/Chain/Link view from it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import connected_components

from .columns import Blocks

BOUNDARY = -1  # virtual end id for thread boundaries


@dataclass
class Adjacencies:
    """All thread adjacencies between consecutive live segments.

    end encoding: 2*block + 0 (left/5' end) or 2*block + 1 (right/3' end);
    BOUNDARY marks a thread start/end.
    """
    end_u: np.ndarray     # exit end of the earlier segment (or BOUNDARY)
    end_v: np.ndarray     # entry end of the later segment (or BOUNDARY)
    seq: np.ndarray       # sequence id of the adjacency
    gap_start: np.ndarray # local start of the unaligned gap
    gap_end: np.ndarray   # local end (exclusive)


def thread_adjacencies(blocks: Blocks, alive: np.ndarray) -> Adjacencies:
    """Scan each sequence's live segments in order and emit adjacencies,
    including the two boundary adjacencies per sequence."""
    live = alive[blocks.seg_block]
    seq = blocks.seg_seq[live]
    start = blocks.seg_start[live]
    length = blocks.seg_len[live]
    strand = blocks.seg_strand[live]
    block = blocks.seg_block[live]
    order = np.lexsort((start, seq))
    seq, start, length, strand, block = (
        seq[order], start[order], length[order], strand[order], block[order])

    # exit end in thread direction: +1 strand exits via right end (2b+1),
    # -1 strand exits via left end (2b)
    exit_end = 2 * block + (strand == 1)
    entry_end = 2 * block + (strand == -1)

    eu, ev, aseq, gs, ge = [], [], [], [], []
    n = len(seq)
    same_thread = np.zeros(max(n - 1, 0), dtype=bool)
    if n > 1:
        same_thread = seq[1:] == seq[:-1]
        eu.append(exit_end[:-1][same_thread])
        ev.append(entry_end[1:][same_thread])
        aseq.append(seq[:-1][same_thread])
        gs.append((start[:-1] + length[:-1])[same_thread])
        ge.append(start[1:][same_thread])
    # boundaries: first/last live segment of each sequence + fully
    # unaligned sequences
    S = len(blocks.table.names)
    first_mask = np.ones(n, dtype=bool)
    last_mask = np.ones(n, dtype=bool)
    if n > 1:
        first_mask[1:] = ~same_thread
        last_mask[:-1] = ~same_thread
    seq_has = np.zeros(S, dtype=bool)
    seq_has[seq] = True
    # leading gap
    eu.append(np.full(first_mask.sum(), BOUNDARY, dtype=np.int64))
    ev.append(entry_end[first_mask])
    aseq.append(seq[first_mask])
    gs.append(np.zeros(first_mask.sum(), dtype=np.int64))
    ge.append(start[first_mask])
    # trailing gap
    eu.append(exit_end[last_mask])
    ev.append(np.full(last_mask.sum(), BOUNDARY, dtype=np.int64))
    aseq.append(seq[last_mask])
    gs.append((start + length)[last_mask])
    ge.append(blocks.table.lengths[seq[last_mask]])
    # sequences without any live segment: one boundary-boundary adjacency
    empty = np.flatnonzero(~seq_has)
    eu.append(np.full(len(empty), BOUNDARY, dtype=np.int64))
    ev.append(np.full(len(empty), BOUNDARY, dtype=np.int64))
    aseq.append(empty)
    gs.append(np.zeros(len(empty), dtype=np.int64))
    ge.append(blocks.table.lengths[empty])

    return Adjacencies(
        end_u=np.concatenate(eu), end_v=np.concatenate(ev),
        seq=np.concatenate(aseq),
        gap_start=np.concatenate(gs), gap_end=np.concatenate(ge))


def find_links(adj: Adjacencies, n_blocks: int) -> np.ndarray:
    """Ends u,v are linked iff every adjacency at u meets v and vice versa
    (and neither touches a thread boundary).  Returns (L, 2) end pairs."""
    # canonical undirected pairs
    a = np.concatenate([adj.end_u, adj.end_v])
    b = np.concatenate([adj.end_v, adj.end_u])
    ok = a >= 0
    a, b = a[ok], b[ok]
    n_ends = 2 * n_blocks
    # per end: unique partner or -2
    partner = np.full(n_ends, -3, dtype=np.int64)  # -3 = unseen
    order = np.argsort(a, kind="stable")
    a_s, b_s = a[order], b[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(a_s)) + 1])
    bmin = np.minimum.reduceat(b_s, starts)
    bmax = np.maximum.reduceat(b_s, starts)
    uniq_partner = np.where(bmin == bmax, bmin, -2)
    partner[a_s[starts]] = uniq_partner
    # link requires mutual exclusive partnership, no boundary, no self-block
    u = np.arange(n_ends)
    p = partner
    mutual = (p >= 0)
    mutual &= p != u
    pm = np.where(mutual, p, 0)
    mutual &= partner[pm] == u
    mutual &= (pm // 2) != (u // 2)  # no self-block links (tiny cycles)
    pairs = np.stack([u[mutual], p[mutual]], axis=1)
    pairs = pairs[pairs[:, 0] < pairs[:, 1]]
    return pairs


def chain_components(n_blocks: int, links: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Chains = connected components of blocks under link edges.

    Returns (chain_id per block, chain base-length per chain needs caller
    to aggregate).  Links connect block(u)//2 to block(v)//2.
    """
    if n_blocks == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    u = links[:, 0] // 2 if len(links) else np.zeros(0, np.int64)
    v = links[:, 1] // 2 if len(links) else np.zeros(0, np.int64)
    from ..native.build import cc_edges
    chain_id = cc_edges(n_blocks, u, v)
    return chain_id, np.bincount(chain_id).astype(np.int64)


def melt(blocks: Blocks, alive: np.ndarray, min_chain_length: int,
         max_iterations: int = 20) -> np.ndarray:
    """Destroy blocks in chains shorter than min_chain_length, iterating
    until stable (stCaf_melt semantics).  Chains come from the cactus
    decomposition (graph/cactus.py) — the exclusive-link approximation
    this module previously used breaks on blocks nested inside links.
    """
    from .cactus import melt as cactus_melt
    return cactus_melt(blocks, alive, min_chain_length, max_iterations)


@dataclass
class AdjacencyGroup:
    """One group (tangle) of ends and the unaligned sequences between them —
    the unit of BAR refinement (reference: a leaf flower's ends + adjacency
    sequences, bar/impl/adjacencySequences.c)."""
    ends: np.ndarray          # end ids (may include BOUNDARY as -1)
    adj_idx: np.ndarray       # indices into the Adjacencies arrays


def adjacency_groups(blocks: Blocks, alive: np.ndarray):
    """Partition adjacencies into groups: CC of ends through adjacencies.

    Boundary pseudo-ends are made unique per (sequence, side) so unrelated
    telomere regions don't glue into one group.

    Returns (Adjacencies, list[AdjacencyGroup]).
    """
    adj = thread_adjacencies(blocks, alive)
    n_ends = 2 * blocks.n_blocks
    # unique boundary ids after real ends
    # boundary at gap_start==0 → left telomere of that sequence;
    # else right telomere
    def end_node(end_arr, is_u):
        nodes = end_arr.copy()
        bmask = nodes == BOUNDARY
        side = np.where((adj.gap_start == 0) if is_u else
                        (adj.gap_end == blocks.table.lengths[adj.seq]), 0, 1)
        nodes[bmask] = n_ends + 2 * adj.seq[bmask] + side[bmask]
        return nodes

    u = end_node(adj.end_u, True)
    v = end_node(adj.end_v, False)
    total = n_ends + 2 * len(blocks.table.names)
    from ..native.build import cc_edges
    comp = cc_edges(total, u, v)
    # group adjacencies by component of their u node
    groups = []
    order = np.argsort(comp[u], kind="stable")
    cu = comp[u][order]
    if len(cu):
        starts = np.concatenate([[0], np.flatnonzero(np.diff(cu)) + 1])
        ends_ = np.concatenate([starts[1:], [len(cu)]])
        for s, e in zip(starts, ends_):
            idx = order[s:e]
            ends = np.unique(np.concatenate([adj.end_u[idx], adj.end_v[idx]]))
            groups.append(AdjacencyGroup(ends=ends, adj_idx=idx))
    return adj, groups
