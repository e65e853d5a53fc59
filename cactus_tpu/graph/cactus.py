"""Cactus-graph chain decomposition over the block graph.

Replaces the stCactusGraphs 3-edge-connected-component construction
(reference: submodule pinchesAndCacti, consumed by caf/impl/finishing.c;
chains per Paten et al., DOI 10.1101/gr.123356.111).  The decomposition:

  nodes  = adjacency components (block ends glued by thread adjacencies;
           all thread boundaries glue into one ORIGIN node)
  edges  = blocks
  chains = equivalence classes of the 2-edge-cut relation within each
           2-edge-connected component — exactly the simple cycles of the
           cactus graph obtained by collapsing 3-edge-connected classes.

Instead of Tsin's sequential 3ECC algorithm, chains are found with the
randomized XOR-label trick, which is O(E) and vectorizes:
  - build a spanning forest of the (multi)graph;
  - give every non-tree edge a random 64-bit label;
  - every tree edge's label = XOR of the labels of non-tree edges whose
    tree path covers it (computed by a diff-XOR + subtree aggregation);
  - two edges form a 2-edge cut  ⟺  equal labels;  label 0 = bridge.
Each label class is one chain; blocks whose ends glue into the same node
(self-loops) and multiply-covered tree edges become singleton chains.

This fixes the failure mode of exclusive-adjacency link detection: a
block nested inside a chain's link (e.g. an outgroup-only block between
two ingroup blocks) becomes a self-loop on the link's node and no longer
breaks the chain.
"""

from __future__ import annotations

import numpy as np

from .chains import BOUNDARY, thread_adjacencies
from .columns import Blocks


def _end_nodes(blocks: Blocks, alive: np.ndarray):
    """Union block ends through thread adjacencies; boundaries → origin.

    Returns (node_of_end (2B+1,), origin_node): node ids densified;
    node_of_end[2B] is the origin slot.
    """
    from ..native.build import cc_edges
    B = blocks.n_blocks
    n_ends = 2 * B
    ORIGIN = n_ends
    adj = thread_adjacencies(blocks, alive)
    u = np.where(adj.end_u < 0, ORIGIN, adj.end_u).astype(np.int64)
    v = np.where(adj.end_v < 0, ORIGIN, adj.end_v).astype(np.int64)
    dense = cc_edges(n_ends + 1, u, v)
    return dense, dense[ORIGIN]


def cactus_chains(blocks: Blocks, alive: np.ndarray):
    """Chain id per block (-1 for dead blocks) + per-chain base length.

    Chain length = sum of the member blocks' column counts (the melting
    length, caf/impl/melting.c semantics).
    """
    B = blocks.n_blocks
    chain_id = np.full(B, -1, dtype=np.int64)
    live = np.flatnonzero(alive)
    if len(live) == 0:
        return chain_id, np.zeros(0, dtype=np.int64)

    node_of_end, _origin = _end_nodes(blocks, alive)
    n_nodes = int(node_of_end.max()) + 1

    eu = node_of_end[2 * live]          # node of left end
    ev = node_of_end[2 * live + 1]      # node of right end

    # spanning forest over the multigraph (native DFS; python fallback)
    from ..native.build import spanning_forest
    native = spanning_forest(n_nodes, eu, ev)
    if native is not None:
        is_tree, parent_node, parent_edge, order = native
    else:
        head = np.full(n_nodes, -1, dtype=np.int64)
        nxt = np.full(2 * len(live), -1, dtype=np.int64)
        eto = np.empty(2 * len(live), dtype=np.int64)
        eid = np.empty(2 * len(live), dtype=np.int64)
        for i in range(len(live)):
            for half, (a, b) in enumerate(((eu[i], ev[i]),
                                           (ev[i], eu[i]))):
                s = 2 * i + half
                eto[s] = b
                eid[s] = i
                nxt[s] = head[a]
                head[a] = s

        parent_node = np.full(n_nodes, -1, dtype=np.int64)
        parent_edge = np.full(n_nodes, -1, dtype=np.int64)
        order = []
        visited = np.zeros(n_nodes, dtype=bool)
        is_tree = np.zeros(len(live), dtype=bool)
        for root in range(n_nodes):
            if visited[root]:
                continue
            visited[root] = True
            queue = [root]
            while queue:
                a = queue.pop()
                order.append(a)
                s = head[a]
                while s >= 0:
                    b = eto[s]
                    i = eid[s]
                    if not visited[b]:
                        visited[b] = True
                        is_tree[i] = True
                        parent_node[b] = a
                        parent_edge[b] = i
                        queue.append(b)
                    s = nxt[s]

    rng = np.random.default_rng(0xC0FFEE)
    labels = np.zeros(len(live), dtype=np.uint64)
    nontree = np.flatnonzero(~is_tree)
    rand = rng.integers(1, np.iinfo(np.int64).max, size=len(nontree),
                        dtype=np.int64).astype(np.uint64)
    labels[nontree] = rand

    # diff-XOR at endpoints of every non-tree edge (self-loops cancel)
    diff = np.zeros(n_nodes, dtype=np.uint64)
    for j, i in enumerate(nontree):
        diff[eu[i]] ^= rand[j]
        diff[ev[i]] ^= rand[j]

    # subtree XOR accumulation in reverse BFS order → tree edge labels
    acc = diff.copy()
    for a in reversed(order):
        p = parent_node[a]
        if p >= 0:
            labels[parent_edge[a]] = acc[a]
            acc[p] ^= acc[a]

    # group by label: equal nonzero labels = one chain; label 0 (bridges)
    # and multiply-covered tree edges (unique labels) become singletons
    uniq, inv, counts = np.unique(labels, return_inverse=True,
                                  return_counts=True)
    cid = inv.copy()
    zero_class = np.flatnonzero(uniq == 0)
    if len(zero_class):
        # every bridge is its own chain
        zsel = np.flatnonzero(inv == zero_class[0])
        cid[zsel] = len(uniq) + np.arange(len(zsel))
    _u2, cid = np.unique(cid, return_inverse=True)

    chain_id[live] = cid
    block_len = blocks.block_length()
    lengths = np.zeros(int(cid.max()) + 1, dtype=np.int64)
    np.add.at(lengths, cid, block_len[live])
    return chain_id, lengths


def _direct_link_gaps(blocks: Blocks, alive: np.ndarray):
    """Median direct-adjacency gap per unordered end pair.

    Returns dict {(end_u, end_v) canonical: median gap} over pairs of
    REAL ends joined by at least one thread adjacency.
    """
    adj = thread_adjacencies(blocks, alive)
    ok = (adj.end_u >= 0) & (adj.end_v >= 0)
    u = adj.end_u[ok]
    v = adj.end_v[ok]
    gaps = (adj.gap_end - adj.gap_start)[ok]
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    key = lo * (2 ** 32) + hi
    order = np.argsort(key, kind="stable")
    key_s, gaps_s = key[order], gaps[order]
    out = {}
    if len(key_s):
        starts = np.concatenate([[0], np.flatnonzero(np.diff(key_s)) + 1])
        ends = np.concatenate([starts[1:], [len(key_s)]])
        for s, e in zip(starts, ends):
            k = int(key_s[s])
            out[(k >> 32, k & 0xFFFFFFFF)] = float(np.median(gaps_s[s:e]))
    return out


def split_chains_at_bad_links(blocks: Blocks, alive: np.ndarray,
                              chain_id: np.ndarray,
                              max_median_gap: int) -> tuple[np.ndarray, np.ndarray]:
    """Break chains at links whose median thread spacing exceeds the cap
    (reference: maximumMedianSequenceLengthBetweenLinkedEnds, passed to
    stCaf_getCactusGraphForThreadSet from the final melt of each
    annealing round, caf/impl/caf.c:454).

    Approximation: links are detected from DIRECT thread adjacencies
    between ends of same-chain blocks; chains carrying a bad link are
    re-partitioned by CC over their good direct links only.
    Returns (new chain_id, new lengths).
    """
    gaps = _direct_link_gaps(blocks, alive)
    bad_chains = set()
    for (u, v), med in gaps.items():
        bu, bv = u // 2, v // 2
        if bu != bv and chain_id[bu] >= 0 and chain_id[bu] == chain_id[bv] \
                and med > max_median_gap:
            bad_chains.add(int(chain_id[bu]))
    if not bad_chains:
        block_len = blocks.block_length()
        n = int(chain_id.max()) + 1 if (chain_id >= 0).any() else 0
        lengths = np.zeros(n, dtype=np.int64)
        live = chain_id >= 0
        np.add.at(lengths, chain_id[live], block_len[live])
        return chain_id, lengths
    # rebuild bad chains from good direct links
    B = blocks.n_blocks
    u_l, v_l = [], []
    for (u, v), med in gaps.items():
        bu, bv = u // 2, v // 2
        if (bu != bv and chain_id[bu] >= 0 and chain_id[bu] == chain_id[bv]
                and int(chain_id[bu]) in bad_chains and med <= max_median_gap):
            u_l.append(bu)
            v_l.append(bv)
    from ..native.build import cc_edges
    sub = cc_edges(B, np.array(u_l, np.int64), np.array(v_l, np.int64))
    new_id = chain_id.copy()
    in_bad = np.isin(chain_id, list(bad_chains)) & (chain_id >= 0)
    base = int(chain_id.max()) + 1
    new_id[in_bad] = base + sub[in_bad]
    # densify
    live = new_id >= 0
    uniq, dense = np.unique(new_id[live], return_inverse=True)
    new_id[live] = dense
    block_len = blocks.block_length()
    lengths = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(lengths, new_id[live], block_len[live])
    return new_id, lengths


def melt(blocks: Blocks, alive: np.ndarray, min_chain_length: int,
         max_iterations: int = 20,
         max_median_link_gap: int | None = None) -> np.ndarray:
    """Destroy blocks in cactus chains shorter than min_chain_length,
    iterating to convergence (removal merges flanking chains, as in
    stCaf_melt; caf/impl/melting.c).  When max_median_link_gap is given,
    chains are first broken at links whose median thread spacing exceeds
    it (so long chains glued by sparse, distant links melt in pieces)."""
    alive = alive.copy()
    for _ in range(max_iterations):
        if not alive.any():
            break
        chain_id, lengths = cactus_chains(blocks, alive)
        if max_median_link_gap is not None:
            chain_id, lengths = split_chains_at_bad_links(
                blocks, alive, chain_id, max_median_link_gap)
        live = alive & (chain_id >= 0)
        kill = live & (lengths[np.maximum(chain_id, 0)] < min_chain_length)
        if not kill.any():
            break
        alive &= ~kill
    return alive


# --------------------------------------------------------------------------
# recoverable-chain melting (caf/impl/melting.c:225-330,472+)
# --------------------------------------------------------------------------

def _connected_end_sets(blocks: Blocks, alive: np.ndarray):
    """Per real end: the set of partner ends across thread adjacencies.

    Telomeres (thread boundaries) appear as pseudo-end ids
    n_ends + 2*seq + side so distinct threads' termini stay distinct
    (stPinchEnd_getConnectedPinchEnds semantics with stub ends).
    """
    adj = thread_adjacencies(blocks, alive)
    n_ends = 2 * blocks.n_blocks
    conn: dict[int, set[int]] = {}
    for k in range(len(adj.seq)):
        u, v = int(adj.end_u[k]), int(adj.end_v[k])
        s = int(adj.seq[k])
        if u == BOUNDARY and v == BOUNDARY:
            continue
        uu = u if u >= 0 else n_ends + 2 * s
        vv = v if v >= 0 else n_ends + 2 * s + 1
        if u >= 0:
            conn.setdefault(u, set()).add(vv)
        if v >= 0:
            conn.setdefault(v, set()).add(uu)
    return conn, n_ends


def chain_outer_ends(blocks: Blocks, alive: np.ndarray,
                     chain_id: np.ndarray):
    """The two boundary ends of each path chain (None for cycles).

    Within a chain, internal link ends share an adjacency-component node
    with exactly one other member end; the two outer ends sit at nodes
    hosting only one member end of the chain.
    """
    node_of_end, _origin = _end_nodes(blocks, alive)
    live = np.flatnonzero(alive & (chain_id >= 0))
    ends = np.concatenate([2 * live, 2 * live + 1]) if len(live) else \
        np.zeros(0, np.int64)
    cid = np.concatenate([chain_id[live], chain_id[live]]) if len(live) else \
        np.zeros(0, np.int64)
    nodes = node_of_end[ends] if len(ends) else np.zeros(0, np.int64)
    # count member ends per (chain, node)
    key = cid * (2 ** 40) + nodes
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    counts = {}
    if len(key_s):
        starts = np.concatenate([[0], np.flatnonzero(np.diff(key_s)) + 1])
        lens = np.diff(np.concatenate([starts, [len(key_s)]]))
        for s, l in zip(starts, lens):
            counts[int(key_s[s])] = int(l)
    outer: dict[int, list[int]] = {}
    for e, c, nd in zip(ends, cid, nodes):
        if counts.get(int(c) * (2 ** 40) + int(nd), 0) == 1:
            outer.setdefault(int(c), []).append(int(e))
    result = {c: es for c, es in outer.items() if len(es) == 2}
    # Singleton chains (one block) are self-loops in the cactus graph:
    # both ends sit at one node, so the count test finds nothing — but
    # the chain's outer ends are trivially the block's two ends
    # (stCactusEdgeEnd pairs carry this directly in the reference).
    if len(live):
        sizes = np.bincount(chain_id[live])
        for b in live:
            c = int(chain_id[b])
            if sizes[c] == 1 and c not in result:
                result[c] = [2 * int(b), 2 * int(b) + 1]
    return result


def melt_recoverable_chains(blocks: Blocks, alive: np.ndarray,
                            events_of_seq: np.ndarray,
                            ingroup_events: set[str],
                            outgroup_events: set[str],
                            policy: str = "unequalNumberOfIngroupCopies",
                            max_iterations: int = 10,
                            max_len: int = 500_000) -> np.ndarray:
    """Remove chains the BAR phase is expected to re-derive
    (stCaf_meltRecoverableChains, caf/impl/melting.c:472).

    A chain with outer ends E1,E2 is recoverable iff its connected-end
    sets share no end, at least one of them is a singleton, and the two
    ends don't link to each other; policy filters restrict melting to
    chains with unequal ingroup copy numbers (filtering.c:361-420).
    The telomere-anchor pass keeps one recoverable chain per walk that
    would otherwise strand telomere-adjacent sequence (melting.c:404-440).
    """
    if policy == "0":
        return alive
    alive = alive.copy()
    for _ in range(max_iterations):
        if not alive.any():
            break
        chain_id, lengths = cactus_chains(blocks, alive)
        outer = chain_outer_ends(blocks, alive, chain_id)
        conn, n_ends = _connected_end_sets(blocks, alive)
        deg = blocks.block_degree()

        def is_telomere(e: int) -> bool:
            return e >= n_ends

        chain_of_end = lambda e: (int(chain_id[e // 2])
                                  if e < n_ends and alive[e // 2] else -1)

        recoverable: dict[int, list[int]] = {}   # chain -> recoverable adjs
        telomere_adjacent: list[int] = []
        for c, (e1, e2) in outer.items():
            if lengths[c] >= max_len:
                continue
            c1 = conn.get(e1, set())
            c2 = conn.get(e2, set())
            if c1 & c2:
                continue
            if len(c1) != 1 and len(c2) != 1:
                continue
            if e2 in c1 or e1 in c2:
                continue  # duplication link between the chain's own ends
            if policy in ("unequalNumberOfIngroupCopies",
                          "unequalNumberOfIngroupCopiesOrNoOutgroup"):
                b = e1 // 2
                segs = np.flatnonzero(blocks.seg_block == b)
                evs = events_of_seq[blocks.seg_seq[segs]]
                copies = {}
                og_copies = 0
                for ev in evs:
                    if ev in outgroup_events:
                        og_copies += 1
                    else:
                        copies[ev] = copies.get(ev, 0) + 1
                vals = [copies.get(ev, 0) for ev in ingroup_events] \
                    if ingroup_events else list(copies.values())
                unequal = len(set(vals)) > 1 or (vals and vals[0] == 0)
                if policy == "unequalNumberOfIngroupCopies":
                    if not unequal:
                        continue
                else:
                    # ...OrNoOutgroup (filtering.c:406): also melt when the
                    # chain has no outgroup copy despite outgroups existing
                    no_og = bool(outgroup_events) and og_copies == 0
                    if not (unequal or no_og):
                        continue
            adjs = []
            if len(c1) == 1:
                (t,) = tuple(c1)
                if not is_telomere(t):
                    adjs.append(chain_of_end(t))
            if len(c2) == 1:
                (t,) = tuple(c2)
                if not is_telomere(t):
                    adjs.append(chain_of_end(t))
            recoverable[c] = [a for a in adjs if a >= 0]
            tel = any(is_telomere(t) for t in (c1 | c2))
            # thread (not event) composition, per
            # endsDoNotHaveSameThreadComposition (melting.c:168-196)
            comp1 = set(blocks.seg_seq[blocks.seg_block == e1 // 2].tolist())
            comp2 = set(blocks.seg_seq[blocks.seg_block == e2 // 2].tolist())
            if tel or deg[e1 // 2] != deg[e2 // 2] or comp1 != comp2:
                telomere_adjacent.append(c)

        # anchor pass: walk recoverable adjacencies from each
        # telomere-adjacent chain; if the walk never reaches an
        # unrecoverable chain, keep this one as the anchor
        for c in telomere_adjacent:
            cur, prev = c, -1
            needed = False
            seen = set()
            while cur in recoverable:
                if cur in seen:
                    break
                seen.add(cur)
                nxts = [a for a in recoverable[cur] if a != prev]
                if not nxts:
                    needed = True
                    break
                prev, cur = cur, nxts[0]
            if needed and c in recoverable:
                del recoverable[c]

        if not recoverable:
            break
        kill_chains = np.array(sorted(recoverable), dtype=np.int64)
        kill = alive & (chain_id >= 0) & np.isin(chain_id, kill_chains)
        if not kill.any():
            break
        alive &= ~kill
    return alive


# --------------------------------------------------------------------------
# giant adjacency-component breaking (caf/impl/giantComponent.c)
# --------------------------------------------------------------------------

def break_giant_components(blocks: Blocks, alive: np.ndarray,
                           max_size_ratio: float) -> np.ndarray:
    """Greedily drop the lowest-support blocks of oversized adjacency
    components (stCaf_breakupComponentsGreedily, giantComponent.c:190:
    cap = ratio * log(2 * #blocks), min 10; edges added best-first, the
    ones that would exceed the cap are broken).

    Block-level approximation of the reference's end-graph edge breaking:
    the node set is block ends glued by adjacencies; removing an edge =
    destroying the weaker block it touches (reference breakEdges splits
    pinch ends apart, which at export equals destroying the block when
    its degree falls below 2 — here blocks are destroyed whole).
    """
    n_live = int(alive.sum())
    if n_live == 0:
        return alive
    cap = max(10.0, max_size_ratio * np.log(2.0 * n_live))
    # pinch-level adjacency components: REAL ends glued by thread
    # adjacencies only — the reference's stPinchThreadSet adjacency
    # components never include thread termini (giantComponent.c:196),
    # so the cactus-graph ORIGIN gluing must not apply here
    from ..native.build import cc_edges
    adj = thread_adjacencies(blocks, alive)
    real = (adj.end_u >= 0) & (adj.end_v >= 0)
    node_of_end = cc_edges(2 * blocks.n_blocks,
                           adj.end_u[real], adj.end_v[real])
    live_ends = np.flatnonzero(np.repeat(alive, 2))
    comp_sizes = np.bincount(node_of_end[live_ends],
                             minlength=int(node_of_end.max()) + 1)
    # component = adjacency node; size = # ends glued into it
    big_nodes = np.flatnonzero(comp_sizes > cap)
    if not len(big_nodes):
        return alive
    alive = alive.copy()
    support = blocks.support if blocks.support is not None else \
        blocks.block_degree().astype(np.int64)
    big = set(big_nodes.tolist())
    live = np.flatnonzero(alive)
    in_big = [b for b in live
              if int(node_of_end[2 * b]) in big
              or int(node_of_end[2 * b + 1]) in big]
    # best-first: keep high-support blocks, drop from the weakest until
    # the component is under the cap (2 ends per block)
    in_big.sort(key=lambda b: int(support[b]))
    excess = 0
    for nd in big_nodes:
        excess += int(comp_sizes[nd] - cap)
    dropped = 0
    deg = blocks.block_degree()
    for b in in_big:
        if dropped >= excess:
            break
        if deg[b] > 1:
            alive[b] = False
            dropped += 2
    return alive
