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

from .chains import thread_adjacencies
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


def melt(blocks: Blocks, alive: np.ndarray, min_chain_length: int,
         max_iterations: int = 20) -> np.ndarray:
    """Destroy blocks in cactus chains shorter than min_chain_length,
    iterating to convergence (removal merges flanking chains, as in
    stCaf_melt; caf/impl/melting.c)."""
    alive = alive.copy()
    for _ in range(max_iterations):
        if not alive.any():
            break
        chain_id, lengths = cactus_chains(blocks, alive)
        live = alive & (chain_id >= 0)
        kill = live & (lengths[np.maximum(chain_id, 0)] < min_chain_length)
        if not kill.any():
            break
        alive &= ~kill
    return alive
