"""Reference phase: ancestral genome ordering + ML base reconstruction.

Reference flow (reference/impl/buildReference.c:1007-1110,1285-1332):
nodes are chain ends + stub ends; adjacency edges carry Z-scores with gap
decay and phylogenetic weighting; stub ends are perfect-matched
(blossom5/greedy/maxWeight), blocks are greedily ordered (+ permutation
nudges), broken adjacencies become scaffold gaps of Ns
(cactus_progressive_config.xml:339-361).  Ancestral bases are maximum-
likelihood under Jukes-Cantor via Felsenstein pruning
(reference/impl/blockMLString.c:11-50, JC matrices generated per branch at
pipeline/cactus_consolidated.c:108,489).

TPU-first design:
 - ordering/matching is host-side (pointer-light numpy greedy matching on
   the end-adjacency graph — the `greedy` option of the reference's
   matching algorithms; blossom5 parity is a later-round item);
 - the Felsenstein pruning pass is ONE batched JAX computation over every
   column of every block at once: messages are (columns, 4) tensors
   propagated up the event tree with per-branch JC transition matmuls —
   MXU-shaped instead of the reference's per-block scalar loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np

from ..config import ReferenceParams
from ..io.fasta import Sequence, complement, N as N_CODE
from ..utils.trees import Tree
from .caf import CafResult, event_of


# --------------------------------------------------------------------------
# ML ancestral bases (Felsenstein pruning, Jukes-Cantor)
# --------------------------------------------------------------------------

def jc_matrix(t: float) -> np.ndarray:
    """Jukes-Cantor transition matrix for branch length t (subs/site)."""
    e = np.exp(-4.0 / 3.0 * max(t, 1e-8))
    same = 0.25 + 0.75 * e
    diff = 0.25 - 0.25 * e
    m = np.full((4, 4), diff)
    np.fill_diagonal(m, same)
    return m


def _postorder_schedule(tree: Tree, event_index: dict[str, int]):
    """(child_idx, parent_idx, P_matrix) edges in postorder."""
    edges = []
    for node in tree.postorder():
        if node.parent is not None:
            edges.append((event_index[node.name],
                          event_index[node.parent.name],
                          jc_matrix(node.length or 0.0)))
    return edges


def felsenstein_ml(obs: np.ndarray, counts: np.ndarray, tree: Tree,
                   event_names: list[str]) -> np.ndarray:
    """Batched ML root-state reconstruction.

    obs:    (C, E, 4) float32 — per column, per event, product of one-hot
            observations of that event's segments (uniform 1s if the event
            is absent in the column / base is N).
    counts: (C, E) int — observation counts (0 = missing; only used to
            keep absent-event messages at exactly ones).
    Returns (C,) uint8 argmax root base per column.
    """
    import jax
    import jax.numpy as jnp

    event_index = {n: i for i, n in enumerate(event_names)}
    edges = _postorder_schedule(tree, event_index)
    root_idx = event_index[tree.name]
    E = len(event_names)

    @jax.jit
    def run(obs):
        msgs = [obs[:, i, :] for i in range(E)]
        for child, parent, P in edges:
            lifted = msgs[child] @ jnp.asarray(P.T, dtype=jnp.float32)
            msgs[parent] = msgs[parent] * lifted
            # renormalize to dodge underflow on deep trees
            msgs[parent] = msgs[parent] / jnp.maximum(
                jnp.sum(msgs[parent], axis=1, keepdims=True), 1e-30)
        return jnp.argmax(msgs[root_idx], axis=1).astype(jnp.uint8)

    from ..ops import smart_put
    put = smart_put(obs.size * 8)
    return np.asarray(run(put(obs.astype(np.float32))))


def overlay_outgroup_observations(caf: CafResult, obs: np.ndarray,
                                  col_off: dict, og_records,
                                  og_codes: dict[str, np.ndarray],
                                  event_names: list[str]) -> int:
    """Project outgroup alignments onto existing block columns as
    Felsenstein votes WITHOUT pinching them into the graph.

    Outgroup pinches fragment ingroup block segmentation (alignment
    wobble between independent og alignments splits lockstep runs), so
    the driver keeps og records out of CAF and adds their evidence here:
    for each aligned pair (ingroup base q, outgroup base t), q's block
    column gets a soft vote for t's base.  This is the reconstruction
    role outgroups play in the reference (ancestral ML bases,
    blockMLString.c) with none of the structural interference.
    Returns the number of votes applied.
    """
    from ..io.fasta import complement
    eidx = {n: i for i, n in enumerate(event_names)}
    table = caf.table
    blocks = caf.blocks
    lens = blocks.block_length()
    # per-sequence segment arrays for column lookup
    seg_by_seq: dict[int, tuple] = {}
    order = np.lexsort((blocks.seg_start, blocks.seg_seq))
    sseq = blocks.seg_seq[order]
    for si in np.unique(sseq):
        sel = order[sseq == si]
        seg_by_seq[int(si)] = (blocks.seg_start[sel], blocks.seg_len[sel],
                               blocks.seg_strand[sel], blocks.seg_block[sel])
    n_votes = 0
    for r in og_records:
        # orient: q side must be the INGROUP sequence
        qname, tname = r.qname, r.tname
        q_in = qname in table.index
        t_in = tname in table.index
        og_name = tname if q_in else qname
        if og_name not in og_codes:
            continue
        codes_og = og_codes[og_name]
        e = eidx.get(og_name.split(".", 1)[0])
        if e is None:
            continue
        pairs = list(r.aligned_pairs())
        if not pairs:
            continue
        qp = np.array([p[0] for p in pairs], dtype=np.int64)
        tp = np.array([p[1] for p in pairs], dtype=np.int64)
        if not q_in:
            qp, tp = tp, qp
            in_name = tname
        else:
            in_name = qname
        si = table.index[in_name]
        seg = seg_by_seq.get(si)
        if seg is None:
            continue
        starts, slens, strands, sblocks = seg
        idx = np.searchsorted(starts, qp, side="right") - 1
        ok = (idx >= 0) & (qp < starts[np.maximum(idx, 0)]
                           + slens[np.maximum(idx, 0)])
        if not ok.any():
            continue
        idx, qv, tv = idx[ok], qp[ok], tp[ok]
        b = sblocks[idx]
        live = caf.alive[b]
        idx, qv, tv, b = idx[live], qv[live], tv[live], b[live]
        if not len(b):
            continue
        k = qv - starts[idx]
        col = np.where(strands[idx] == 1, k, slens[idx] - 1 - k)
        base = codes_og[tv]
        # og base orientation: record strand relative to the ingroup
        # forward strand; '-' records pair q forward with t reversed
        if r.strand == "-":
            base = complement(base)
        # segment orientation flips again in block space
        base = np.where(strands[idx] == 1, base, complement(base))
        offs = np.array([col_off.get(int(bb), -1) for bb in b])
        okc = (offs >= 0) & (base < 4)
        rows = offs[okc] + col[okc]
        # soft vote: same scheme as direct observations
        obs[rows, e, :] *= 1e-3
        obs[rows, e, base[okc]] *= 1e3
        n_votes += len(rows)
    return n_votes


def block_observations(caf: CafResult, gcodes: np.ndarray,
                       event_names: list[str]):
    """Build the (C, E, 4) observation tensor over all live block columns.

    Column order within block b is the block's column chain; a -1-strand
    segment contributes complemented bases in reversed order (bidirected
    column semantics, graph/columns.py).
    Returns (obs, counts, block_ids (C,), block_col_lens {b: L}).
    """
    blocks = caf.blocks
    table = caf.table
    eidx = {n: i for i, n in enumerate(event_names)}
    live = np.flatnonzero(caf.alive)
    lens = blocks.block_length()
    col_off = {}
    total = 0
    for b in live:
        col_off[int(b)] = total
        total += int(lens[b])
    E = len(event_names)
    obs = np.ones((total, E, 4), dtype=np.float32)
    counts = np.zeros((total, E), dtype=np.int32)
    block_ids = np.zeros(total, dtype=np.int64)
    for b in live:
        L = int(lens[b])
        o = col_off[int(b)]
        block_ids[o:o + L] = b
    seq_event = np.array([eidx.get(event_of(n), -1) for n in table.names])
    for i in range(len(blocks.seg_block)):
        b = int(blocks.seg_block[i])
        if not caf.alive[b]:
            continue
        e = int(seq_event[blocks.seg_seq[i]])
        if e < 0:
            continue
        s = int(blocks.seg_seq[i])
        st = int(blocks.seg_start[i])
        ln = int(blocks.seg_len[i])
        g0 = int(table.offsets[s]) + st
        codes = gcodes[g0:g0 + ln]
        if int(blocks.seg_strand[i]) == -1:
            codes = complement(codes)[::-1]
        o = col_off[b]
        valid = codes < 4
        cols = np.flatnonzero(valid)
        obs[o + cols, e, :] *= 1e-3            # down-weight non-observed
        obs[o + cols, e, codes[cols]] *= 1e3   # restore the observed state
        counts[o:o + ln, e] += valid
    return obs, counts, block_ids, col_off


@dataclass
class ReferenceResult:
    """Ancestral genome: block order, orientation, ML bases, coordinates."""
    event: str                                  # ancestor event name
    threads: list[list[tuple[int, int]]]        # [(block, orient)] per thread
    block_codes: dict[int, np.ndarray]          # block -> ML codes (col order)
    block_coord: dict[int, tuple[str, int, int]]  # block -> (seq, start, orient)
    sequences: dict[str, Sequence]              # ancestor FASTA

    def total_length(self) -> int:
        return sum(len(s) for s in self.sequences.values())

    def propagated_sequences(self, min_len: int) -> dict[str, Sequence]:
        """The ancestor genome handed to the PARENT's alignment step:
        dust threads below min_len stay out (they would explode the
        parent's contig grid — minLengthForChromosome spirit) but keep
        their block coordinates for this level's homology/export."""
        if not self.sequences:
            return {}
        longest = max(self.sequences, key=lambda n: len(self.sequences[n]))
        return {n: s for n, s in self.sequences.items()
                if len(s) >= min_len or n == longest}


def _end_adjacency_weights(caf: CafResult):
    """Aggregate thread adjacencies between live block ends.

    Returns {(end_u, end_v) canonical: (support, median_gap)} — the
    round-1 stand-in for the reference's Z-score (buildReference.c doc:
    Z = sum over thread pairs of (1-theta)^gap; with theta→0 and uniform
    phi this reduces to adjacency support counts).
    """
    from ..graph import chains as chain_graph
    adj = chain_graph.thread_adjacencies(caf.blocks, caf.alive)
    weights: dict[tuple[int, int], list[int]] = {}
    for k in range(len(adj.seq)):
        u, v = int(adj.end_u[k]), int(adj.end_v[k])
        if u < 0 or v < 0:
            continue
        key = (u, v) if u <= v else (v, u)
        gap = int(adj.gap_end[k] - adj.gap_start[k])
        weights.setdefault(key, []).append(gap)
    return {k: (len(g), int(np.median(g))) for k, g in weights.items()}


def order_blocks(caf: CafResult, cfg: ReferenceParams):
    """Greedy path cover of live blocks via end-adjacency matching.

    Each block has ends 2b (left, column 0 side) and 2b+1 (right).  An
    accepted adjacency joins two ends; each end joins at most once and
    cycles are rejected (union-find) — greedy perfect matching + ordering
    in one pass (reference: makeReferenceGreedily2 semantics for the
    `greedy` matching_algorithm option).
    Returns list of threads: [(block, orient)] with orient +1 = block
    columns forward (enter left end).
    """
    live = [int(b) for b in np.flatnonzero(caf.alive)]
    if not live:
        return []
    weights = _end_adjacency_weights(caf)
    order = sorted(weights.items(), key=lambda kv: (-kv[1][0], kv[0]))
    matched: dict[int, int] = {}      # end -> partner end
    parent: dict[int, int] = {b: b for b in live}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (u, v), (_support, _gap) in order:
        bu, bv = u // 2, v // 2
        if bu == bv or u in matched or v in matched:
            continue
        if not caf.alive[bu] or not caf.alive[bv]:
            continue
        ru, rv = find(bu), find(bv)
        if ru == rv:
            continue  # would close a cycle
        matched[u] = v
        matched[v] = u
        parent[ru] = rv

    # walk paths: start from blocks with an unmatched end
    threads = []
    seen: set[int] = set()
    for b in live:
        for start_end in (2 * b, 2 * b + 1):
            if b in seen or start_end in matched:
                continue
            # start_end is a free end: walk from the OTHER end inward
            thread = []
            cur_b = b
            entry = start_end
            while True:
                seen.add(cur_b)
                orient = 1 if entry == 2 * cur_b else -1
                thread.append((cur_b, orient))
                exit_end = 2 * cur_b + (1 if orient == 1 else 0)
                nxt = matched.get(exit_end)
                if nxt is None:
                    break
                cur_b = nxt // 2
                entry = nxt
            threads.append(thread)
            break
    # isolated blocks whose both ends matched into a path already walked
    for b in live:
        if b not in seen:
            threads.append([(b, 1)])
            seen.add(b)
    return threads


def run_reference(caf: CafResult, gcodes: np.ndarray, tree: Tree,
                  ancestor_event: str, cfg: ReferenceParams,
                  scaffold_gap_threshold: int = 1,
                  og_records=None,
                  og_codes: dict[str, np.ndarray] | None = None
                  ) -> ReferenceResult:
    """Build the ancestral genome for `ancestor_event`.

    tree: the event tree rooted at the ancestor (leaves = child events
    and outgroups present in the alignment).  og_records/og_codes carry
    outgroup alignments as overlay evidence (votes on existing columns;
    see overlay_outgroup_observations).
    """
    event_names = [n.name for n in tree.preorder()]
    obs, counts, block_ids, col_off = block_observations(
        caf, gcodes, event_names)
    if og_records and len(obs):
        overlay_outgroup_observations(caf, obs, col_off, og_records,
                                      og_codes or {}, event_names)
    if len(obs):
        root_codes = felsenstein_ml(obs, counts, tree, event_names)
    else:
        root_codes = np.zeros(0, dtype=np.uint8)

    lens = caf.blocks.block_length()
    block_codes = {}
    for b, o in col_off.items():
        block_codes[b] = root_codes[o:o + int(lens[b])]

    threads = order_blocks(caf, cfg)
    weights = _end_adjacency_weights(caf)
    sequences: dict[str, Sequence] = {}
    block_coord: dict[int, tuple[str, int, int]] = {}
    for ti, thread in enumerate(threads):
        name = f"{ancestor_event}.seq{ti}"
        parts = []
        pos = 0
        prev = None
        for b, orient in thread:
            codes = block_codes[b]
            if orient == -1:
                codes = complement(codes)[::-1]
            if prev is not None and cfg.make_scaffolds:
                # scaffold Ns only where child threads imply missing bases
                # between the two blocks (median adjacency gap > threshold)
                key = _thread_adj_key(prev, (b, orient))
                _support, gap_med = weights.get(key, (0, 0))
                if gap_med >= scaffold_gap_threshold:
                    # gap-sized Ns capped at numberOfNs: always inserting
                    # the full run peppers the ancestor with seed-killing
                    # N islands at every 1-2bp indel
                    n_ns = min(int(gap_med), cfg.number_of_ns)
                    parts.append(np.full(n_ns, N_CODE, dtype=np.uint8))
                    pos += n_ns
            block_coord[b] = (name, pos, orient)
            parts.append(codes.astype(np.uint8))
            pos += len(codes)
            prev = (b, orient)
        sequences[name] = Sequence(name=name, codes=np.concatenate(parts)
                                   if parts else np.zeros(0, np.uint8))
    return ReferenceResult(event=ancestor_event, threads=threads,
                           block_codes=block_codes, block_coord=block_coord,
                           sequences=sequences)


def _thread_adj_key(prev, cur):
    (pb, po), (cb, co) = prev, cur
    pe = 2 * pb + (1 if po == 1 else 0)
    ce = 2 * cb + (0 if co == 1 else 1)
    return (pe, ce) if pe <= ce else (ce, pe)
