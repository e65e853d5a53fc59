"""CAF phase driver: pairwise PAF → pinch columns → blocks → melted core.

Reference flow (caf/impl/caf.c:139-474): stCaf_setup builds the pinch graph
from the flower's threads, annealing pinches in the alignments (with trim),
melting destroys chains shorter than the divergence-dependent minimum chain
length in rounds (deannealingRounds="2 32 256", annealingRounds presets
2048..256; cactus_progressive_config.xml:195-231), block filters drop
under-supported blocks, and stCaf_finish builds the flower hierarchy.

Round-1 simplifications (documented for parity work):
 - single annealing round over all primary alignments (the reference's
   multi-round annealing progressively adds shorter alignment chains);
 - chains approximated by exclusive end-link paths (no full 3-edge-connected
   cactus decomposition yet);
 - alignment-filter policies beyond degree/event counts not yet ported.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import CafParams
from ..graph.columns import Blocks, SeqTable, build_columns, columns_to_blocks
from ..graph import chains as chain_graph


@dataclass
class CafResult:
    table: SeqTable
    blocks: Blocks
    alive: np.ndarray
    events_of_seq: list[str]

    def live_blocks(self) -> list[int]:
        return [b for b in range(self.blocks.n_blocks) if self.alive[b]]


def event_of(seq_name: str) -> str:
    return seq_name.split(".", 1)[0]


def run_caf(records, seq_lengths: dict[str, int], cfg: CafParams,
            preset: str = "default",
            ingroup_events: set[str] | None = None,
            outgroup_events: set[str] | None = None,
            min_chain_override: int | None = None) -> CafResult:
    """Build and melt the block graph from primary PAF records."""
    table = SeqTable.build(seq_lengths)
    primaries = [r for r in records if r.is_primary]
    pc = build_columns(primaries, table)
    blocks = columns_to_blocks(pc, min_degree=cfg.minimum_block_degree)
    alive = np.ones(blocks.n_blocks, dtype=bool)

    # melting schedule: deannealing rounds clipped at the preset's final
    # minimum chain length (caf.c:375-454 semantics)
    final_min = (min_chain_override if min_chain_override is not None
                 else cfg.annealing_for(preset)[-1])
    thresholds = sorted({t for t in cfg.deannealing_rounds if t < final_min}
                        | {final_min})
    for t in thresholds:
        alive = chain_graph.melt(blocks, alive, t)

    alive = filter_blocks_by_events(blocks, alive, cfg,
                                    ingroup_events or set(),
                                    outgroup_events or set())
    events = [event_of(n) for n in table.names]
    return CafResult(table=table, blocks=blocks, alive=alive,
                     events_of_seq=events)


def filter_blocks_by_events(blocks: Blocks, alive: np.ndarray,
                            cfg: CafParams, ingroups: set[str],
                            outgroups: set[str]) -> np.ndarray:
    """Degree/species filters (caf/impl/caf.c:9-20 block filter criteria)."""
    alive = alive.copy()
    events = np.array([event_of(n) for n in blocks.table.names])
    seg_event = events[blocks.seg_seq]
    for b in np.flatnonzero(alive):
        idx = np.flatnonzero(blocks.seg_block == b)
        evs = seg_event[idx]
        n_species = len(set(evs))
        n_in = sum(1 for e in evs if e in ingroups) if ingroups else len(evs)
        n_out = sum(1 for e in evs if e in outgroups)
        if len(idx) < cfg.minimum_block_degree:
            alive[b] = False
        elif n_species < cfg.minimum_number_of_species:
            alive[b] = False
        elif ingroups and n_in < cfg.minimum_ingroup_degree:
            alive[b] = False
        elif n_out < cfg.minimum_outgroup_degree:
            alive[b] = False
    return alive


def blocks_to_match_edges(blocks: Blocks, alive: np.ndarray):
    """Serialize live blocks back to base-level match runs.

    Each block column becomes a star of pairwise matches against the first
    segment, letting downstream passes rebuild columns from (CAF ∪ BAR)
    evidence with one more CC pass.  Returns arrays (ga, gb, ln, strand)
    of run matches in GLOBAL coordinates of `blocks.table` —
    strand +1: table-global [ga, ga+ln) pairs with [gb, gb+ln) forward;
    strand -1: pairs reversed.
    """
    out = []
    tbl = blocks.table
    for b in np.flatnonzero(alive):
        idx = np.flatnonzero(blocks.seg_block == b)
        if len(idx) < 2:
            continue
        base = idx[0]
        g0 = tbl.offsets[blocks.seg_seq[base]] + blocks.seg_start[base]
        s0 = int(blocks.seg_strand[base])
        ln = int(blocks.seg_len[base])
        for i in idx[1:]:
            gi = tbl.offsets[blocks.seg_seq[i]] + blocks.seg_start[i]
            si = int(blocks.seg_strand[i])
            out.append((int(g0), int(gi), ln, s0 * si))
    return out
