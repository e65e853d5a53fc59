"""Greedy outgroup selection with diversity penalty.

Reference: src/cactus/progressive/outgroup.py GreedyOutgroup — networkx
DAG + all-pairs Dijkstra (:43-69), greedy nearest-candidate selection
where branches already traversed by chosen outgroups are penalized
(overlap penalty: traversed branch lengths scale ×2, :205-361) so later
picks add phylogenetic diversity; at most max_num_outgroups=3
(config XML :539-547).  Candidates are leaves ('greedyLeaves' strategy);
'*'-starred seqfile entries restrict eligibility when present.
"""

from __future__ import annotations

from ..utils.trees import Tree


def _path_edges(tree: Tree, a_name: str, b_name: str):
    """Edges (as child-node ids) on the path between two named nodes."""
    def to_root(name):
        n = tree.find(name)
        path = []
        while n is not None and n.parent is not None:
            path.append(n)
            n = n.parent
        return path

    pa = to_root(a_name)
    pb = to_root(b_name)
    ids_a = {id(n): k for k, n in enumerate(pa)}
    for k, n in enumerate(pb):
        if id(n) in ids_a:
            return pa[:ids_a[id(n)]] + pb[:k]
    return pa + pb


def _tier(tree: Tree, node: Tree, leaf: str) -> int:
    """Hops from `node` up to LCA(node, leaf) (1 = sister clade, ...)."""
    under = set()
    n = node
    hops = 0
    while n is not None:
        hops += 1
        n = n.parent
        if n is None:
            break
        if leaf in set(n.leaf_names()):
            return hops
    return hops


def greedy_outgroups(tree: Tree, node: Tree, k: int,
                     eligible: set[str] | None = None,
                     overlap_scale: float = 2.0,
                     clade_discount: float = 0.3) -> list[str]:
    """Up to k outgroup leaves for `node`.

    Effective distance = dist / (1 - clade_discount)^(tier-1), so an
    out-of-clade candidate must be proportionally closer to beat an
    in-clade one; branches already used by chosen outgroups scale by
    overlap_scale (the reference's clade_discount / overlap_penalty
    knobs, config XML :539-547).
    """
    if k <= 0 or node.parent is None:
        return []
    inside = set(node.leaf_names()) | {node.name}
    cands = [lf for lf in tree.leaf_names()
             if lf not in inside and (eligible is None or lf in eligible)]
    if not cands:
        return []
    discount = max(1e-6, 1.0 - clade_discount)
    tiers = {lf: _tier(tree, node, lf) for lf in cands}
    multiplier: dict[int, float] = {}
    chosen: list[str] = []
    for _ in range(min(k, len(cands))):
        best, best_d = None, float("inf")
        for lf in cands:
            if lf in chosen:
                continue
            edges = _path_edges(tree, node.name, lf)
            d = sum((e.length or 0.0) * multiplier.get(id(e), 1.0)
                    for e in edges)
            d = d / discount ** (tiers[lf] - 1)
            if d < best_d:
                best, best_d = lf, d
        if best is None:
            break
        chosen.append(best)
        if overlap_scale > 0:
            for e in _path_edges(tree, node.name, best):
                multiplier[id(e)] = (multiplier.get(id(e), 1.0)
                                     * overlap_scale)
    return chosen


# --------------------------------------------------------------------------
# chromosome-aware outgroup constraints (--chromInfo)
# --------------------------------------------------------------------------

def load_chrom_info(path: str) -> dict[str, set[str]]:
    """Parse a chromInfo file: `genome[  chrom1,chrom2]` per line —
    maps genomes to sex-chromosome labels (reference
    outgroup.py:205-235).  Genomes may be absent (no constraint)."""
    out: dict[str, set[str]] = {}
    with open(path) as fh:
        for line in fh:
            toks = line.split()
            if not toks:
                continue
            if len(toks) > 2:
                raise ValueError(f"chromInfo line has >2 columns: "
                                 f"{line.rstrip()}")
            if toks[0] in out:
                raise ValueError(f"duplicate genome {toks[0]} in "
                                 "chromInfo")
            out[toks[0]] = set(toks[1].split(",")) if len(toks) == 2 \
                else set()
    return out


def chrom_constrained_outgroups(tree: Tree, node: Tree, k: int,
                                chrom_map: dict[str, set[str]],
                                extra_chrom_outgroups: int = 1,
                                eligible: set[str] | None = None,
                                **kw) -> list[str]:
    """Greedy outgroups + chromosome coverage: every chromosome label
    present under `node` must appear in at least one outgroup, adding
    up to extra_chrom_outgroups beyond k if needed (the
    check_chrom_satisfied / refine_og_chroms behavior,
    outgroup.py:237-290)."""
    chosen = greedy_outgroups(tree, node, k, eligible=eligible, **kw)
    need = set()
    for lf in node.leaf_names():
        need |= chrom_map.get(lf, set())
    if not need:
        return chosen
    have = set()
    for og in chosen:
        have |= chrom_map.get(og, set())
    missing = need - have
    if not missing:
        return chosen
    inside = set(node.leaf_names()) | {node.name}
    cands = [lf for lf in tree.leaf_names()
             if lf not in inside and lf not in chosen
             and (eligible is None or lf in eligible)]
    cands.sort(key=lambda lf: tree.distance(node.name, lf))
    budget = extra_chrom_outgroups
    for lf in cands:
        if not missing or budget <= 0:
            break
        gain = chrom_map.get(lf, set()) & missing
        if gain:
            chosen.append(lf)
            missing -= gain
            budget -= 1
    return chosen
