"""Homology-pair precision/recall scoring — mafComparator equivalent.

The reference test suite gates accuracy via mafComparator sampling homology
pairs between a truth MAF and the produced MAF (reference:
test/evolverTest.py:_check_maf_accuracy, baseline
test/evolverMammals-default.comp.xml).  Here, truth comes from the simulator
(testutil/evolver.py) as exact base-level homology sets, and predictions are
read from MAF blocks.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..io.maf import read_maf

_GAP = "-"


def maf_pairs(path_or_blocks, genome_a: str, genome_b: str) -> set[tuple[int, int, int]]:
    """Extract predicted homology pairs (posA, posB, rel_strand) between two
    genomes from a MAF.  Positions are forward-strand 0-based."""
    blocks = (read_maf(path_or_blocks)
              if isinstance(path_or_blocks, str) else path_or_blocks)
    pairs: set[tuple[int, int, int]] = set()
    for block in blocks:
        rows_a = [r for r in block.rows if _genome(r.src) == genome_a]
        rows_b = [r for r in block.rows if _genome(r.src) == genome_b]
        if not rows_a or not rows_b:
            continue
        cols_a = [(_col_positions(r), _col_strands(r)) for r in rows_a]
        cols_b = [(_col_positions(r), _col_strands(r)) for r in rows_b]
        for pa, sa in cols_a:
            for pb, sb in cols_b:
                for x, y, s1, s2 in zip(pa, pb, sa, sb):
                    if x >= 0 and y >= 0:
                        pairs.add((x, y, s1 * s2))
    return pairs


def _genome(src: str) -> str:
    return src.split(".", 1)[0]


def _col_positions(row) -> list[int]:
    """Forward-strand position per alignment column (-1 at gaps)."""
    out = []
    if row.strand == "+":
        p = row.start
        for ch in row.text:
            if ch == _GAP:
                out.append(-1)
            else:
                out.append(p)
                p += 1
    else:
        p = row.src_size - row.start - 1
        for ch in row.text:
            if ch == _GAP:
                out.append(-1)
            else:
                out.append(p)
                p -= 1
    return out


def _col_strands(row) -> list[int]:
    s = 1 if row.strand == "+" else -1
    return [s] * len(row.text)


@dataclass
class PairScore:
    recall: float      # fraction of truth pairs recovered
    precision: float   # fraction of predicted pairs that are true
    n_truth: int
    n_pred: int

    @property
    def average(self) -> float:
        return 0.5 * (self.recall + self.precision)

    @property
    def f1(self) -> float:
        if self.recall + self.precision == 0:
            return 0.0
        return 2 * self.recall * self.precision / (self.recall + self.precision)


def _strandless(pairs):
    return {(a, b) for a, b, _s in pairs}


def score_pairs(truth: set, pred: set, ignore_strand: bool = True) -> PairScore:
    if ignore_strand:
        truth, pred = _strandless(truth), _strandless(pred)
    inter = len(truth & pred)
    return PairScore(
        recall=inter / len(truth) if truth else 1.0,
        precision=inter / len(pred) if pred else 1.0,
        n_truth=len(truth), n_pred=len(pred))


def score_maf_vs_sim(maf_path, sim, genome_pairs=None, ignore_strand=True):
    """Score a produced MAF against simulator truth for every leaf pair.

    Returns ({(a,b): PairScore}, overall PairScore aggregated over pairs).
    """
    leaves = sim.tree.leaf_names()
    if genome_pairs is None:
        genome_pairs = [(a, b) for i, a in enumerate(leaves)
                        for b in leaves[i + 1:]]
    blocks = list(read_maf(maf_path)) if isinstance(maf_path, str) else maf_path
    per_pair = {}
    tot_truth = tot_pred = tot_inter_r = tot_inter_p = 0
    for a, b in genome_pairs:
        truth = sim.truth_pairs(a, b)
        pred = maf_pairs(blocks, a, b)
        s = score_pairs(truth, pred, ignore_strand)
        per_pair[(a, b)] = s
        tot_truth += s.n_truth
        tot_pred += s.n_pred
        tot_inter_r += s.recall * s.n_truth
        tot_inter_p += s.precision * s.n_pred
    overall = PairScore(
        recall=tot_inter_r / tot_truth if tot_truth else 1.0,
        precision=tot_inter_p / tot_pred if tot_pred else 1.0,
        n_truth=tot_truth, n_pred=tot_pred)
    return per_pair, overall
