"""Homology-pair precision/recall scoring — mafComparator equivalent.

The reference test suite gates accuracy via mafComparator sampling homology
pairs between a truth MAF and the produced MAF (reference:
test/evolverTest.py:_check_maf_accuracy, baseline
test/evolverMammals-default.comp.xml).  Here, truth comes from the simulator
(testutil/evolver.py) as exact base-level homology sets, and predictions are
read from MAF blocks.  Pair sets are packed int64 key arrays
(utils/pairs.py) so the oracle scales to evolver-size genomes; the
tuple-set API is kept as a thin decoder.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.maf import read_maf
from ..utils import pairs as pk

_GAP_BYTE = ord("-")


def _col_positions_arr(row) -> np.ndarray:
    """Forward-strand position per alignment column (-1 at gaps)."""
    text = np.frombuffer(row.text.encode("ascii"), dtype=np.uint8)
    gap = text == _GAP_BYTE
    rank = np.cumsum(~gap) - 1          # 0-based index among non-gap cols
    if row.strand == "+":
        pos = row.start + rank
    else:
        pos = (row.src_size - row.start - 1) - rank
    return np.where(gap, -1, pos)


def maf_pairs_arr(path_or_blocks, genome_a: str, genome_b: str) -> np.ndarray:
    """Predicted homology pairs between two genomes from a MAF, as a
    sorted-unique packed key array.  Positions forward-strand 0-based."""
    blocks = (read_maf(path_or_blocks)
              if isinstance(path_or_blocks, str) else path_or_blocks)
    chunks: list[np.ndarray] = []
    for block in blocks:
        rows_a = [r for r in block.rows if _genome(r.src) == genome_a]
        rows_b = [r for r in block.rows if _genome(r.src) == genome_b]
        if not rows_a or not rows_b:
            continue
        cols_a = [(_col_positions_arr(r), 1 if r.strand == "+" else -1)
                  for r in rows_a]
        cols_b = [(_col_positions_arr(r), 1 if r.strand == "+" else -1)
                  for r in rows_b]
        for pa, sa in cols_a:
            for pb, sb in cols_b:
                ok = (pa >= 0) & (pb >= 0)
                if ok.any():
                    chunks.append(pk.pack_pairs(
                        pa[ok], pb[ok], np.full(int(ok.sum()), sa * sb)))
    if not chunks:
        return np.zeros(0, dtype=np.int64)
    return pk.unique_keys(np.concatenate(chunks))


def maf_pairs(path_or_blocks, genome_a: str, genome_b: str) -> set[tuple[int, int, int]]:
    """Legacy tuple-set view of maf_pairs_arr."""
    return pk.unpack_pairs(maf_pairs_arr(path_or_blocks, genome_a, genome_b))


def _genome(src: str) -> str:
    return src.split(".", 1)[0]


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


def _as_keys(pairs) -> np.ndarray:
    """Accept a packed key array or a legacy tuple set."""
    if isinstance(pairs, np.ndarray):
        return pk.unique_keys(pairs)
    if not pairs:
        return np.zeros(0, dtype=np.int64)
    arr = np.asarray(sorted(pairs), dtype=np.int64)
    return pk.unique_keys(pk.pack_pairs(arr[:, 0], arr[:, 1], arr[:, 2]))


def score_pairs(truth, pred, ignore_strand: bool = True) -> PairScore:
    """Score predicted vs truth pair sets (key arrays or tuple sets)."""
    tk, pkk = _as_keys(truth), _as_keys(pred)
    if ignore_strand:
        tk, pkk = pk.strandless(tk), pk.strandless(pkk)
    inter = pk.intersect_count(tk, pkk)
    return PairScore(
        recall=inter / len(tk) if len(tk) else 1.0,
        precision=inter / len(pkk) if len(pkk) else 1.0,
        n_truth=len(tk), n_pred=len(pkk))


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
        truth = sim.truth_pairs_arr(a, b)
        pred = maf_pairs_arr(blocks, a, b)
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
