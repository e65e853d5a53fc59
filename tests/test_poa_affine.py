"""Convex-gap adaptive-band POA kernel (ops/poa.py affine path)."""

import numpy as np
import pytest

from cactus_tpu.config import PoaParams
from cactus_tpu.ops.banded import GapParams, align_affine_np, score_matrix_6
from cactus_tpu.ops.poa import PoaGraph, poa_align_affine, poa_msa

SUB = score_matrix_6(PoaParams().sub_matrix)


def _score_ops(graph, seq, ops, o1, e1, o2, e2, submat):
    """Recompute the alignment score from traceback ops (convex gaps:
    each maximal gap run costs min over the two models)."""
    score = 0
    runs = []       # [kind, len] with adjacent same-kind gaps merged
    for op in ops:
        kind = op[0]
        if kind == "M":
            v, q = op[1], op[2]
            score += int(submat[graph.bases[v], seq[q]])
        if runs and runs[-1][0] == kind and kind != "M":
            runs[-1][1] += 1
        else:
            runs.append([kind, 1])
    for kind, ln in runs:
        if kind in ("I", "D"):
            score -= min(o1 + ln * e1, o2 + ln * e2)
    return score


def test_linear_chain_matches_pairwise_affine():
    """On a chain graph the affine POA kernel must reproduce the plain
    pairwise affine aligner (single gap model: o2 made prohibitive)."""
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, 200).astype(np.uint8)
    q = t.copy()
    q = np.delete(q, slice(50, 60))          # 10bp deletion in query
    q[120] = (q[120] + 1) % 4                # substitution
    graph = PoaGraph.from_sequence(t)
    big = 10 ** 6
    ops = poa_align_affine(graph, q, o1=400, e1=30, o2=big, e2=big,
                           submat=SUB)
    score = _score_ops(graph, q, ops, 400, 30, big, big, SUB)
    ref_score, _ref_ops = align_affine_np(q, t, SUB, GapParams(400, 30))
    assert score == ref_score


def test_convex_long_gap_uses_second_model():
    """A 120 bp deletion: convex cost min(o1+120*e1, o2+120*e2) must use
    the long-gap model (o2=1200,e2=1 -> 1320, vs 400+3600=4000)."""
    rng = np.random.default_rng(1)
    t = rng.integers(0, 4, 400).astype(np.uint8)
    q = np.concatenate([t[:140], t[260:]])
    graph = PoaGraph.from_sequence(t)
    p = PoaParams()
    ops = poa_align_affine(graph, q, o1=p.gap_open1, e1=p.gap_extend1,
                           o2=p.gap_open2, e2=p.gap_extend2, submat=SUB)
    score = _score_ops(graph, q, ops, p.gap_open1, p.gap_extend1,
                       p.gap_open2, p.gap_extend2, SUB)
    n_match = sum(1 for o in ops if o[0] == "M")
    n_del = sum(1 for o in ops if o[0] == "D")
    assert n_match == len(q)
    assert n_del == 120
    expected = len(q) * 91 + 9 * (100 - 91) * 0  # all matches score >= 91
    # exact: matches score submat[b][b] (91 or 100); gap 1200+120*1
    exact = sum(int(SUB[b, b]) for b in q) - (p.gap_open2
                                              + 120 * p.gap_extend2)
    assert score == exact, (score, exact, expected)


def test_banded_equals_fullwidth():
    rng = np.random.default_rng(2)
    t = rng.integers(0, 4, 3000).astype(np.uint8)
    q = t.copy()
    q[1500] = (q[1500] + 2) % 4
    q = np.delete(q, slice(700, 715))
    graph = PoaGraph.from_sequence(t)
    p = PoaParams()
    full = poa_align_affine(graph, q, submat=SUB,
                            band_constant=10 ** 6, band_fraction=0.0)
    banded = poa_align_affine(graph, q, submat=SUB,
                              band_constant=100, band_fraction=0.05)
    s_full = _score_ops(graph, q, full, 400, 30, 1200, 1, SUB)
    s_band = _score_ops(graph, q, banded, 400, 30, 1200, 1, SUB)
    assert s_band == s_full


def test_msa_affine_walks_spell_inputs():
    """poa_msa with PoaParams: every walk must still visit one node per
    input base (walk-spelling invariant)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, 500).astype(np.uint8)
    seqs = []
    for s in range(4):
        x = base.copy()
        idx = rng.integers(0, len(x), 10)
        x[idx] = (x[idx] + 1) % 4
        if s == 2:
            x = np.delete(x, slice(100, 130))
        seqs.append(x)
    g = poa_msa(seqs, params=PoaParams())
    for x, walk in zip(seqs, g.walks):
        assert len(walk) == len(x)
        visited = walk[walk >= 0]
        got = np.asarray([g.bases[v] for v in visited], dtype=np.uint8)
        assert (got == x[walk >= 0]).all()
    # column groups recover most pairwise identity
    m = g.match_runs_between_walks()
    assert len(m) > 4 * 400


def test_msa_affine_quality_vs_linear():
    """Convex gaps must not lose matches vs the linear kernel on an
    indel-rich input."""
    rng = np.random.default_rng(4)
    base = rng.integers(0, 4, 400).astype(np.uint8)
    a = base.copy()
    b = np.delete(base, slice(200, 280))      # 80bp deletion
    g_aff = poa_msa([a, b], params=PoaParams())
    g_lin = poa_msa([a, b])
    n_aff = len(g_aff.match_runs_between_walks())
    n_lin = len(g_lin.match_runs_between_walks())
    assert n_aff >= n_lin
    assert n_aff >= 315     # 320 matchable positions, allow slack
