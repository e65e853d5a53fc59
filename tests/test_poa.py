"""Partial-order alignment: graph DP, updates, MSA column recovery."""

import numpy as np
import pytest

from cactus_tpu.ops import poa


def _codes(s: str) -> np.ndarray:
    m = {"A": 0, "C": 1, "G": 2, "T": 3}
    return np.array([m[c] for c in s], dtype=np.uint8)


def test_identical_sequence_reuses_nodes():
    s = _codes("ACGTACGT")
    g = poa.PoaGraph.from_sequence(s)
    ops = poa.poa_align(g, s.copy())
    assert all(op[0] == "M" for op in ops)
    g.add_alignment(s.copy(), ops)
    assert g.n_nodes == len(s)          # no new nodes
    assert np.array_equal(g.walks[0], g.walks[1])


def test_snp_creates_column_allele():
    s = _codes("ACGTACGT")
    t = _codes("ACGAACGT")              # SNP at position 3
    g = poa.PoaGraph.from_sequence(s)
    ops = poa.poa_align(g, t)
    g.add_alignment(t, ops)
    assert g.n_nodes == len(s) + 1      # one allele node added
    # the allele node shares its column group with the original
    v_orig = int(g.walks[0][3])
    v_alt = int(g.walks[1][3])
    assert v_orig != v_alt
    assert g.group_of[v_orig] == g.group_of[v_alt]
    # every other position fused
    same = [p for p in range(8) if p != 3]
    assert all(g.walks[0][p] == g.walks[1][p] for p in same)


def test_insertion_and_deletion():
    s = _codes("ACGTACGT")
    ins = _codes("ACGTTTACGT")          # 2bp insertion after pos 3
    g = poa.PoaGraph.from_sequence(s)
    ops = poa.poa_align(g, ins)
    g.add_alignment(ins, ops)
    assert g.n_nodes == len(s) + 2
    dele = _codes("ACGCGT")             # 2bp deletion
    ops2 = poa.poa_align(g, dele)
    kinds = [op[0] for op in ops2]
    assert "D" in kinds
    g.add_alignment(dele, ops2)
    # all three walks spell their sequences through the graph
    for walk, seq in zip(g.walks, (s, ins, dele)):
        spelled = [g.bases[v] for v in walk if v >= 0]
        assert spelled == list(seq)


def test_msa_recovers_true_columns():
    """5 mutated copies: column groups recover >=95% of true pairs."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, 300).astype(np.uint8)
    seqs = []
    for _ in range(5):
        s = base.copy()
        idx = rng.random(len(s)) < 0.05
        s[idx] = (s[idx] + 1) % 4
        seqs.append(s)
    g = poa.poa_msa(seqs)
    pairs = g.match_runs_between_walks()
    pred = {(wi, pi, wj, pj) for wi, pi, wj, pj in pairs}
    truth = {(i, p, j, p) for i in range(5) for j in range(i + 1, 5)
             for p in range(300)}
    # canonicalize orientation of predicted tuples
    pred_c = set()
    for wi, pi, wj, pj in pred:
        pred_c.add((wi, pi, wj, pj) if wi < wj else (wj, pj, wi, pi))
    inter = len(truth & pred_c)
    recall = inter / len(truth)
    precision = inter / len(pred_c)
    assert recall > 0.95, recall
    assert precision > 0.95, precision


def test_msa_with_indels():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 4, 200).astype(np.uint8)
    s1 = base.copy()
    s2 = np.concatenate([base[:100], rng.integers(0, 4, 8).astype(np.uint8),
                         base[100:]])
    s3 = np.concatenate([base[:50], base[60:]])
    g = poa.poa_msa([s1, s2, s3])
    for walk, seq in zip(g.walks, (s1, s2, s3)):
        spelled = [g.bases[v] for v in walk if v >= 0]
        assert spelled == list(seq)
    # s1 vs s3 homology across the deletion
    pairs = {(pi, pj) for wi, pi, wj, pj in g.match_runs_between_walks()
             if {wi, wj} == {0, 2}}
    good = sum(1 for pi, pj in pairs
               if (pi < 50 and pj == pi) or (pi >= 60 and pj == pi - 10)
               or (pj < 50 and pi == pj) or (pj >= 60 and pi == pj - 10))
    assert good / max(len(pairs), 1) > 0.9


def test_poa_msa_batch_matches_sequential():
    """Batched progressive POA == per-group poa_msa (same DP inputs per
    round, same tracebacks), across mixed shapes."""
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.poa import poa_msa, poa_msa_batch
    rng = np.random.default_rng(11)
    params = PoaParams()
    groups = []
    for g in range(5):
        n = int(rng.integers(2, 5))
        base = rng.integers(0, 4, int(rng.integers(40, 300))).astype(
            np.uint8)
        seqs = []
        for _ in range(n):
            s = base.copy()
            idx = rng.random(len(s)) < 0.05
            s[idx] = (s[idx] + 1) % 4
            if rng.random() < 0.5 and len(s) > 30:
                cut = int(rng.integers(5, 20))
                s = np.concatenate([s[:10], s[10 + cut:]])
            seqs.append(s)
        groups.append(seqs)
    seq_graphs = [poa_msa(g, params=params) for g in groups]
    bat_graphs = poa_msa_batch(groups, params)
    for gs, gb in zip(seq_graphs, bat_graphs):
        assert sorted(gs.match_runs_between_walks()) == \
            sorted(gb.match_runs_between_walks())
