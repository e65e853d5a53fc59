"""MUM anchoring / matrix splitting (ops/anchors.py)."""

import numpy as np

from cactus_tpu.ops.anchors import (chain_lis, split_pair_by_mums,
                                    unique_matches)


def test_unique_matches_identity():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, 500).astype(np.uint8)
    m = unique_matches(q, q.copy(), k=20)
    # on random sequence nearly every 20-mer is unique; matches sit on
    # the main diagonal
    assert len(m) > 400
    assert (m[:, 0] == m[:, 1]).all()


def test_unique_matches_excludes_repeats():
    rng = np.random.default_rng(1)
    unit = rng.integers(0, 4, 50).astype(np.uint8)
    q = np.concatenate([unit, unit])      # every unit k-mer occurs twice
    t = unit.copy()
    m = unique_matches(q, t, k=20)
    assert len(m) == 0


def test_chain_lis_filters_offdiagonal_noise():
    diag = np.stack([np.arange(0, 200, 10), np.arange(0, 200, 10)], 1)
    noise = np.array([[5, 190], [150, 3]])
    mixed = np.concatenate([diag, noise])
    mixed = mixed[np.argsort(mixed[:, 0], kind="stable")]
    chained = chain_lis(mixed)
    assert len(chained) == len(diag)
    assert (chained[:, 0] == chained[:, 1]).all()


def test_split_pair_by_mums_bounds_span():
    rng = np.random.default_rng(2)
    q = rng.integers(0, 4, 9000).astype(np.uint8)
    t = q.copy()
    pieces = split_pair_by_mums(q, t, max_span=3000)
    assert len(pieces) >= 3
    # pieces tile both sequences exactly
    assert pieces[0][0] == 0 and pieces[0][1] == 0
    qtot = sum(len(p[2]) for p in pieces)
    ttot = sum(len(p[3]) for p in pieces)
    assert qtot == len(q) and ttot == len(t)
    for q0, t0, qs, ts in pieces:
        assert max(len(qs), len(ts)) <= 3000 + 100


def test_split_pair_short_is_identity():
    q = np.zeros(100, dtype=np.uint8)
    pieces = split_pair_by_mums(q, q, max_span=3000)
    assert len(pieces) == 1 and pieces[0][:2] == (0, 0)


def test_split_respects_indel_offset():
    """An insertion shifts the diagonal; cut points must follow the
    anchor chain (different q/t cuts), keeping each true pair inside
    one piece."""
    rng = np.random.default_rng(3)
    left = rng.integers(0, 4, 4000).astype(np.uint8)
    right = rng.integers(0, 4, 4000).astype(np.uint8)
    ins = rng.integers(0, 4, 500).astype(np.uint8)
    q = np.concatenate([left, right])
    t = np.concatenate([left, ins, right])
    pieces = split_pair_by_mums(q, t, max_span=3000)
    assert len(pieces) >= 2
    # reconstruct: every cut (q0, t0) must satisfy t0 - q0 in {0, 500}
    for q0, t0, _qs, _ts in pieces:
        assert (t0 - q0) in (0, 500), (q0, t0)


def test_split_pair_by_mums_recursive():
    """recursiveMums: a piece with no long-k anchors re-splits with a
    halved seed length (bar.c:33, config XML :285)."""
    rng = np.random.default_rng(4)
    # two related sequences with mutations dense enough that k=20 exact
    # matches are rare but k=10 matches exist
    q = rng.integers(0, 4, 4000).astype(np.uint8)
    t = q.copy()
    mut = rng.random(4000) < 0.06
    t[mut] = (t[mut] + 1 + rng.integers(0, 3, int(mut.sum()))) % 4
    flat = split_pair_by_mums(q, t, max_span=1000, k=20, recursive=False)
    rec = split_pair_by_mums(q, t, max_span=1000, k=20, recursive=True)
    big_flat = sum(1 for _q0, _t0, qs, ts in flat
                   if max(len(qs), len(ts)) > 1000)
    big_rec = sum(1 for _q0, _t0, qs, ts in rec
                  if max(len(qs), len(ts)) > 1000)
    assert big_rec <= big_flat
    assert len(rec) >= len(flat)
    # pieces still tile the pair monotonically
    q0s = [p[0] for p in rec]
    assert q0s == sorted(q0s)
